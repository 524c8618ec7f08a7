package graft.datapipe

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("id", "text")
  }

  test("merge table matches the hand-computed greedy choice") {
    // words: low x2, lower x1, west x3 → pair weights:
    //   (w,e)=1+3=4  (l,o)=3  (o,w)=3  (e,r)=1  (e,s)=3  (s,t)=3
    // merge 1: (w,e) n=4. Then (l,o)=3 (o,?): "low"->l o w, lower->
    //   l o we r → (o,w)=2, (o,we)=1, (e,s) gone → (we,s)=3, (s,t)=3
    // merge 2 candidates at n=3: (l,o),(s,t),(we,s) → pair-asc picks (l,o)
    val df = docs((1L, "low low lower"), (2L, "west west west"))
    val merges = Bpe.train(Bpe.wordHistogram(df, "text"), 256, 2)
    assert(merges == Seq(("w", "e"), ("l", "o")))
  }

  test("merge table is identical across partitionings") {
    val base = docs((1L, "alpha beta beta gamma"), (2L, "beta gamma gamma delta"),
      (3L, "alpha alpha epsilon zeta"), (4L, "eta theta beta alpha"))
    val m1 = Bpe.train(Bpe.wordHistogram(base.repartition(1), "text"), 256, 12)
    val m8 = Bpe.train(Bpe.wordHistogram(base.repartition(8), "text"), 256, 12)
    assert(m1.nonEmpty && m1 == m8)
  }

  test("encode applies merges greedily left-to-right") {
    // "aaaa" with merge (a,a): greedy single pass → "aa aa"; then if
    // (aa,aa) is learned, → "aaaa"
    val df = docs((1L, "aaaa aaaa"))
    val hist = Bpe.wordHistogram(df, "text")
    val m1 = Bpe.train(hist, 256, 1)
    assert(m1 == Seq(("a", "a")))
    val e1 = Bpe.encodeDocs(df, "id", "text", m1).collect().head
    assert(e1.getString(3) == "aa aa aa aa" && e1.getLong(2) == 4L)
    val m2 = Bpe.train(hist, 256, 2)
    assert(m2 == Seq(("a", "a"), ("aa", "aa")))
    val e2 = Bpe.encodeDocs(df, "id", "text", m2).collect().head
    assert(e2.getString(3) == "aaaa aaaa" && e2.getLong(2) == 2L)
  }

  test("words outside the training top-K are still encoded") {
    // train on a 1-word top-K ("the" dominates); rare word "there"
    // still gets the learned merges applied. (t,h) and (h,e) tie at
    // n=4 — pair-asc tie-break picks (h,e) first.
    val df = docs((1L, "the the the the there"))
    val merges = Bpe.train(Bpe.wordHistogram(df, "text"), topK = 1,
      numMerges = 2)
    assert(merges == Seq(("h", "e"), ("t", "he")))
    val enc = Bpe.encodeDocs(df, "id", "text", merges).collect().head
    assert(enc.getString(3) == "the the the the the r e")
  }

  test("stops merging when no pair reaches weight 2") {
    // every word unique, every pair weight 1 → zero merges
    val df = docs((1L, "ab cd ef"))
    assert(Bpe.train(Bpe.wordHistogram(df, "text"), 256, 10).isEmpty)
  }

  test("per-row encode equals the dictionary-join encode on the real table") {
    val real = graft.util.Tables.documents(spark, "/root/testdata/sf0.001")
    val merges = Bpe.train(Bpe.wordHistogram(real, "text"), 256, 24)
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    val joined = canon(Bpe.encodeDocs(real, "doc_id", "text", merges))
    val perRow = canon(Bpe.encodePerRow(real, "doc_id", "text", merges))
    assert(perRow == joined)
  }

  test("per-row encode runs on a stream, matching the batch counts") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val d = docs((1L, "ab ab ab cd"), (2L, "ab cd cd"), (3L, ""))
    val merges = Bpe.train(Bpe.wordHistogram(d, "text"), 16, 4)
    val expected = Bpe.encodePerRow(d, "id", "text", merges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val out = Bpe.encodePerRow(input.toDS().toDF("id", "text"), "id", "text", merges)
    val query = out.writeStream.format("memory").queryName("stream_bpe")
      .outputMode("append").start()
    input.addData((1L, "ab ab ab cd"), (2L, "ab cd cd"))
    input.addData((3L, ""))
    query.processAllAvailable()
    val got = spark.table("stream_bpe").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got == expected)
    query.stop()
  }

  test("empty and sub-length docs survive encode with zero tokens") {
    val df = docs((1L, "x y"), (2L, "   "))
    val merges = Bpe.train(Bpe.wordHistogram(df, "text"), 256, 4)
    val got = Bpe.encodeDocs(df, "id", "text", merges)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((2L, 2L, "x y")))
    assert(got(2L) == ((0L, 0L, "")))
  }
}
