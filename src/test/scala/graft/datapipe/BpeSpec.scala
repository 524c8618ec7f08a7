package graft.datapipe

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("id", "text")
  }

  /** Independent driver-local replay of full-histogram BPE training
    * (the classic Sennrich segment-table loop) — the distributed
    * trainer must agree with it merge for merge. */
  private def refTrain(hist: Seq[(String, Long)],
                       numMerges: Int): Seq[(String, String)] = {
    var segs = hist.map { case (w, c) => (w.map(_.toString).toVector, c) }
    val merges = Seq.newBuilder[(String, String)]
    var k = 0
    var exhausted = false
    while (k < numMerges && !exhausted) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      segs.foreach { case (sy, c) =>
        var i = 0
        while (i + 1 < sy.length) {
          val p = (sy(i), sy(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      val eligible = counts.iterator.filter(_._2 >= 2L).toVector
      if (eligible.isEmpty) exhausted = true
      else {
        val ((a, b), _) =
          eligible.minBy { case ((pa, pb), n) => (-n, pa, pb) }
        merges += ((a, b))
        segs = segs.map { case (sy, c) => (Bpe.applyMerge(sy, a, b), c) }
        k += 1
      }
    }
    merges.result()
  }

  test("merge table matches the hand-computed greedy choice") {
    // words: low x2, lower x1, west x3 → pair weights:
    //   (w,e)=1+3=4  (l,o)=3  (o,w)=3  (e,r)=1  (e,s)=3  (s,t)=3
    // merge 1: (w,e) n=4. Then (l,o)=3 (o,?): "low"->l o w, lower->
    //   l o we r → (o,w)=2, (o,we)=1, (e,s) gone → (we,s)=3, (s,t)=3
    // merge 2 candidates at n=3: (l,o),(s,t),(we,s) → pair-asc picks (l,o)
    val df = docs((1L, "low low lower"), (2L, "west west west"))
    val merges = Bpe.train(Bpe.wordHistogram(df, "text"), 2)
    assert(merges == Seq(("w", "e"), ("l", "o")))
  }

  test("merge table is partition-invariant at vocab ≥ 1k and matches the driver replay") {
    import spark.implicits._
    // 1,300 distinct words with overlapping character structure so
    // merges actually compete across the whole histogram tail
    val words = (0 until 1300).map(i => s"w${i % 13}q${i}z")
    val base = words.grouped(50).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq
      .toDF("id", "text")
    val hist = Bpe.wordHistogram(base, "text")
    assert(hist.count() == 1300)
    val m1 = Bpe.train(Bpe.wordHistogram(base.repartition(1), "text"), 12)
    val m8 = Bpe.train(Bpe.wordHistogram(base.repartition(8), "text"), 12)
    assert(m1.nonEmpty && m1 == m8)
    val ref = refTrain(hist.collect().map(r => (r.getString(0), r.getLong(1))).toSeq, 12)
    assert(m1 == ref)
  }

  test("a mergeable pair living only in the histogram tail is learned") {
    // 256 two-char filler words with pairwise-distinct symbol pairs
    // (each pair weight 1 → ineligible) that all sort BEFORE the two
    // tail words "zya"/"zyb", whose shared (z,y) pair reaches weight 2
    // only when the tail of the histogram counts. A top-256 trainer
    // (count desc, word asc) would see only fillers and learn nothing.
    val alpha = "abcdefghijklmnop" // 16 chars → 256 distinct pairs
    val fillers = for (a <- alpha; b <- alpha) yield s"$a$b"
    val df = docs((1L, fillers.mkString(" ")), (2L, "zya zyb"))
    val merges = Bpe.train(Bpe.wordHistogram(df, "text"), 4)
    assert(merges == Seq(("z", "y")))
  }

  test("encode applies merges greedily left-to-right") {
    // "aaaa" with merge (a,a): greedy single pass → "aa aa"; then if
    // (aa,aa) is learned, → "aaaa"
    val df = docs((1L, "aaaa aaaa"))
    val hist = Bpe.wordHistogram(df, "text")
    val m1 = Bpe.train(hist, 1)
    assert(m1 == Seq(("a", "a")))
    val e1 = Bpe.encodeDocs(df, "id", "text", m1).collect().head
    assert(e1.getString(3) == "aa aa aa aa" && e1.getLong(2) == 4L)
    val m2 = Bpe.train(hist, 2)
    assert(m2 == Seq(("a", "a"), ("aa", "aa")))
    val e2 = Bpe.encodeDocs(df, "id", "text", m2).collect().head
    assert(e2.getString(3) == "aaaa aaaa" && e2.getLong(2) == 2L)
  }

  test("rare words train AND encode with the learned merges") {
    // "the" ×4 dominates; rare "there" contributes its own weight-1
    // pairs plus (t,h)/(h,e). (t,h) and (h,e) tie at n=5 — pair-asc
    // tie-break picks (h,e) first, then (t,he) at n=5.
    val df = docs((1L, "the the the the there"))
    val merges = Bpe.train(Bpe.wordHistogram(df, "text"), numMerges = 2)
    assert(merges == Seq(("h", "e"), ("t", "he")))
    val enc = Bpe.encodeDocs(df, "id", "text", merges).collect().head
    assert(enc.getString(3) == "the the the the the r e")
  }

  test("stops merging when no pair reaches weight 2") {
    // every word unique, every pair weight 1 → zero merges
    val df = docs((1L, "ab cd ef"))
    assert(Bpe.train(Bpe.wordHistogram(df, "text"), 10).isEmpty)
  }

  test("per-row encode equals the dictionary-join encode on the real table") {
    val real = graft.util.Tables.documents(spark, "/root/testdata/sf0.001")
    val merges = Bpe.train(Bpe.wordHistogram(real, "text"), 24)
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
    val merges = Bpe.train(Bpe.wordHistogram(d, "text"), 4)
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

  test("admitBatch: riser tie through the pair-asc tie-break is rejected") {
    // merging (a,b) could create (ab,y) with count up to 9 — it TIES
    // (c,d)=9 and "ab" < "c" sorts first, so sequential would pick the
    // riser; the strict-dominance guard must stop after (a,b).
    val top = Seq(("a", "b", 10L), ("c", "d", 9L), ("b", "y", 9L))
    assert(Bpe.admitBatch(top, requested = 64, maxAdmit = 24) == Seq(("a", "b")))
  }

  test("admitBatch: lower-counted interacting pair still caps admission") {
    // (x,a) interacts at 7; merging (a,b) can create (x,ab) ≤ 7 which
    // would outrank (c,d)=5 — reject (c,d).
    val top = Seq(("a", "b", 10L), ("x", "a", 7L), ("c", "d", 5L))
    assert(Bpe.admitBatch(top, requested = 64, maxAdmit = 24) == Seq(("a", "b")))
    // but a disjoint pair that strictly dominates the interactor passes
    val top2 = Seq(("a", "b", 10L), ("c", "d", 9L), ("x", "a", 7L))
    assert(Bpe.admitBatch(top2, requested = 64, maxAdmit = 24) ==
      Seq(("a", "b"), ("c", "d")))
  }

  test("admitBatch: symbol sharing and concatenation collisions stop admission") {
    val shared = Seq(("a", "b", 10L), ("b", "c", 8L))
    assert(Bpe.admitBatch(shared, requested = 64, maxAdmit = 24) == Seq(("a", "b")))
    // "ab" is the first merge's OUTPUT symbol: a pair consuming it
    // gains occurrences from that merge — stale count, reject
    val concat = Seq(("a", "b", 10L), ("ab", "z", 8L))
    assert(Bpe.admitBatch(concat, requested = 64, maxAdmit = 24) == Seq(("a", "b")))
  }

  test("admitBatch: collection cutoff bounds risers hiding below the list") {
    // requested=2 and the list has 2 rows → pairs below the cutoff
    // (count ≤ 10) may exist unseen; (c,d)=10 does not strictly
    // dominate them → only the global max is safe.
    val top = Seq(("a", "b", 10L), ("c", "d", 10L))
    assert(Bpe.admitBatch(top, requested = 2, maxAdmit = 24) == Seq(("a", "b")))
    // the same list marked COMPLETE (requested > size) admits both
    assert(Bpe.admitBatch(top, requested = 64, maxAdmit = 24) ==
      Seq(("a", "b"), ("c", "d")))
    // maxAdmit truncates the admitted prefix
    assert(Bpe.admitBatch(top, requested = 64, maxAdmit = 1) == Seq(("a", "b")))
  }

  test("batched admission equals pure-sequential training at any batch width") {
    val real = graft.util.Tables.documents(spark, "/root/testdata/sf0.001")
    val hist = Bpe.wordHistogram(real, "text")
    val seq1 = Bpe.train(hist, 24, batchTopK = 1) // degenerate: 1 merge/round
    val b3 = Bpe.train(hist, 24, batchTopK = 3)
    val b64 = Bpe.train(hist, 24)
    assert(seq1.size == 24 && seq1 == b64 && b3 == b64)
  }

  test("incremental trainer equals the from-scratch rescan trainer on the real table") {
    // train (incremental: persisted segmented histogram, one replace
    // per round) and trainRescan (re-segment from scratch under the
    // full chain each round) materialize the same function composition
    // — the merge tables must agree merge for merge on a real corpus.
    val real = graft.util.Tables.documents(spark, "/root/testdata/sf0.001")
    val hist = Bpe.wordHistogram(real, "text")
    val inc = Bpe.train(hist, 24)
    val rescan = Bpe.trainRescan(hist, 24)
    assert(inc.size == 24 && inc == rescan)
  }

  test("wordSymCounts positions and totals agree with encodeDocs") {
    val d = docs((1L, "low low lower"), (2L, "west aaaa the"), (3L, "  "))
    val merges = Bpe.train(Bpe.wordHistogram(d, "text"), 4)
    assert(merges.nonEmpty)
    val enc = Bpe.encodeDocs(d, "id", "text", merges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val byDoc = Bpe.wordSymCounts(d, "id", "text", merges).collect()
      .groupBy(_.getLong(0))
    // whitespace-only doc has no word occurrences → no rows
    assert(!byDoc.contains(3L))
    // per-doc: positions are exactly 0..n_words-1 (the budget-chunking
    // contract: a contiguous positional stream), and the per-word
    // subword counts sum to encodeDocs' n_bpe_tokens
    byDoc.foreach { case (id, rows) =>
      assert(rows.map(_.getLong(1)).sorted.toSeq == (0L until enc(id)._1),
        s"doc $id positions")
      assert(rows.map(_.getLong(2)).sum == enc(id)._2, s"doc $id totals")
    }
  }

  test("empty and sub-length docs survive encode with zero tokens") {
    val df = docs((1L, "x y"), (2L, "   "))
    val merges = Bpe.train(Bpe.wordHistogram(df, "text"), 4)
    val got = Bpe.encodeDocs(df, "id", "text", merges)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((2L, 2L, "x y")))
    assert(got(2L) == ((0L, 0L, "")))
  }
}
