package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class ExpressionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("native bio_token_count matches the tokenizer, handles null") {
    import spark.implicits._
    val df = Seq(
      Some("Asthma is a chronic disease."),
      Some("th:is.{e}nt/ity-is,ver-y/co_m[p]lex(to)par;se x"),
      Some(""),
      None,
    ).toDF("text")
    val got = df.select(Expressions.bio_token_count(col("text"))).collect()
      .map(r => if (r.isNullAt(0)) -1 else r.getInt(0))
    assert(got.toSeq == Seq(5, 2, 0, -1))
    // interpreted (eval) path must agree with codegen: force both
    val viaUdf = graft.text.BioTokenizer.tokenCount("Asthma is a chronic disease.")
    assert(viaUdf == 5)
  }

  test("native simhash64 equals Hashing.simhash") {
    import spark.implicits._
    val texts = Seq("the quick brown fox", "another document entirely")
    val df = texts.toDF("text")
    val got = df.select(Expressions.simhash64(col("text"))).as[Long].collect()
    assert(got.toSeq == texts.map(graft.datapipe.Hashing.simhash))
  }

  test("native simhash64_md5 equals Hashing.simhashMd5") {
    import spark.implicits._
    val texts = Seq("the quick brown fox", "another document entirely", "")
    val df = texts.toDF("text")
    val got = df.select(Expressions.simhash64_md5(col("text"))).as[Long].collect()
    assert(got.toSeq == texts.map(graft.datapipe.Hashing.simhashMd5))
  }

  test("native cosine_sim equals Similarity.cosine bit-for-bit") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])].collect()
    val pairs = emb.take(20).flatMap(a => emb.take(20).map(b => (a, b))).toSeq
    val df = pairs.map { case ((ia, va), (ib, vb)) => (ia, ib, va, vb) }
      .toDF("ia", "ib", "va", "vb")
    val got = df.select(Expressions.cosine_sim(col("va"), col("vb"))).as[Double].collect()
    val want = pairs.map { case ((_, va), (_, vb)) =>
      graft.datapipe.Similarity.cosine(va.toArray, vb.toArray)
    }
    assert(got.toSeq == want)
    // null propagation
    val n = Seq((Seq(1.0f), null.asInstanceOf[Seq[Float]])).toDF("a", "b")
    assert(n.select(Expressions.cosine_sim(col("a"), col("b"))).head().isNullAt(0))
  }

  test("native minhash_bands equals bandKeys(minhash(shingleSet)) bit-for-bit") {
    import spark.implicits._
    import graft.datapipe.Hashing
    val texts = Seq("the quick brown fox jumps over the lazy dog",
      "a b", "", "one two three four five")
    val df = texts.toDF("text")
    val got = df.select(Expressions.minhash_bands(col("text"), 128, 3, 32))
      .as[Seq[Long]].collect()
    val want = texts.map(t =>
      Hashing.bandKeys(Hashing.minhash(Hashing.shingleSet(t, 3), 128), 32).toSeq)
    assert(got.toSeq == want)
    // null propagation
    val n = Seq(null.asInstanceOf[String]).toDF("text")
    assert(n.select(Expressions.minhash_bands(col("text"), 128, 3, 32))
      .head().isNullAt(0))
  }

  test("SQL function registration (the GraftExtensions builders)") {
    // getOrCreate would reuse the shared test session and skip
    // extensions, so drive the same builders through the registry
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("simhash64",
      exprs => SimHashExpr(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("simhash64_md5",
      exprs => SimHashMd5Expr(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("bio_token_count",
      exprs => BioTokenCountExpr(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("zorder2",
      exprs => ZOrder2Expr(exprs.head, exprs(1)), "scala_udf")
    val row = spark.sql(
      "SELECT simhash64('a b c') AS h, simhash64_md5('a b c') AS hm, bio_token_count('a b c d') AS n, zorder2(3, 5) AS z").head()
    assert(row.getLong(0) == graft.datapipe.Hashing.simhash("a b c"))
    assert(row.getLong(1) == graft.datapipe.Hashing.simhashMd5("a b c"))
    assert(row.getInt(2) == 4)
    assert(row.getLong(3) == ZOrder2Expr.interleave(3, 5))
    // band-key functions take literal shape params (same extraction the
    // GraftExtensions builders perform)
    def lit(e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
      e.eval().asInstanceOf[Number].intValue()
    reg.createOrReplaceTempFunction("minhash_bands",
      exprs => MinHashBandsExpr(exprs.head, lit(exprs(1)), lit(exprs(2)),
        lit(exprs(3))), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_bands_md5",
      exprs => MinHashBandsMd5Expr(exprs.head, lit(exprs(1)), lit(exprs(2)),
        lit(exprs(3))), "scala_udf")
    val bands = spark.sql(
      "SELECT minhash_bands('a b c d e', 128, 3, 32) AS b, minhash_bands_md5('a b c d e', 128, 3, 32) AS bm").head()
    assert(bands.getSeq[Long](0) ==
      graft.datapipe.Hashing.bandKeys(graft.datapipe.Hashing.minhash(
        graft.datapipe.Hashing.shingleSet("a b c d e", 3), 128), 32).toSeq)
    assert(bands.getSeq[String](1) ==
      graft.datapipe.Hashing.minhashBandsMd5("a b c d e", 128, 3, 32).toSeq)
  }

  test("codegen plan contains the native expression, not a ScalaUDF") {
    // over a parquet scan (a local literal would be constant-folded
    // away — which itself shows the expression is Catalyst-foldable)
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(Expressions.bio_token_count(col("text")).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("bio_token_count"), plan)
    assert(!plan.contains("UDF"), plan)
    assert(plan.contains("*(1) Project"), plan) // * prefix = whole-stage codegen
    assert(df.agg(sum(col("n"))).head().getLong(0) > 0)
  }
}
