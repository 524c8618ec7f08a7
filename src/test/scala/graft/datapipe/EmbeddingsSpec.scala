package graft.datapipe

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions._

class EmbeddingsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** deterministic pseudo-random vectors with real covariance
    * structure: dim 0 and 1 strongly correlated, rest small noise. */
  def vecs(n: Int, d: Int = 8) = {
    import spark.implicits._
    (1 to n).map { r =>
      val base = ((r * 2654435761L) % 1000).toFloat / 500f - 1f
      (r.toLong, Seq.tabulate(d) { i =>
        val noise = (((r * 48271L + i * 7919L) % 997).toFloat / 997f - 0.5f) * 0.1f
        if (i == 0) base + noise
        else if (i == 1) 0.8f * base + noise
        else noise
      })
    }.toDF("id", "vec")
  }

  test("fixed-point covariance equals brute force and ignores partitioning") {
    val df = vecs(300)
    val rows: Array[Seq[Float]] = df.collect().map(_.getSeq[Float](1))
    val (mean, cov) = Embeddings.meanCovariance(df, "vec", 8)
    val (mean13, cov13) = Embeddings.meanCovariance(df.repartition(13), "vec", 8)
    // partition invariance is EXACT (integer sums)
    assert(mean.sameElements(mean13))
    assert(cov.flatten[Double].sameElements(cov13.flatten[Double]))
    // vs driver brute force in double precision, within fixed-point quantization
    val n = rows.length.toDouble
    val bfMean = Array.tabulate(8)(i => rows.map(_(i).toDouble).sum / n)
    for (i <- 0 until 8) assert(math.abs(mean(i) - bfMean(i)) < 1e-5, s"mean $i")
    for (i <- 0 until 8; j <- 0 until 8) {
      val bf = rows.map(r => r(i).toDouble * r(j).toDouble).sum / n - bfMean(i) * bfMean(j)
      assert(math.abs(cov(i)(j) - bf) < 1e-5, s"cov $i $j")
    }
  }

  test("moments aggregator rejects inputs past the Long-overflow bound") {
    import spark.implicits._
    // |f| = 2^21·2^20 = 2^41 fixed-point ⇒ one pair product 2^82 would
    // silently wrap; the headroom guard must throw instead
    val big = Seq((1L, Seq.tabulate(4)(_ => (1 << 21).toFloat))).toDF("id", "vec")
    val e = intercept[Exception] {
      Embeddings.meanCovariance(big, "vec", 4)
    }
    def msgs(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("overflow bound")), msgs(e).mkString(" | "))
    // unit-scale vectors stay comfortably inside the bound
    val ok = vecs(50, 4)
    Embeddings.meanCovariance(ok, "vec", 4)
  }

  test("moment buffer (slot,val) rows match brute-force slot arithmetic") {
    // pins the q106 surface: buffer layout [n, s_i, upper-tri p_ij,
    // max|f|] and the Math.round quantization, computed independently
    import spark.implicits._
    val d = 4
    val df = vecs(40, d)
    val rows = df.collect().map(_.getSeq[Float](1))
    val got = df.select(col("vec")).as[Seq[Float]]
      .select(new Embeddings.MomentsAgg(d).toColumn.name("m"))
      .select(posexplode(col("m")).as(Seq("slot", "val")))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val f = rows.map(v => v.map(x => math.round(x.toDouble * Embeddings.Fp)).toArray)
    assert(got(0) == rows.length.toLong)
    for (i <- 0 until d) assert(got(1 + i) == f.map(_(i)).sum, s"s_$i")
    var o = 1 + d
    for (i <- 0 until d; j <- i until d) {
      assert(got(o) == f.map(r => r(i) * r(j)).sum, s"pair $i $j at slot $o")
      o += 1
    }
    assert(got(o) == f.map(_.map(math.abs).max).max, "max|f| slot")
    assert(got.size == o + 1)
  }

  test("jacobi basis is orthonormal with descending captured variance") {
    val df = vecs(400)
    val (_, cov) = Embeddings.meanCovariance(df, "vec", 8)
    val basis = Embeddings.topEigenvectors(cov, 4)
    for (i <- 0 until 4; j <- i until 4) {
      val dot = (0 until 8).map(t => basis(i)(t) * basis(j)(t)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9, s"dot $i $j")
    }
    // captured variance vᵀΣv descends with rank
    val vars = basis.map(v => (0 until 8).map(i =>
      (0 until 8).map(j => v(i) * cov(i)(j) * v(j)).sum).sum)
    assert(vars.sliding(2).forall(w => w(0) >= w(1) - 1e-12), vars.mkString(","))
    // the correlated (0,1) plane dominates: PC1 lives there
    assert(math.abs(basis(0)(0)) > 0.5 && math.abs(basis(0)(1)) > 0.3,
      basis(0).mkString(","))
  }

  test("projection is deterministic and reconstruction improves with k") {
    val df = vecs(200)
    def reconErr(k: Int): Double = {
      val (mean, cov) = Embeddings.meanCovariance(df, "vec", 8)
      val basis = Embeddings.topEigenvectors(cov, k)
      val proj = Embeddings.project(df, "vec", "p", mean, basis)
        .select("id", "vec", "p").collect()
      proj.map { r =>
        val v = r.getSeq[Float](1); val p = r.getSeq[Float](2)
        (0 until 8).map { i =>
          val rec = mean(i) + (0 until k).map(c => p(c) * basis(c)(i)).sum
          val e = v(i) - rec; e * e
        }.sum
      }.sum
    }
    val e2 = reconErr(2); val e4 = reconErr(4); val e8 = reconErr(8)
    assert(e2 >= e4 && e4 >= e8, s"$e2 $e4 $e8")
    assert(e8 < 1e-6 * 200, s"full-rank reconstruction should be ~exact: $e8")
    // end-to-end pcaProject: identical output on a different partitioning
    val a = Embeddings.pcaProject(df, "vec", 8, 3).select("id", "pca")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val b = Embeddings.pcaProject(df.repartition(7), "vec", 8, 3).select("id", "pca")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(a == b)
  }

  test("projection plan stays UDF-free") {
    val df = vecs(50)
    val p = Embeddings.pcaProject(df, "vec", 8, 2)
      .queryExecution.executedPlan.toString
    assert(!p.contains("ScalaUDF") && !p.contains("DeserializeToObject"),
      p.take(2000))
  }

  test("real embeddings table: 64-d basis fits and projects") {
    val emb = graft.util.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val out = Embeddings.pcaProject(emb, "embedding", 64, 8)
    val rows = out.select("pca").collect()
    assert(rows.forall(_.getSeq[Float](0).length == 8))
    assert(rows.length == emb.count())
  }

  test("native pca_project is bit-identical to the literal-chain form and stays in codegen") {
    val emb = graft.util.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val (mean, cov) = Embeddings.meanCovariance(emb, "embedding", 64)
    val basis = Embeddings.topEigenvectors(cov, 8)
    def collect(df: org.apache.spark.sql.DataFrame) = df.select("vec_id", "p")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val native = collect(Embeddings.project(emb, "embedding", "p", mean, basis))
    val chain = collect(
      Embeddings.projectExprBuilt(emb, "embedding", "p", mean, basis))
    assert(native.nonEmpty && native == chain)
    // the native form must sit inside a whole-stage-codegen'd Project —
    // the 512-term chain form is exactly what blew Janino and fell back
    val plan = Embeddings.project(emb, "embedding", "p", mean, basis)
      .queryExecution.executedPlan.toString
    assert(plan.contains("pca_project"), plan.take(2000))
    assert("\\*\\(\\d+\\) Project".r.findFirstIn(plan).isDefined, plan.take(2000))
    // dimension contract: a wrong-width vector fails loudly
    import spark.implicits._
    val bad = Seq((1L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val e = intercept[Exception] {
      Embeddings.project(bad, "embedding", "p", mean, basis).collect()
    }
    assert(e.getMessage != null)
  }
}
