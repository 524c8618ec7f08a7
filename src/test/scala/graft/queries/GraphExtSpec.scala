package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions._

/** q174 HITS, q175 BFS distances, q176 link prediction: the DuckDB
  * oracle gate proves cross-engine replay; this spec pins the graph
  * semantics — a hand graph with a known authority structure, and
  * whole-output recomputation / metric-space properties on the
  * sf0.001 near-dup graph.
  */
class GraphExtSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"
  private val Fp = 1L << 20

  test("q174: hand graph — the shared supplier is the top authority") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("hits").toString
    // c1 buys s10+s11; c2, c3 buy s10 only.
    Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 10L), (1L, 11L), (2L, 10L), (3L, 10L))
      .toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = GraphSketchQueries.hitsQ(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out(("s:10", "auth")) == Fp, "max-normalized top authority is 2^20")
    assert(out(("s:11", "auth")) < out(("s:10", "auth")))
    assert(out(("c:1", "hub")) == Fp, "the two-supplier customer is top hub")
    assert(out(("c:2", "hub")) == out(("c:3", "hub")),
      "symmetric customers score identically")
    assert(out.values.forall(v => v > 0 && v <= Fp))
  }

  /** The sf0.001 near-dup edge set, symmetrized, as driver adjacency. */
  private lazy val adj: Map[Long, Set[Long]] = {
    val docs = graft.util.Tables.documents(spark, sfDir)
    val ned = graft.datapipe.DedupOps
      .minhashNearDupPairs(docs, minJaccard = 0.5, md5Based = true)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    (ned ++ ned.map(_.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).toSet }
  }

  test("q175: distances form a valid BFS metric on the real graph") {
    val dist = GraphSketchQueries.bfsDistQ(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist.nonEmpty)
    val seeds = adj.keySet.filter(_ % 7 == 0)
    assert(seeds.nonEmpty && seeds.forall(s => dist(s) == 0L))
    dist.foreach { case (n, dv) =>
      if (dv > 0)
        assert(adj(n).exists(m => dist.get(m).contains(dv - 1)),
          s"node $n at dist $dv has no neighbor at ${dv - 1}")
    }
    // edge Lipschitz property: adjacent reached nodes differ by <= 1
    adj.foreach { case (u, vs) =>
      dist.get(u).foreach { du =>
        vs.foreach(v => dist.get(v)
          .foreach(dv => assert(math.abs(du - dv) <= 1)))
      }
    }
    // unreached nodes are exactly those with no reached neighbor
    adj.keys.filterNot(dist.contains).foreach { n =>
      assert(!adj(n).exists(dist.contains),
        s"unreached $n adjacent to a reached node after 8 rounds")
    }
  }

  test("q176: top-5 co-purchase partners match full driver recomputation") {
    val e = graft.util.Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(graft.util.Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_suppkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("sp"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val custsOf = e.groupBy(_._2).map { case (s, xs) => s -> xs.map(_._1).toSet }
    val sups = custsOf.keys.toSeq.sorted
    val expected = sups.flatMap { sa =>
      val scored = sups.filter(_ != sa).flatMap { sb =>
        val cn = (custsOf(sa) & custsOf(sb)).size.toLong
        if (cn == 0) None
        else {
          val (da, db) = (custsOf(sa).size.toLong, custsOf(sb).size.toLong)
          Some((sb, cn, da, db, cn * Fp / (da + db - cn)))
        }
      }.sortBy { case (sb, cn, _, _, jac) => (-jac, -cn, sb) }.take(5)
      scored.zipWithIndex.map { case ((sb, cn, da, db, jac), i) =>
        (sa, i + 1L, sb, cn, da, db, jac)
      }
    }.toSet
    val got = GraphSketchQueries.coPurchaseTopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got.nonEmpty)
    assert(got == expected, "window top-5 == brute-force per-supplier top-5")
  }
}
