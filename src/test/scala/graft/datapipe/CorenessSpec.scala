package graft.datapipe

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** [[Graph.coreness]] (q156): the synchronous H-index iteration's
  * fixpoint must equal the EXACT core number from the sequential
  * Batagelj–Zaveršnik peel — the independent mirror below — and the
  * `stable` certificate must report convergence truthfully. */
class CorenessSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  def run(rounds: Int, pairs: (Long, Long)*): (Map[Long, (Long, Long)], Boolean) = {
    import spark.implicits._
    val rows = Graph.coreness(pairs.toDF("u", "v"), rounds).collect()
    (rows.map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap,
      rows.forall(_.getBoolean(3)))
  }

  /** Independent plain-Scala mirror: the exact sequential peel —
    * remove a minimum-degree node at a time; its core number is the
    * running max of the degree at removal. */
  def peel(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val es = pairs.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(p => p._1 != p._2).distinct
    val adj = scala.collection.mutable.Map[Long, scala.collection.mutable.Set[Long]]()
    es.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, scala.collection.mutable.Set()) += b
      adj.getOrElseUpdate(b, scala.collection.mutable.Set()) += a
    }
    val core = scala.collection.mutable.Map[Long, Long]()
    var k = 0L
    while (adj.nonEmpty) {
      val v = adj.keys.minBy(n => (adj(n).size, n))
      k = math.max(k, adj(v).size.toLong)
      core(v) = k
      adj(v).foreach(nb => adj(nb) -= v)
      adj -= v
    }
    core.toMap
  }

  test("K4: coreness 3 everywhere, converged") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val (got, stable) = run(8, k4: _*)
    assert(stable)
    got.foreach { case (_, (d, c)) => assert(d == 3L && c == 3L) }
  }

  test("star: hub degree 7 but coreness 1 (the hub-noise robustness)") {
    val star = (2L to 8L).map(i => (1L, i))
    val (got, stable) = run(8, star: _*)
    assert(stable)
    assert(got(1L) == ((7L, 1L)))
    assert(got(5L) == ((1L, 1L)))
  }

  test("K4 with a pendant chain: nested cores resolve (3 vs 1)") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val g = k4 ++ Seq(4L -> 5L, 5L -> 6L, 6L -> 7L)
    val (got, stable) = run(8, g: _*)
    assert(stable)
    assert((1L to 4L).forall(n => got(n)._2 == 3L))
    assert((5L to 7L).forall(n => got(n)._2 == 1L))
    val exact = peel(g)
    got.foreach { case (n, (_, c)) => assert(c == exact(n)) }
  }

  test("fixpoint equals the exact peel on seeded random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 12 + trial * 4
      val pairs = (for {
        a <- 1L to n.toLong; b <- (a + 1) to n.toLong
        if rnd.nextDouble() < 0.22
      } yield (a, b)).toSeq
      if (pairs.nonEmpty) {
        val (got, stable) = run(24, pairs: _*)
        assert(stable, s"trial $trial did not converge in 24 rounds")
        val exact = peel(pairs)
        got.foreach { case (node, (_, c)) =>
          assert(c == exact(node), s"trial $trial node $node: $c vs ${exact(node)}")
        }
      }
    }
  }

  test("unconverged run reports stable = false (long path, 2 rounds)") {
    val path = (1L until 20L).map(i => (i, i + 1))
    val (_, stable) = run(2, path: _*)
    assert(!stable)
  }
}
