package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** q113: quality-aware near-dup resolution — every component keeps
  * exactly one survivor, the argmax by (q_score desc, doc_id asc),
  * and the policy genuinely differs from keep-first on the real
  * corpus (otherwise the operator would be q13's min-id rule in
  * disguise). */
class KeepBestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.01"

  lazy val rows = DataPipeQueries.dedupKeepBest(spark, sfDir).collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("exactly one survivor per component, and it is the (score, -id) argmax") {
    val byComp = rows.groupBy(_._2)
    assert(byComp.nonEmpty)
    byComp.foreach { case (comp, members) =>
      val survivors = members.filter(_._4 == 1L)
      assert(survivors.size == 1, s"component $comp")
      val expected = members.minBy { case (id, _, score, _) => (-score, id) }
      assert(survivors.head._1 == expected._1, s"component $comp")
    }
  }

  test("keep-best differs from keep-first on the planted near-dups") {
    val multi = rows.groupBy(_._2).filter(_._2.length > 1)
    assert(multi.nonEmpty, "corpus should contain planted near-dup clusters")
    val differs = multi.count { case (_, members) =>
      members.filter(_._4 == 1L).head._1 != members.map(_._1).min
    }
    assert(differs > 0,
      "on this corpus some cluster's best-quality member must not be its min id")
  }
}
