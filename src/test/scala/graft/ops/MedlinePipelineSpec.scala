package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.model.Publication

/** End-to-end pipeline skeleton over the reference's own fixtures
  * (FIXTURES.md §1): test_baseline.xml.gz (4 citations) ∪
  * test_update.xml.gz (1 citation + DeleteCitation listing 2 PMIDs) →
  * parse → union → latest-per-PMID dedup → tombstone filter.
  */
class MedlinePipelineSpec extends AnyFunSuite {

  val fixtureDir = "/root/reference/tests/resources/test-medlinexml"
  lazy val spark = SparkTestSession.spark

  test("fragment assembly yields complete citation elements") {
    val frags = MedlineSource.fragments(spark, s"$fixtureDir/test_baseline.xml.gz").collect()
    assert(frags.length == 4)
    assert(frags.forall(_._2 == "test_baseline.xml.gz"))
    assert(frags.forall { case (f, _) =>
      f.startsWith("<MedlineCitation") && f.endsWith("</MedlineCitation>")
    })
  }

  test("update file yields citation + delete fragments") {
    val frags = MedlineSource.fragments(spark, s"$fixtureDir/test_update.xml.gz").collect()
    assert(frags.length == 2)
    assert(frags.count(_._1.startsWith("<DeleteCitation>")) == 1)
  }

  test("parse extracts publication fields") {
    val pubs = MedlineParser.parse(spark,
      MedlineSource.fragments(spark, s"$fixtureDir/test_baseline.xml.gz")).collect()
    assert(pubs.length == 4)
    assert(pubs.map(_.pub_id).toSet ==
      Set("16691646", "17796445", "17832547", "25053090"))
    val p = pubs.find(_.pub_id == "16691646").get
    assert(p.title.isDefined)
    assert(p.journal.isDefined)
    assert(!p.is_deleted)
    assert(p.filename == "test_baseline.xml.gz")
    // every parsed record carries either a title or a tombstone
    pubs.foreach { pub => assert(pub.title.nonEmpty) }
  }

  test("delete citation yields one tombstone per PMID") {
    val pubs = MedlineParser.parse(spark,
      MedlineSource.fragments(spark, s"$fixtureDir/test_update.xml.gz")).collect()
    assert(pubs.length == 3) // 1 citation + 2 tombstones
    val tombstones = pubs.filter(_.is_deleted)
    assert(tombstones.map(_.pub_id).toSet == Set("26470892", "26477054"))
  }

  test("end-to-end: union + dedup + tombstones") {
    import spark.implicits._
    val baseline = MedlineParser.parse(spark,
      MedlineSource.fragments(spark, s"$fixtureDir/test_baseline.xml.gz"))
    val updates = MedlineParser.parse(spark,
      MedlineSource.fragments(spark, s"$fixtureDir/test_update.xml.gz"))
    val all = baseline.unionByName(updates)
    assert(all.count() == 7) // 4 + 1 + 2 tombstones

    val latest = Dedup.latestNonDeleted(spark, all).collect()
    assert(latest.length == 5)
    assert(latest.map(_.pub_id).toSet ==
      Set("16691646", "17796445", "17832547", "25053090", "26176916"))
  }

  test("update version wins over baseline version of same pub_id") {
    import spark.implicits._
    val v1 = Publication(pub_id = "1", title = Some("old"), filename = "pubmed19n0001.xml.gz")
    val v2 = Publication(pub_id = "1", title = Some("new"), filename = "pubmed19n1201.xml.gz")
    val other = Publication(pub_id = "2", title = Some("x"), filename = "pubmed19n0001.xml.gz")
    val deleted = Publication(pub_id = "3", title = Some("gone"), filename = "pubmed19n0001.xml.gz")
    val tomb = Publication(pub_id = "3", filename = "pubmed19n1300.xml.gz", is_deleted = true)
    val ds = spark.createDataset(Seq(v1, v2, other, deleted, tomb))
    val out = Dedup.latestNonDeleted(spark, ds).collect()
    assert(out.length == 2)
    assert(out.find(_.pub_id == "1").get.title.contains("new"))
    // tombstone from newer file removes pub 3
    assert(!out.exists(_.pub_id == "3"))
  }

  test("tombstone from OLDER file does not delete a newer version") {
    import spark.implicits._
    val tomb = Publication(pub_id = "9", filename = "pubmed19n0001.xml.gz", is_deleted = true)
    val newer = Publication(pub_id = "9", title = Some("resurrected"), filename = "pubmed19n0900.xml.gz")
    val out = Dedup.latestNonDeleted(spark, spark.createDataset(Seq(tomb, newer))).collect()
    assert(out.length == 1)
    assert(out.head.title.contains("resurrected"))
  }
}
