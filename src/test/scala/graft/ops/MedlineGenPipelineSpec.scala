package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Scale-shaped e2e: generate a synthetic MEDLINE corpus (multiple gz
  * files, updates + tombstones), run the full
  * source→parse→union→dedup graph, check exact survivor count. */
class MedlineGenPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("synthetic corpus: dedup survivors match generator's bookkeeping") {
    val dir = java.nio.file.Files.createTempDirectory("medline_synth").toString
    val expected = MedlineGen.generate(dir, nFiles = 10, perFile = 100)
    val frags = MedlineSource.fragments(spark, s"$dir/*.xml.gz")
    val parsed = MedlineParser.parse(spark, frags)
    val survivors = Dedup.latestNonDeleted(spark, parsed)
    assert(survivors.count() == expected)
    // revised PMIDs carry the v2 title from the update file
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val v2 = survivors.toDF().filter(col("title").contains("(v2)")).count()
    assert(v2 > 0)
    // deterministic: regenerating yields identical files
    val dir2 = java.nio.file.Files.createTempDirectory("medline_synth2").toString
    MedlineGen.generate(dir2, nFiles = 10, perFile = 100)
    val b1 = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dir/pubmed20n0000.xml.gz"))
    val b2 = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$dir2/pubmed20n0000.xml.gz"))
    assert(java.util.Arrays.equals(b1, b2))
  }
}
