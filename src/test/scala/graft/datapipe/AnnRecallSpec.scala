package graft.datapipe

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Measured ANN RECALL floors on the bench embeddings (sf0.01, ALL
  * 500 vectors as queries, k = 10) — the quality gate CORRECTNESS
  * cannot see: q16 probes every cell, so its hash compare stays green
  * even if a quantizer regression guts recall at production probe
  * counts. Each approximate index runs at its DEFAULT (production-
  * shape) config and must recall at least the pinned floor of the
  * brute-force top-k. Floors are the measured values minus a ~0.03
  * margin (training and probing are fully deterministic — no RNG —
  * so run-to-run variance is zero; the margin absorbs only testdata
  * regeneration drift). A failing floor means the index QUALITY
  * regressed even though every output stayed deterministic. */
class AnnRecallSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.01"
  lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  private val K = 10

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .toSet

  lazy val exact: Set[(Long, Long)] =
    pairs(Similarity.knnBruteForce(emb, emb, k = K))

  private def recall(approx: Set[(Long, Long)]): Double =
    (exact & approx).size.toDouble / exact.size

  test("IVF recall floor at default config (nCells=16, nProbe=4)") {
    val r = recall(pairs(Similarity.knnIvf(emb, emb, k = K)))
    info(f"IVF recall@$K = $r%.4f") // measured 0.5580
    assert(r >= 0.52, f"IVF recall regressed: $r%.4f")
  }

  test("PQ recall floor at default config (m=8, ks=16, refine=4)") {
    val r = recall(pairs(Similarity.knnPq(emb, emb, k = K)))
    info(f"PQ recall@$K = $r%.4f") // measured 0.5930
    assert(r >= 0.56, f"PQ recall regressed: $r%.4f")
  }

  test("IVF-PQ recall floor at default config (nCells=16, nProbe=4, m=8, ks=16)") {
    val r = recall(pairs(Similarity.knnIvfPq(emb, emb, k = K)))
    info(f"IVF-PQ recall@$K = $r%.4f") // measured 0.4810
    assert(r >= 0.45, f"IVF-PQ recall regressed: $r%.4f")
  }

  test("LSH recall floor at a corpus-proportionate config (nBits=6, nProbe=16)") {
    // LSH bucket count must track corpus size (the default nBits=12 ⇒
    // 4096 buckets puts each of these 500 vectors alone in its bucket
    // — structurally ~0 recall at ANY quality; measured 0.0184). The
    // floor pins the 2^6-bucket config, ~8 vectors/bucket, the same
    // density a production nBits would target at scale.
    val r = recall(pairs(Similarity.knnLsh(emb, emb, k = K,
      nBits = 6, nProbe = 16)))
    info(f"LSH recall@$K = $r%.4f") // measured 0.4572
    assert(r >= 0.42, f"LSH recall regressed: $r%.4f")
  }
}
