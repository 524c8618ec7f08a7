package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dump the engine side of the MinHash-LSH mirror check (see
  * tools/lsh_mirror_check.py): for a documents parquet, write
  *  - engine_bands/: (doc_id, b, bk) — the native MinHashBandsExpr
  *    band keys, the exact values the DuckDB mirror must reproduce;
  *  - engine_pairs/: minhashNearDupPairs(J ≥ 0.5) output;
  *  - mirror.sql: the generated DuckDB twin with a DOCS_PARQUET
  *    placeholder for the input path.
  * Bit-equality of engine_bands vs the mirror is the strongest check:
  * it pins every stage of the hash chain, not just the surviving
  * pairs. */
object LshMirrorDump {
  def main(args: Array[String]): Unit = {
    val Array(docsParquet, outDir) = args
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(docsParquet)
    docs
      .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
      .select(col("doc_id"), posexplode(
        graft.functions.Expressions.minhash_bands(col("text"), 128, 3, 32))
        .as(Seq("b", "bk")))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/engine_bands")
    graft.datapipe.DedupOps.minhashNearDupPairs(docs, minJaccard = 0.5)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/engine_pairs")
    val sql = "WITH " +
      graft.queries.MinhashMirrorSql.tokCte("read_parquet('DOCS_PARQUET')") +
      ",\n" +
      graft.queries.MinhashMirrorSql.candidateCtes("mh_tok") +
      "\nSELECT doc_id, b, bk FROM mh_bk ORDER BY doc_id, b"
    Files.writeString(Paths.get(s"$outDir/mirror.sql"), sql)
    spark.stop()
  }
}
