package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Each table is a single parquet file under `sfDir`. At 100 TB these
  * would be partitioned directories; `spark.read.parquet` handles both
  * shapes identically, so nothing here changes at scale.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  /** `events.parquet` has shipped `ts` in two physical forms across
    * testdata generations: INT64 TIMESTAMP(NANOS) (which Spark's
    * vectorized reader rejects — read nanos as long via
    * `nanosAsLong`, floor-divide to micros with integer DIV; a double
    * roundtrip would lose precision at 1e18) and plain
    * TIMESTAMP(MICROS). Branch on the type the reader actually
    * surfaces so both normalize to the same TIMESTAMP_NTZ column
    * (isAdjustedToUTC=false semantics either way).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    val tsExpr = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        "CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP_NTZ)"
      case org.apache.spark.sql.types.TimestampNTZType => "ts"
      // A third physical form (e.g. TIMESTAMP_LTZ when
      // isAdjustedToUTC=true, or inferTimestampNTZ disabled) must fail
      // LOUDLY here: casting LTZ to NTZ is session-timezone-dependent
      // and would diverge from the DuckDB oracle silently.
      case other => throw new IllegalStateException(
        s"events.ts surfaced as unexpected type $other — " +
          "add an explicit (timezone-independent) normalization for it")
    }
    raw.withColumn("ts", org.apache.spark.sql.functions.expr(tsExpr))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
