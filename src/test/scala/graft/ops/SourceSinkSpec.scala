package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink format coverage beyond parquet (SURVEY §2.1: the
  * reference reads gz text/XML and writes gz line-JSON; a Spark
  * replacement must round-trip the standard formats): csv, json
  * (+gzip), orc, text. Each with explicit schemas — no inference in
  * pipeline code. */
class SourceSinkSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-io").toString

  def sample = {
    import spark.implicits._
    Seq((1L, "alpha", 1.5, "2024-01-02"), (2L, "beta,with,commas", -2.25, "2024-03-04"),
      (3L, null.asInstanceOf[String], 0.0, "2024-05-06"))
      .toDF("id", "name", "score", "d")
      .withColumn("d", col("d").cast(DateType))
  }

  test("csv round-trip with explicit schema, header, quoting, nulls") {
    val dir = tmp()
    sample.write.mode("overwrite").option("header", "true").csv(dir)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType), StructField("d", DateType)))
    val back = spark.read.schema(schema).option("header", "true").csv(dir)
    assert(back.orderBy("id").collect().toSeq == sample.orderBy("id").collect().toSeq)
  }

  test("gzipped line-JSON round-trip (the reference's sink format)") {
    val dir = tmp()
    sample.write.mode("overwrite").option("compression", "gzip").json(dir)
    // files are .json.gz on disk
    val files = new java.io.File(dir).listFiles().map(_.getName)
    assert(files.exists(_.endsWith(".json.gz")), files.toSeq)
    val schema = sample.schema
    val back = spark.read.schema(schema).json(dir)
    assert(back.orderBy("id").collect().toSeq == sample.orderBy("id").collect().toSeq)
  }

  test("orc round-trip preserves names and types (nullability widens)") {
    val dir = tmp()
    sample.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      sample.schema.map(f => (f.name, f.dataType)))
    assert(back.orderBy("id").collect().toSeq == sample.orderBy("id").collect().toSeq)
  }

  test("text sink via to_json (exact line layout control)") {
    val dir = tmp()
    sample.select(to_json(struct(sample.columns.map(col).toIndexedSeq: _*)).as("value"))
      .write.mode("overwrite").text(dir)
    val back = spark.read.schema(sample.schema).json(spark.read.text(dir)
      .select(col("value").as("json")).select(col("json")).as(
        org.apache.spark.sql.Encoders.STRING))
    assert(back.orderBy("id").collect().toSeq == sample.orderBy("id").collect().toSeq)
  }
}
