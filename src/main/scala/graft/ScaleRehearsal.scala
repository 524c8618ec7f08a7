package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10× scale rehearsal (sf1-equivalent): amplifies the COMPLETE sf0.1
  * table set 10× with structure-preserving perturbations, then times
  * the ENTIRE SparkEntry query surface and the MEDLINE pipeline at
  * that scale. The point is memory-shape validation — every operator
  * must hold its bounded per-task state when the corpus grows 10× —
  * not oracle correctness (the driver's gate runs at sf0.01).
  *
  * Amplification preserves the interesting structure:
  *  - documents: copy k rewrites every token t → t_k, so a planted
  *    near-dup pair stays an equally-similar pair inside its copy while
  *    copies of the same doc share ZERO shingles (no artificial
  *    cross-copy near-dup explosion that mass row duplication would
  *    cause);
  *  - embeddings: copy k adds deterministic per-component noise (cosine
  *    neighborhoods inside a copy survive; copies don't collapse onto
  *    each other);
  *  - relational facts (lineitem/orders/customer/supplier/part/events):
  *    copy k shifts every join key by k × (max key + 1), so each copy
  *    is a foreign-key-consistent island — per-key join/window
  *    cardinalities are preserved while global volume grows 10×
  *    (naive row duplication would instead multiply per-key group
  *    sizes and misrepresent the shuffle shape);
  *  - region/nation stay 1× (dimension tables grow slower than facts
  *    in any real warehouse; the broadcast-side posture is the claim
  *    under test).
  *
  * Usage: runMain graft.ScaleRehearsal [factor] [nameRegex] (default 10,
  * all queries). Prints one JSON line of wall-times; see COVERAGE.md
  * "10× scale rehearsal" for recorded results + analysis.
  */
object ScaleRehearsal {

  def amplify(spark: SparkSession, srcDir: String, outDir: String,
      factor: Int): Unit = {
    val out = new java.io.File(outDir)
    if (new java.io.File(s"$outDir/_DONE_full_$factor").exists()) return
    out.mkdirs()
    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    val nDocs = docs.count()
    (0 until factor).map { k =>
      docs.select(
        (col("doc_id") + lit(k.toLong * nDocs)).as("doc_id"),
        // token t -> t_k: same-copy similarity preserved, cross-copy zero
        (if (k == 0) col("text")
         else regexp_replace(col("text"), "(\\S+)", s"$$1_$k")).as("text"),
        col("lang"), col("source"))
    }.reduce(_.unionByName(_))
      // n_chars from the REWRITTEN text (a select-level length() would
      // still see the input column)
      .withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(8)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    val emb = spark.read.parquet(s"$srcDir/embeddings.parquet")
    val nEmb = emb.count()
    (0 until factor).map { k =>
      emb.select(
        (col("vec_id") + lit(k.toLong * nEmb)).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          x + ((i + lit(k * 31)) % 7).cast("float") * lit(0.01f) - lit(0.03f))
          .as("embedding"),
        col("label")) // cluster mix preserved per copy (q165 needs it)
    }.reduce(_.unionByName(_))
      .repartition(8)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")

    // relational facts: key-shifted FK-consistent copies
    def maxKey(t: DataFrame, c: String): Long =
      t.agg(max(col(c).cast("long"))).collect()(0).getLong(0) + 1L
    val li = spark.read.parquet(s"$srcDir/lineitem.parquet")
    val ord = spark.read.parquet(s"$srcDir/orders.parquet")
    val cust = spark.read.parquet(s"$srcDir/customer.parquet")
    val supp = spark.read.parquet(s"$srcDir/supplier.parquet")
    val prt = spark.read.parquet(s"$srcDir/part.parquet")
    val (mOrd, mCust, mSupp, mPart) = (maxKey(ord, "o_orderkey"),
      maxKey(cust, "c_custkey"), maxKey(supp, "s_suppkey"),
      maxKey(prt, "p_partkey"))
    def shifted(t: DataFrame, shifts: Map[String, Long], name: String): Unit =
      (0 until factor).map { k =>
        t.select(t.columns.map { c =>
          shifts.get(c) match {
            case Some(m) => (col(c) + lit(k.toLong * m)).as(c)
            case None => col(c)
          }
        }: _*)
      }.reduce(_.unionByName(_))
        .repartition(8)
        .write.mode("overwrite").parquet(s"$outDir/$name.parquet")
    shifted(li, Map("l_orderkey" -> mOrd, "l_partkey" -> mPart,
      "l_suppkey" -> mSupp), "lineitem")
    shifted(ord, Map("o_orderkey" -> mOrd, "o_custkey" -> mCust), "orders")
    shifted(cust, Map("c_custkey" -> mCust), "customer")
    shifted(supp, Map("s_suppkey" -> mSupp), "supplier")
    shifted(prt, Map("p_partkey" -> mPart), "part")
    // dimension tables ride along unamplified
    for (dim <- Seq("region", "nation"))
      spark.read.parquet(s"$srcDir/$dim.parquet")
        .write.mode("overwrite").parquet(s"$outDir/$dim.parquet")
    // events: per-user streams stay intact, user/eventkey islands shift
    val ev = graft.util.Tables.events(spark, srcDir)
    val (mEvt, mUser) = (maxKey(ev, "event_id"), maxKey(ev, "user_id"))
    shifted(ev, Map("event_id" -> mEvt, "user_id" -> mUser), "events")
    new java.io.File(s"$outDir/_DONE_full_$factor").createNewFile()
  }

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val dir = s"/tmp/graft_scale_${factor}x"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    amplify(spark, srcDir, dir, factor)

    // the ENTIRE driver query surface, in q-number order (numeric
    // sort so q2 runs before q10)
    val headline = SparkEntry.queries.keys.toSeq
      .sortBy(n => (n.drop(1).takeWhile(_.isDigit).toInt, n))
      .filter(n => args.lift(1).forall(f => f.r.findFirstIn(n).isDefined))
    val times = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val counts = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    headline.foreach { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      counts(name) = fn(spark, dir).count()
      times(name) = (System.nanoTime() - t0) / 1e9
    }

    // MEDLINE pipeline at factor x the bench corpus (skipped when a
    // name filter narrows the run to a query spot-rehearsal)
    if (args.lift(1).isEmpty) {
      val medDir = s"/tmp/graft_scale_medline_${factor}x"
      if (!new java.io.File(s"$medDir/pubmed20n0000.xml.gz").exists())
        ops.MedlineGen.generate(medDir, nFiles = 32, perFile = 700 * factor)
      val t0 = System.nanoTime()
      val parsed = ops.MedlineParser.parse(spark,
        ops.MedlineSource.fragments(spark, s"$medDir/*.xml.gz"))
      val latest = ops.Dedup.latestNonDeleted(spark, parsed)
      graft.ops.Enrich.enrich(spark, latest, Bench.medlineVocab)
        .write.mode("overwrite").format("noop").save()
      times("medline_pipeline") = (System.nanoTime() - t0) / 1e9
      counts("medline_pipeline") = parsed.count()
    }

    val qs = times.map { case (k, v) =>
      "\"" + k + "\":{\"sec\":" + f"$v%.2f" + ",\"rows\":" + counts(k) + "}" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"scale_rehearsal","factor":$factor,"queries":$qs}""")
    spark.stop()
  }
}
