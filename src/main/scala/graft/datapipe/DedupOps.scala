package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines
  * (builder brief): exact, MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * Scale design notes (100 TB):
  *  - exact dedup groups on a 128-bit content hash, never on the text
  *    itself — the shuffle carries 16 bytes + ids per row, not documents;
  *  - MinHash/LSH is the shingle→signature→band→bucket-join pattern: the
  *    only shuffles are (a) band-bucket grouping on an 8-byte key and
  *    (b) candidate-pair distinct. Bucket size is capped (`maxBucket`) so
  *    a degenerate key (boilerplate docs) cannot produce a quadratic
  *    pair explosion — the cap drops only buckets where every member is
  *    already near-identical to many others (they remain represented via
  *    other bands);
  *  - exact-Jaccard verification re-joins candidate ids to texts instead
  *    of carrying shingle sets through the shuffle.
  */
object DedupOps {

  // ---- exact ----

  /** Canonical id per distinct text: group by xxhash64+md5 of the text.
    * Survivors = min(doc_id) per group (stable, deterministic). */
  def exactDedup(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_md5"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("text_md5"))

  // ---- minhash / LSH ----

  val NumPerm = 128
  val Bands = 32 // rows=4 → LSH threshold ≈ (1/32)^(1/4) ≈ 0.42

  private val minhashSigUdf = udf((text: String, numPerm: Int, shingleN: Int) =>
    Hashing.minhash(Hashing.shingleSet(if (text == null) "" else text, shingleN), numPerm))

  private val bandKeysUdf = udf((sig: Seq[Long], bands: Int) =>
    Hashing.bandKeys(sig.toArray, bands))

  private val jaccardUdf = udf((a: String, b: String, shingleN: Int) =>
    Hashing.jaccardSorted(
      Hashing.shingleSet(if (a == null) "" else a, shingleN),
      Hashing.shingleSet(if (b == null) "" else b, shingleN)))

  /** Candidate near-duplicate pairs via MinHash LSH banding.
    * Output: (id_a, id_b) with id_a < id_b, distinct. */
  def minhashCandidates(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleN: Int = 3,
      numPerm: Int = NumPerm,
      bands: Int = Bands,
      maxBucket: Int = 64): DataFrame = {
    val sigs = docs.select(
      col(idCol).as("id"),
      bandKeysUdf(minhashSigUdf(col(textCol), lit(numPerm), lit(shingleN)), lit(bands)).as("bands"))
    val buckets = sigs
      .select(col("id"), posexplode(col("bands")).as(Seq("band_idx", "band_key")))
      .groupBy(col("band_idx"), col("band_key"))
      .agg(collect_list(col("id")).as("members"))
      .filter(size(col("members")).between(2, maxBucket))
    // pairs within bucket (sorted, i<j), then global distinct
    buckets
      .select(explode(pairsExpr(col("members"))).as("pair"))
      .select(col("pair._1").as("id_a"), col("pair._2").as("id_b"))
      .distinct()
  }

  /** array<long> → array<struct<_1,_2>> of ordered pairs, built from
    * built-in higher-order functions (stays in codegen). */
  private def pairsExpr(members: Column): Column = {
    val sorted = array_sort(members)
    flatten(transform(sorted, (x, i) =>
      transform(slice(sorted, i + lit(2), size(sorted)), y => struct(x.as("_1"), y.as("_2")))))
  }

  /** Near-duplicate pairs: LSH candidates verified with exact n-gram
    * Jaccard ≥ `minJaccard` (this is also the "n-gram Jaccard dedup"
    * operator — candidates from LSH instead of a quadratic self-join). */
  def minhashNearDupPairs(
      docs: DataFrame,
      minJaccard: Double,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleN: Int = 3): DataFrame = {
    val cands = minhashCandidates(docs, idCol, textCol, shingleN)
    val txt = docs.select(col(idCol).as("jid"), col(textCol).as("jtext"))
    cands
      .join(txt, col("id_a") === col("jid")).withColumnRenamed("jtext", "text_a").drop("jid")
      .join(txt, col("id_b") === col("jid")).withColumnRenamed("jtext", "text_b").drop("jid")
      .withColumn("jaccard", jaccardUdf(col("text_a"), col("text_b"), lit(shingleN)))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Connected-component style dedup: keep the min id of each near-dup
    * cluster (single-pass union via smallest-neighbor — documents whose
    * id equals the cluster min survive). For full transitive closure at
    * scale, iterate `largeStarSmallStar` (documented; one pass suffices
    * for pairwise-similar clusters). */
  def minhashDedupSurvivors(docs: DataFrame, minJaccard: Double): DataFrame = {
    val pairs = minhashNearDupPairs(docs, minJaccard)
    val dropped = pairs.select(col("id_b").as("doc_id")).distinct()
    docs.join(dropped, Seq("doc_id"), "left_anti")
  }

  // ---- simhash ----

  /** doc_id → 64-bit simhash (native codegen expression, Expressions.scala). */
  def simhashes(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("id"),
      graft.functions.Expressions.simhash64(col(textCol)).as("simhash"))

  /** Near-dup pairs with Hamming distance ≤ maxHamming, found by the
    * 4-block trick: split 64 bits into (maxHamming+1) blocks — any pair
    * within distance k agrees exactly on ≥1 block (pigeonhole), so
    * block-equality buckets are a complete candidate set. */
  def simhashNearDupPairs(
      docs: DataFrame,
      maxHamming: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxBucket: Int = 256): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 31, s"maxHamming out of range: $maxHamming")
    val blocks = maxHamming + 1
    val width = 64 / blocks
    // 1L << 64 wraps to 1 in JVM shift semantics; width==64 needs -1L
    val mask = if (width == 64) -1L else (1L << width) - 1
    val sh = simhashes(docs, idCol, textCol)
    val withBlocks = sh.select(col("id"), col("simhash"),
      explode(expr(
        s"transform(sequence(0, ${blocks - 1}), b -> named_struct('block_idx', b, 'block_val', (simhash >> (b * $width)) & $mask))"
      )).as("blk"))
    val buckets = withBlocks
      .groupBy(col("blk.block_idx"), col("blk.block_val"))
      .agg(collect_list(struct(col("id"), col("simhash"))).as("members"))
      .filter(size(col("members")).between(2, maxBucket))
    val pairs = buckets.select(explode(pairsStructExpr(col("members"))).as("p"))
      .select(col("p.a_id").as("id_a"), col("p.b_id").as("id_b"),
        col("p.a_sh").as("sh_a"), col("p.b_sh").as("sh_b"))
      .distinct()
    pairs
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
      .orderBy(col("id_a"), col("id_b"))
  }

  private def pairsStructExpr(members: Column): Column = {
    val sorted = array_sort(members)
    flatten(transform(sorted, (x, i) =>
      transform(slice(sorted, i + lit(2), size(sorted)), y =>
        struct(x.getField("id").as("a_id"), y.getField("id").as("b_id"),
          x.getField("simhash").as("a_sh"), y.getField("simhash").as("b_sh")))))
  }

  // ---- fingerprinting ----

  private val winnowUdf = udf((text: String, n: Int, w: Int) =>
    Hashing.winnow(if (text == null) "" else text, n, w))

  /** Winnowing fingerprints per doc (rolling-hash min-sampling). */
  def fingerprints(docs: DataFrame, shingleN: Int = 4, window: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("id"),
      winnowUdf(col(textCol), lit(shingleN), lit(window)).as("fingerprint"))
}
