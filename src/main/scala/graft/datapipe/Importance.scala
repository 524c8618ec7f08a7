package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Expressions
import graft.util.{Par, Tok}

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023):
  * score every raw document by how much more likely its hashed n-gram
  * features are under a TARGET distribution than under the raw-corpus
  * distribution — the standard "select web data that looks like the
  * high-quality slice" pretraining curation step.
  *
  * The published estimator: features are word unigrams + bigrams hashed
  * into `buckets`; both distributions are Laplace-smoothed bucket
  * frequencies; a document's log importance weight is
  * Σ_b c_b · [log p_tgt(b) − log p_raw(b)]. Here the whole computation
  * is EXACT integer fixed point: log2 via [[graft.functions.Log2FixedExpr]]
  * (the square-and-shift integer algorithm, bit-identical in DuckDB via
  * [[graft.queries.FixedLogSql]]), so the scores — unlike float
  * log-likelihoods — hash-match across engines. Expanding the smoothed
  * ratio, with B = buckets, Nx = total feature mass of corpus x:
  *
  *   weight_fp = Σ_b c_b·[log2f(ct_b+1) − log2f(cr_b+1)]
  *             + n_feats·[log2f(Nr+B) − log2f(Nt+B)]
  *
  * (the per-bucket term prices rarity, the constant term normalizes
  * corpus sizes). weight_fp > 0 ⇔ the doc is more target-like than
  * raw-average; resampling keeps the top slice.
  *
  * Scale shape: one (doc, bucket) partial-agg shuffle over the raw
  * corpus (bucket-hashed rows, never gram strings past the first
  * projection), bucket relations ≤ B rows (the per-bucket log weights
  * price at MODEL size), the weight table broadcast back onto the
  * per-doc counts, corpus totals as 1-row broadcast cross joins. The
  * target corpus is scanned once. No collect, no vocabulary on the
  * driver. */
object Importance {

  /** Fixed-point scale of the log weights (Q16). */
  val FracBits: Int = 16

  private def log2f(c: Column): Column = Expressions.log2_fixed(c, FracBits)

  /** Word unigram + bigram occurrences of `textCol`, hashed into
    * `mask+1` buckets: one row per occurrence, (cols..., __bucket). */
  private[datapipe] def bucketStream(df: DataFrame, textCol: String,
      mask: Long, cols: Seq[Column]): DataFrame = {
    val base = Par.ensure(df).select(cols :+
      expr(s"filter(split(lower($textCol), '${Tok.WsSqlLit}'), t -> t <> '')")
        .as("__toks"): _*)
    val bigrams = when(size(col("__toks")) >= 2,
      expr("""transform(sequence(0, size(__toks) - 2),
             |  i -> concat_ws(' ', element_at(__toks, i + 1),
             |                      element_at(__toks, i + 2)))""".stripMargin))
      .otherwise(expr("CAST(array() AS array<string>)"))
    base.select(cols :+
        explode(concat(col("__toks"), bigrams)).as("__gram"): _*)
      .select(cols :+ Expressions.fnv64_mask(col("__gram"), mask).as("__bucket"): _*)
  }

  /** Per-document DSIR importance weights of `raw` against `target`:
    * (idCol, n_feats, weight_fp) with weight_fp in Q[[FracBits]].
    * `buckets` must be a power of two (mask-hash ≡ the oracle's
    * unsigned modulo). Documents with no features score 0. */
  def importanceWeights(raw: DataFrame, target: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      buckets: Int = 4096): DataFrame = {
    require(buckets >= 2 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two: $buckets")
    val mask = (buckets - 1).toLong
    val perDocBucket = bucketStream(raw, textCol, mask, Seq(col(idCol)))
      .groupBy(col(idCol), col("__bucket")).agg(count(lit(1)).as("__c"))
    val (wb, norm) = modelFrom(perDocBucket, target, textCol, buckets)
    val perDoc = perDocBucket.join(broadcast(wb), Seq("__bucket"))
      .groupBy(col(idCol)).agg(
        sum(col("__c")).as("__n"),
        sum(col("__c") * col("__wb")).as("__s"))
    raw.select(col(idCol)).join(perDoc, Seq(idCol), "left_outer")
      .crossJoin(broadcast(norm))
      .select(col(idCol),
        coalesce(col("__n"), lit(0L)).as("n_feats"),
        (coalesce(col("__s"), lit(0L))
          + coalesce(col("__n"), lit(0L)) * col("__norm")).as("weight_fp"))
  }

  /** The per-bucket log-weight relation `(__bucket, __wb)` and 1-row
    * normalizer `(__norm)` from the raw per-(doc, bucket) counts. */
  private def modelFrom(perDocBucket: DataFrame, target: DataFrame,
      textCol: String, buckets: Int): (DataFrame, DataFrame) = {
    val mask = (buckets - 1).toLong
    // raw bucket totals derived FROM the per-doc counts: no second
    // pass over the corpus (the lmScore prefix-count precedent)
    val rawBuckets = perDocBucket.groupBy(col("__bucket"))
      .agg(sum(col("__c")).as("__cr"))
    val tgtBuckets = bucketStream(target, textCol, mask, Seq.empty)
      .groupBy(col("__bucket")).agg(count(lit(1)).as("__ct"))
    // FULL outer: a bucket present only in the target corpus still
    // carries weight log2f(ct+1) − log2f(0+1) > 0 — dropping it (the
    // old left join) would score exactly the most target-like unseen
    // features as 0 in the collected/streaming model. Batch
    // importanceWeights is unaffected either way (raw docs only probe
    // raw buckets), so the two faces stay bit-identical where both see
    // the bucket.
    val wb = rawBuckets.join(tgtBuckets, Seq("__bucket"), "full_outer")
      .select(col("__bucket"),
        (log2f(coalesce(col("__ct"), lit(0L)) + 1L)
          - log2f(coalesce(col("__cr"), lit(0L)) + 1L)).as("__wb"))
    // corpus-size normalizer: log2f(Nr + B) − log2f(Nt + B), one row
    val nr = rawBuckets.agg(sum(col("__cr")).as("__nr"))
    val nt = tgtBuckets.agg(sum(col("__ct")).as("__nt"))
    val norm = nr.crossJoin(nt).select(
      (log2f(col("__nr") + buckets.toLong)
        - log2f(coalesce(col("__nt"), lit(0L)) + buckets.toLong)).as("__norm"))
    (wb, norm)
  }

  /** The trained DSIR model as driver-side artifacts for ONLINE
    * scoring ([[graft.streaming.StreamingPipeline.dsirScoreStream]]
    * probes the map the way LM scoring probes its gram table):
    * (bucket → Q16 log-weight, corpus-size normalizer). The collect
    * is bounded by `buckets` rows — model-sized, like the k-means
    * centroid collects, never corpus-sized. The map carries every
    * bucket either corpus touched (full-outer model build), so a map
    * miss means BOTH smoothed counts are 0 and the weight is exactly
    * 0 — the model's answer, not an approximation. */
  def importanceModelCollected(raw: DataFrame, target: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      buckets: Int = 4096): (Map[Long, Long], Long) = {
    require(buckets >= 2 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two: $buckets")
    val mask = (buckets - 1).toLong
    val perDocBucket = bucketStream(raw, textCol, mask, Seq(col(idCol)))
      .groupBy(col(idCol), col("__bucket")).agg(count(lit(1)).as("__c"))
    val (wb, norm) = modelFrom(perDocBucket, target, textCol, buckets)
    val m = wb.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (m, norm.collect()(0).getLong(0))
  }

  /** Driver/closure-side twin of the per-document scoring: the
    * feature stream ([[bucketStream]] semantics — lowercased Tok.WS
    * unigrams + bigrams, fnv64-mask buckets) replayed in plain Scala
    * against a collected model. The single source of truth for the
    * streaming twin and its parity spec. */
  def scoreRow(text: String, model: Map[Long, Long], norm: Long,
      buckets: Int): (Long, Long) = {
    val mask = (buckets - 1).toLong
    val toks =
      if (text == null) Array.empty[String]
      else Tok.WsRegex.split(text.toLowerCase(java.util.Locale.ROOT))
        .filter(_.nonEmpty)
    var n = 0L
    var s = 0L
    def add(g: String): Unit = {
      n += 1
      s += model.getOrElse(Hashing.fnv64(g) & mask, 0L)
    }
    var i = 0
    while (i < toks.length) {
      add(toks(i))
      if (i + 1 < toks.length) add(toks(i) + " " + toks(i + 1))
      i += 1
    }
    (n, s + n * norm)
  }
}
