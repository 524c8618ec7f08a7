package graft.datapipe

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.{Par, Tok}

/** Deterministic SPAN CORRUPTION — the T5 denoising-objective
  * preprocessing (Raffel et al. 2020 §3.1.4): mask a fraction of each
  * document's tokens, collapse each contiguous masked run into one
  * sentinel in the input, and emit the masked spans (each introduced
  * by its sentinel) as the target. The (input, target) pair is what a
  * denoising trainer consumes; producing it is a DATA-pipeline job at
  * corpus scale, not a loader-time job, when the corpus is tokenized
  * once and trained on many times.
  *
  * T5 samples spans from a random process; at 100 TB reproducibility
  * wins: here the mask is a PURE FUNCTION of (id, position, salt) —
  * the md5-prefix keyspace test of [[Sampling.hashKey]] per token —
  * so the corruption is identical on any engine, any partitioning,
  * any rerun, and a different `salt` yields a fresh corruption of the
  * same corpus (one per epoch, the [[Sampling.epochShuffle]]
  * convention). Contiguous masked tokens merge into ONE span exactly
  * as T5 merges; mean span length is governed by the geometric run
  * structure the i.i.d. per-token test induces.
  *
  * Scale shape: positional tokens, the per-doc run-index window (doc-
  * bounded partitions, the established chunking contract), and one
  * doc-keyed reassembly agg. No shuffle beyond the doc key; no UDF;
  * sentinel text is built with codegen'd string ops. */
object Corruption {

  /** Driver/closure-side twin of [[spanCorrupt]] for one document —
    * the single source of truth for the streaming twin
    * ([[graft.streaming.StreamingPipeline.spanCorruptStream]]) and
    * its parity spec. Returns (n_tokens, n_masked, n_spans,
    * input_text, target_text). */
  def spanCorruptRow(id: Long, text: String, rate: Double,
      salt: String): (Long, Long, Long, String, String) = {
    val thresh = Sampling.hexThreshold(rate)
    val toks =
      if (text == null) Array.empty[String]
      else Tok.WsRegex.split(text.toLowerCase(java.util.Locale.ROOT))
        .filter(_.nonEmpty)
    val inp = new StringBuilder
    val tgt = new StringBuilder
    var masked = 0L
    var spans = 0L
    var prevMasked = false
    var i = 0
    while (i < toks.length) {
      val m = Hashing.md5Hex16(s"$id:$i:$salt").substring(0, 8) < thresh
      if (m) {
        masked += 1
        if (!prevMasked) {
          val sent = s"<extra_id_$spans>"
          spans += 1
          if (inp.nonEmpty) inp.append(' ')
          inp.append(sent)
          if (tgt.nonEmpty) tgt.append(' ')
          tgt.append(sent)
        }
        tgt.append(' ').append(toks(i))
      } else {
        if (inp.nonEmpty) inp.append(' ')
        inp.append(toks(i))
      }
      prevMasked = m
      i += 1
    }
    (toks.length.toLong, masked, spans, inp.toString, tgt.toString)
  }

  /** Per-document (input_text, target_text, n_tokens, n_masked,
    * n_spans) with `<extra_id_k>` sentinels, masking ≈ `rate` of
    * tokens. Tokens are the shared lowercased Tok.WS space. */
  def spanCorrupt(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", rate: Double = 0.15,
      salt: String = ""): DataFrame = {
    require(rate > 0.0 && rate < 1.0, s"rate must be in (0,1): $rate")
    val thresh = Sampling.hexThreshold(rate)
    val base = Par.ensure(docs).select(col(idCol), posexplode_outer(expr(
      s"filter(split(lower(coalesce($textCol, '')), '${Tok.WsSqlLit}'), t -> t <> '')"))
      .as(Seq("__i", "__t")))
    val occ = base.filter(col("__t").isNotNull)
      .withColumn("__m",
        when(substring(md5(concat(col(idCol).cast("string"), lit(":"),
          col("__i").cast("string"), lit(":"), lit(salt))), 1, 8)
          < lit(thresh), 1).otherwise(0))
    // masked-run index: cumsum of run STARTS (masked token whose
    // predecessor is unmasked) over the per-doc order; k is 0-based
    val wOrd = Window.partitionBy(col(idCol)).orderBy(col("__i"))
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val runs = occ
      .withColumn("__start",
        when(col("__m") === 1 &&
          coalesce(lag(col("__m"), 1).over(wOrd), lit(0)) === 0, 1)
          .otherwise(0))
      .withColumn("__k", sum(col("__start")).over(wCum) - 1)
    // input piece: unmasked token, or the sentinel at each run start;
    // target piece: sentinel at run start, then every masked token
    val sentinel = concat(lit("<extra_id_"), col("__k").cast("string"),
      lit(">"))
    val pieces = runs.select(col(idCol), col("__i"), col("__m"),
      col("__start"),
      when(col("__m") === 0, col("__t"))
        .when(col("__start") === 1, sentinel).as("__in"),
      when(col("__m") === 1,
        when(col("__start") === 1, concat(sentinel, lit(" "), col("__t")))
          .otherwise(col("__t"))).as("__tg"))
    val perDoc = pieces.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_tokens"),
      sum(col("__m")).cast("long").as("n_masked"),
      sum(col("__start")).cast("long").as("n_spans"),
      concat_ws(" ", expr(
        "transform(array_sort(filter(collect_list(struct(__i, __in)), " +
          "x -> x.__in IS NOT NULL)), x -> x.__in)")).as("input_text"),
      concat_ws(" ", expr(
        "transform(array_sort(filter(collect_list(struct(__i, __tg)), " +
          "x -> x.__tg IS NOT NULL)), x -> x.__tg)")).as("target_text"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_masked"), lit(0L)).as("n_masked"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("input_text"), lit("")).as("input_text"),
        coalesce(col("target_text"), lit("")).as("target_text"))
  }
}
