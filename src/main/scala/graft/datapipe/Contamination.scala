package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection: flag training documents sharing
  * word n-gram shingles with an evaluation set — the decontamination
  * gate every LLM data pipeline runs before training (the production
  * setting uses 13-grams; the n is a parameter).
  *
  * Execution shape: the EVAL side is the small side — its distinct
  * shingle set broadcasts; training documents explode to (doc,
  * shingle) postings and inner-join the broadcast, so only matching
  * postings survive into the per-document count. No pairwise document
  * comparison is ever materialized: cost is (train shingles) × hash
  * probe. Shingles are plain normalized word n-gram STRINGS (engine-
  * portable; hash them for a real 100 TB run to cut shuffle width —
  * same plan shape).
  */
object Contamination {

  /** Distinct word n-gram shingle array for a text column (documents
    * shorter than n collapse to one whole-text shingle; empty texts
    * are dropped by the caller's filter). */
  def shingles(text: Column, n: Int): Column = {
    val toks = filter(split(lower(text), graft.util.Tok.WS), t => t =!= "")
    array_distinct(
      when(size(toks) < n, array(array_join(toks, " ")))
        .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)),
          i => array_join(slice(toks, i, lit(n)), " "))))
  }

  /** Exploded shingle postings of non-empty docs, with the leading
    * columns `keep` carried through: one [[Hashing.shingleStrings]]
    * call per row (the spec-pinned twin of [[shingles]]) + explode,
    * after a parallelism guard.
    *
    * Round-17 measurement: the previous `explode(shingles(...))` SQL
    * form ran the whole corpus shingling in the SINGLE-SPLIT scan task
    * (no repartition), with `InferFiltersFromGenerate` additionally
    * pushing two more full copies of the shingle CASE expression into
    * that task's scan filter — 2.76 s where this shape takes ~0.3 s at
    * sf0.1 (guide §2.5 input skew / §7.2 read the plan). */
  private def shinglePostings(df: DataFrame, textCol: String, n: Int,
      keep: Seq[Column]): DataFrame = {
    val shUdf = udf((t: String) =>
      Hashing.shingleStrings(if (t == null) "" else t, n))
    graft.util.Par.ensure(df.filter(length(trim(col(textCol))) > 0))
      .select(keep :+ explode(shUdf(col(textCol))).as("__sh"): _*)
  }

  /** Training documents (idCol) with at least one shingle shared with
    * `eval`: (id, n_shared). `eval`'s distinct shingles broadcast. */
  def contaminated(train: DataFrame, eval_ : DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    val evalShingles = shinglePostings(eval_, textCol, n, Nil)
      .distinct()
    shinglePostings(train, textCol, n, Seq(col(idCol)))
      .join(broadcast(evalShingles), Seq("__sh"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** [[contaminated]]'s 100 TB shape: when the eval set is too big
    * for its exact shingle set to broadcast (a 100k-doc eval suite ×
    * hundreds of shingles each ≈ GBs of strings), broadcast a BLOOM
    * FILTER of it instead (~1% of the size at fpp 0.01) and prune the
    * training postings BEFORE the exact join — candidate-then-verify,
    * the same philosophy as the LSH dedup family:
    *
    *  1. build the bloom over eval's distinct shingles (Spark's
    *     deterministic mergeable sketch — built distributed, collected
    *     once to the driver, broadcast read-only);
    *  2. filter train postings through the broadcast probe — ~(1-fpp)
    *     of non-matching postings never reach a shuffle;
    *  3. exact-verify the survivors with a SHUFFLE join against the
    *     (unbroadcastable) eval shingle table — false positives die
    *     here, so the result is bit-identical to [[contaminated]]
    *     regardless of bloom parameters.
    *
    * The probe is a Scala UDF by necessity (the bloom bitset probe has
    * no Column built-in); it sits on the already-exploded postings and
    * prunes work, never creates it. */
  def contaminatedBloomPruned(train: DataFrame, eval_ : DataFrame,
      idCol: String, textCol: String, n: Int, fpp: Double = 0.01): DataFrame = {
    val spark = train.sparkSession
    val evalShingles = shinglePostings(eval_, textCol, n, Nil)
      .distinct()
    val nEval = evalShingles.count()
    val bloom = evalShingles.stat.bloomFilter("__sh", math.max(nEval, 1L), fpp)
    val bc = spark.sparkContext.broadcast(bloom)
    val mightContain = udf((s: String) => s != null && bc.value.mightContainString(s))
    shinglePostings(train, textCol, n, Seq(col(idCol)))
      .filter(mightContain(col("__sh")))
      .join(evalShingles, Seq("__sh"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Driver-side twin of [[shingles]] (same lower/WS/n-gram/whole-
    * text-under-n/distinct semantics), for closures that hold the
    * eval set as a broadcast Scala Set — parity pinned by spec. */
  def shingleSet(text: String, n: Int): Set[String] = {
    if (text == null) return Set.empty
    // Locale.ROOT: the engine/oracle lower() is locale-independent;
    // default toLowerCase would break parity on e.g. a Turkish JVM
    val toks = graft.util.Tok.WsRegex.split(text.toLowerCase(java.util.Locale.ROOT))
      .filter(_.nonEmpty).toSeq
    if (toks.isEmpty) Set.empty
    else if (toks.length < n) Set(toks.mkString(" "))
    else toks.sliding(n).map(_.mkString(" ")).toSet
  }

  /** Streaming decontamination: the [[decontaminate]] action as a
    * STATELESS stream filter — the (batch) eval set's distinct
    * shingles collect once to a broadcast Set, and each arriving
    * document is admitted iff it shares fewer than `minShared`
    * distinct shingles with it. No state store, append mode, same
    * admission rule as the batch op (spec-pinned equality). The
    * broadcast set is the exact-set small-eval regime; for an eval
    * suite too big to broadcast exactly, swap in the bloom +
    * downstream exact verify of [[contaminatedBloomPruned]]. */
  def decontaminateStream(docs: DataFrame, eval_ : DataFrame,
      textCol: String, n: Int, minShared: Long = 1L): DataFrame = {
    require(minShared >= 1L, s"minShared must be >= 1: $minShared")
    val spark = eval_.sparkSession
    import spark.implicits._
    val evalSh = shinglePostings(eval_, textCol, n, Nil)
      .distinct().as[String].collect().toSet
    val bc = spark.sparkContext.broadcast(evalSh)
    val nShared = udf((text: String) =>
      shingleSet(text, n).count(bc.value.contains).toLong)
    docs.filter(nShared(col(textCol)) < minShared)
  }

  /** The decontamination ACTION: the training corpus with every
    * document sharing ≥ `minShared` distinct eval shingles REMOVED —
    * what a pipeline actually feeds the trainer after the q73-style
    * scan. Detection is [[contaminated]]; removal is one broadcastable
    * anti-join on the (small) flagged-id set, so the action adds no
    * new scale risk: survivors keep all their columns and the corpus
    * is never shuffled. */
  def decontaminate(train: DataFrame, eval_ : DataFrame, idCol: String,
      textCol: String, n: Int, minShared: Long = 1L): DataFrame = {
    require(minShared >= 1L, s"minShared must be >= 1: $minShared")
    val flagged = contaminated(train, eval_, idCol, textCol, n)
      .filter(col("n_shared") >= minShared)
      .select(col(idCol))
    train.join(broadcast(flagged), Seq(idCol), "left_anti")
  }
}
