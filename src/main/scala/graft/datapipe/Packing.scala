package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch-assembly operators for training-data pipelines: pack
  * documents into fixed token-budget batches ("sequence packing") and
  * schedule a weighted mixture of sources into a deterministic
  * training order.
  *
  * Both are pure window/rank computations — deterministic on any
  * engine and any partitioning PROVIDED the ordering key is unique
  * within its window partition (document ids are; see each method's
  * contract) — and shuffle-once per shard: the window partitions by
  * the shard column, so each shard's packing runs independently in
  * parallel. At 100 TB the shard column (source, language, date
  * bucket) bounds per-task state; there is no global sequential scan.
  */
object Packing {

  /** Sliding-window DOCUMENT CHUNKING — the complement of packing:
    * long documents are cut into fixed-size training windows of
    * `chunkTokens` whitespace tokens advancing by `stride` (stride <
    * chunkTokens ⇒ overlapping context windows, the standard LM
    * pretraining shape). Chunk count is `1 + ceil(max(0, n_tokens −
    * chunkTokens)/stride)` with starts `0, stride, 2·stride, …` — so
    * every token is covered, every chunk past the first contributes
    * at least one new token (no fully-contained trailing window), the
    * last chunk may be short, and a doc shorter than `chunkTokens`
    * yields exactly one chunk. Emits (id, chunk_idx, start_tok,
    * n_chunk_tokens, chunk_text) with chunk_text rejoined on single
    * spaces (whitespace-normalizing, deterministic on any engine).
    *
    * Scale shape: pure per-row generate (sequence + explode) inside
    * whole-stage codegen — no shuffle, no window, no state; output
    * rows ∝ input tokens / stride. Empty/whitespace-only docs emit
    * zero rows (there is no window to train on). */
  def chunkDocuments(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", chunkTokens: Int = 64,
      stride: Int = 48): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1: $chunkTokens")
    require(stride >= 1 && stride <= chunkTokens,
      s"stride must be in [1, chunkTokens]: $stride")
    graft.util.Par.ensure(df)
      .select(col(idCol),
        expr(s"filter(split($textCol, '${graft.util.Tok.WsSqlLit}'), t -> t <> '')")
          .as("__toks"))
      .filter(size(col("__toks")) >= 1)
      .select(col(idCol), col("__toks"),
        explode(expr(
          s"""sequence(0, CAST(greatest(0,
             |  (size(__toks) - $chunkTokens + $stride - 1) DIV $stride) AS INT))"""
            .stripMargin))
          .as("chunk_idx"))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        (col("chunk_idx").cast("long") * stride).as("start_tok"),
        least(lit(chunkTokens.toLong),
          size(col("__toks")).cast("long") - col("chunk_idx") * stride)
          .as("n_chunk_tokens"),
        expr(s"concat_ws(' ', slice(__toks, chunk_idx * $stride + 1, $chunkTokens))")
          .as("chunk_text"))
  }

  /** TOKEN-BUDGET document chunking over a positional weight relation
    * (e.g. [[Bpe.wordSymCounts]] — one row per word occurrence with
    * its encoded subword length): within each document, unit `posCol`
    * orders the stream and each unit belongs to the chunk where its
    * cumulative-weight START offset falls (chunk_idx = floor(
    * cum_before / budget)) — [[packByBudget]]'s concatenate-then-chunk
    * rule applied INSIDE a document, with weights in the tokens a
    * model actually consumes instead of a whitespace proxy. Like
    * packByBudget, a unit straddling a boundary counts toward the
    * earlier chunk, so a chunk may exceed the budget by at most one
    * unit's weight (the consumer splits at exact token offsets);
    * complement of [[chunkDocuments]]'s fixed-COUNT windows.
    *
    * Scale shape: one per-document window cumsum (documents are the
    * partition key — no global stage) + one partial-aggregated
    * groupBy; rows ∝ word occurrences in, chunks out. `posCol` must
    * be unique within a document (positions are). */
  def chunkByTokenBudget(symCounts: DataFrame, budget: Long,
      idCol: String = "doc_id", posCol: String = "j",
      weightCol: String = "n_syms"): DataFrame = {
    require(budget >= 1, s"budget must be >= 1: $budget")
    val w = Window.partitionBy(col(idCol)).orderBy(col(posCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    symCounts
      .withColumn("__cum", coalesce(sum(col(weightCol)).over(w), lit(0L)))
      .withColumn("chunk_idx", expr(s"__cum DIV $budget"))
      .groupBy(col(idCol), col("chunk_idx"))
      .agg(count(lit(1)).as("n_words"),
        sum(col(weightCol)).as("n_bpe_tokens"),
        min(col(posCol)).cast("long").as("start_word"))
  }

  /** Greedy OFFSET packing: within each `shardCol` partition,
    * documents ordered by `idCol` fill a contiguous token stream; a
    * document belongs to the batch where its START offset falls
    * (batch_id = floor(cumsum_before / budget)). This is the
    * "concatenate-then-chunk" pretraining layout: a document that
    * straddles a boundary still counts toward the earlier batch, so a
    * batch's token total MAY exceed the budget (the consumer splits at
    * exact token offsets, not document edges). For document-atomic
    * batches that never exceed the budget, use [[packByBudgetStrict]].
    * `idCol` must be a unique key within a shard — the running sum
    * follows its order, and ties would make batch boundaries
    * partition-order dependent. */
  def packByBudget(df: DataFrame, shardCol: String, idCol: String,
      tokensCol: String, tokenBudget: Long): DataFrame = {
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(tokensCol)).over(w))
      .withColumn("batch_id",
        floor((col("__cum") - col(tokensCol)) / lit(tokenBudget)))
      .drop("__cum")
  }

  /** Budget-RESPECTING packing: documents stay atomic and a batch
    * never exceeds `tokenBudget` unless a single document does (such a
    * document gets a batch of its own). The running "fill level" needs
    * a reset at each batch close, which no window frame expresses —
    * this is a per-shard sequential scan via `flatMapSortedGroups`
    * (each shard is one task; shards run in parallel, so the shard
    * column must bound per-task row counts at scale, same contract as
    * [[packByBudget]]). Output: (shard, id, n_tokens, batch_id). */
  def packByBudgetStrict(df: DataFrame, shardCol: String, idCol: String,
      tokensCol: String, tokenBudget: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(shardCol).cast("string"), col(idCol).cast("long"),
        col(tokensCol).cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col(idCol).asc) { (shard, rows) =>
        var batch = 0L
        var fill = 0L
        rows.map { case (_, id, n) =>
          if (fill > 0 && fill + n > tokenBudget) { batch += 1; fill = 0L }
          fill += n
          (shard, id, n, batch)
        }
      }
      .toDF(shardCol, idCol, tokensCol, "batch_id")
  }

  /** Token-BUDGET sampling: keep each source's documents, in
    * deterministic [[Sampling.hashKey]] order, until the source's
    * cumulative token count reaches its quota — the "take N billion
    * tokens from source s" op that builds a training mix by token
    * mass, not document count. A document is kept iff the running sum
    * INCLUDING it is ≤ the budget, so a kept set never exceeds quota
    * and is a prefix of the source's hash order (reproducible on any
    * engine / partitioning, leak-free across budget changes: raising a
    * quota only ADDS documents).
    *
    * The per-source running sum is NOT a per-source window (one task
    * per source — the q65 skew trap): it reuses the value-band trick
    * of [[mixtureSchedule]], as a banded prefix SUM — per-(source,
    * band) token totals (a small aggregate) cumsum into band offsets,
    * and only the within-band running sum is a window, whose partition
    * is a balanced ~1/bands slice of a source. */
  def tokenBudgetSample(df: DataFrame, sourceCol: String, idCol: String,
      tokensCol: String, budgets: Map[String, Long], defaultBudget: Long,
      salt: String = "", nBands: Int = 0): DataFrame = {
    require(defaultBudget >= 0 && budgets.values.forall(_ >= 0),
      s"token budgets must be non-negative: $budgets default=$defaultBudget")
    val spark = df.sparkSession
    import spark.implicits._
    val bands: Long =
      if (nBands > 0) nBands.toLong
      else spark.sessionState.conf.numShufflePartitions.toLong * 4
    val dim = budgets.toSeq.toDF("__bsrc", "__budget")
    // a row with a null token count has no defined place in a token
    // budget (window sum would skip it but still emit the row);
    // exclude such rows up front — "no measurable mass, never sampled"
    val withBand = df
      .filter(col(tokensCol).isNotNull)
      .withColumn("__hk", Sampling.hashKey(col(idCol), salt))
      .withColumn("__hband",
        least(floor(conv(col("__hk"), 16, 10).cast("long") /
          lit(4294967296.0 / bands)), lit(bands - 1)).cast("long"))
    // per-(source, band) token totals → per-source EXCLUSIVE cumulative
    // offsets; the window runs on O(nSources·nBands) aggregate rows
    val srcOffsets = withBand
      .groupBy(col(sourceCol).as("__osrc"), col("__hband").as("__oband"))
      .agg(sum(col(tokensCol)).as("__bw"))
      .withColumn("__soffset",
        coalesce(sum(col("__bw")).over(Window.partitionBy(col("__osrc"))
          .orderBy(col("__oband"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__osrc"), col("__oband"), col("__soffset"))
    withBand
      .withColumn("__local", sum(col(tokensCol)).over(
        Window.partitionBy(col(sourceCol), col("__hband"))
          .orderBy(col("__hk"), col(idCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(broadcast(srcOffsets),
        col(sourceCol) === col("__osrc") && col("__hband") === col("__oband"))
      .join(broadcast(dim), col(sourceCol) === col("__bsrc"), "left_outer")
      .filter(col("__soffset") + col("__local") <=
        coalesce(col("__budget"), lit(defaultBudget)))
      .drop("__hk", "__hband", "__local", "__osrc", "__oband",
        "__soffset", "__bsrc", "__budget")
  }

  /** Deterministic weighted-mixture schedule: each source's rows are
    * ranked by a stable content hash, and row r of source s is placed
    * at virtual position r / weight(s) — a source with weight 2w
    * appears twice as often as one with weight w in any prefix of the
    * schedule (stride scheduling). Output adds `position` (the sort
    * key) and `mix_rank` (the global order). Rows of unlisted sources
    * get `defaultWeight`.
    *
    * NEITHER rank here is computed with a window whose partition a
    * single task must sort. A global-sort window is one task for the
    * whole dataset; a per-source window is one task per source, and a
    * training mixture has O(10) sources of which one often holds most
    * of the corpus — both funnel ~everything through one executor
    * thread. Instead both ranks use deterministic VALUE BANDS:
    *
    *  - the per-source rank (order = hashKey(id), id) bands on the
    *    numeric value of `hashKey(id)` itself — fixed-width hex
    *    compares lexicographically == numerically, so the bands are a
    *    prefix-respecting cut of the per-source order, and md5 is
    *    uniform so they are balanced by construction;
    *  - `mix_rank` (order = position, source, id) bands on
    *    floor(position / bandWidth).
    *
    * Each (source, band) / band ranks in parallel; per-band row counts
    * (an O(nSources·nBands) / O(nBands) aggregate — the only data
    * crossing a narrow stage) shift the local ranks into the global
    * order. Band membership is a pure function of the row, so the
    * result is independent of physical partitioning. */
  def mixtureSchedule(df: DataFrame, sourceCol: String, idCol: String,
      weights: Map[String, Double], defaultWeight: Double,
      nBands: Int = 0): DataFrame = {
    require(defaultWeight > 0 && weights.values.forall(_ > 0),
      s"mixture weights must be positive (zero would schedule a source at " +
        s"position Infinity — i.e. never; negative would invert its order): " +
        s"$weights default=$defaultWeight")
    val spark = df.sparkSession
    import spark.implicits._
    val bands: Long =
      if (nBands > 0) nBands.toLong
      else spark.sessionState.conf.numShufflePartitions.toLong * 4
    val dim = weights.toSeq.toDF("__src", "__w")
    // per-source rank, banded: hashKey is 8 hex chars — uniform over
    // [0, 2^32), and string order == numeric order — so cutting its
    // value range into `bands` slices partitions each source's
    // (hashKey, id) order into contiguous, balanced runs.
    val withBand = df
      .join(broadcast(dim), col(sourceCol) === col("__src"), "left_outer")
      .withColumn("__weight", coalesce(col("__w"), lit(defaultWeight)))
      .withColumn("__hk", Sampling.hashKey(col(idCol)))
      .withColumn("__hband",
        least(floor(conv(col("__hk"), 16, 10).cast("long") /
          lit(4294967296.0 / bands)), lit(bands - 1)).cast("long"))
    // per-(source, band) counts → per-source cumulative offsets: the
    // window runs on O(nSources·nBands) aggregated rows, never row data
    val srcOffsets = withBand
      .groupBy(col(sourceCol).as("__osrc"), col("__hband").as("__oband"))
      .agg(count(lit(1)).as("__bn"))
      .withColumn("__soffset",
        coalesce(sum(col("__bn")).over(Window.partitionBy(col("__osrc"))
          .orderBy(col("__oband"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__osrc"), col("__oband"), col("__soffset"))
    val ranked = withBand
      .withColumn("__lr", row_number().over(
        Window.partitionBy(col(sourceCol), col("__hband"))
          .orderBy(col("__hk"), col(idCol))))
      .join(broadcast(srcOffsets),
        col(sourceCol) === col("__osrc") && col("__hband") === col("__oband"))
      .withColumn("__r", col("__soffset") + col("__lr"))
      .withColumn("position", col("__r").cast("double") / col("__weight"))
      .drop("__hk", "__hband", "__lr", "__osrc", "__oband", "__soffset")
    // schedule length = max position: a 1-row broadcast aggregate
    val lmax = ranked.agg(max(col("position")).as("__lmax"))
    val banded = ranked.crossJoin(broadcast(lmax))
      .withColumn("__band",
        least(floor(col("position") / (col("__lmax") / bands)), lit(bands - 1))
          .cast("long"))
    // per-band offsets: O(nBands) rows through the cumsum window —
    // the deliberate, bounded exception to "no single-partition stage"
    val offsets = banded.groupBy(col("__band")).agg(count(lit(1)).as("__n"))
      .withColumn("__offset",
        coalesce(sum(col("__n")).over(Window.orderBy(col("__band"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__band"), col("__offset"))
    banded
      .withColumn("__band_rank", row_number().over(
        Window.partitionBy(col("__band"))
          .orderBy(col("position"), col(sourceCol), col(idCol))))
      .join(broadcast(offsets), Seq("__band"))
      .withColumn("mix_rank", (col("__offset") + col("__band_rank")).cast("long"))
      .drop("__src", "__w", "__weight", "__r", "__lmax", "__band",
        "__band_rank", "__offset")
  }

  /** Exact integer square root as a column expression: one IEEE
    * `sqrt` (correctly rounded, so both engines compute the same
    * double) followed by a ±1 correction that makes the result exact
    * REGARDLESS of that rounding — floor(√m) for any non-negative
    * BIGINT m, bit-portable by construction. */
  def isqrt(m: Column): Column = {
    val t = floor(sqrt(m.cast("double"))).cast("long")
    when(t * t > m, t - 1L)
      .when((t + 1L) * (t + 1L) <= m, t + 1L)
      .otherwise(t)
  }

  /** TEMPERATURE-scaled budget apportionment (the UniMax / multinomial
    * α-sampling family with α = 1/2, in exact integer arithmetic): a
    * total token budget B is split across sources proportionally to
    * √mass instead of mass, up-weighting small sources the way
    * multilingual/multi-domain pretraining mixes do (raw-proportional
    * sampling lets one giant crawl drown every minority source;
    * α = 1/2 is the standard compromise). √ is the one temperature
    * that stays EXACT in integers ([[isqrt]]); the apportionment is
    * Hamilton largest-remainder with a total (remainder desc, source
    * asc) tie order, so Σ quota = B exactly and every step is
    * bit-portable — the oracle replays weights, floors, remainders,
    * and the tie-ranked top-up.
    *
    * Scale shape: one partial-agg groupBy to the per-source mass
    * relation (~|sources| rows); the windows (ranking remainders,
    * summing weights) run on those AGGREGATE rows only — the
    * rankNormalize precedent — so row data crosses one exchange
    * exactly once. Emits (source, token_mass, weight, quota). */
  def sqrtApportion(docs: DataFrame, sourceCol: String, tokenCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be non-negative: $budget")
    val masses = docs.groupBy(col(sourceCol))
      .agg(sum(col(tokenCol)).as("token_mass"))
      .withColumn("weight", isqrt(col("token_mass")))
    // totals over the tiny aggregate relation (1-row broadcast)
    val totals = masses.agg(sum(col("weight")).as("__tw"))
    val based = masses.crossJoin(broadcast(totals))
      .withColumn("__base",
        when(col("__tw") === 0L, lit(0L))
          // BIGINT floor division (overflow bound: budget·weight < 2⁶³)
          .otherwise(expr(s"CAST($budget AS BIGINT) * weight DIV __tw")))
      .withColumn("__rem",
        when(col("__tw") === 0L, lit(0L))
          .otherwise(lit(budget) * col("weight") - col("__base") * col("__tw")))
    val leftover = based.agg((lit(budget) - sum(col("__base"))).as("__left"))
    based.crossJoin(broadcast(leftover))
      .withColumn("__rr", row_number().over(
        Window.orderBy(col("__rem").desc, col(sourceCol))))
      .withColumn("quota",
        col("__base") + when(col("__rr") <= col("__left") &&
          col("__tw") > 0L, 1L).otherwise(0L))
      .select(col(sourceCol), col("token_mass"), col("weight"), col("quota"))
  }

  /** UniMax budget allocation (Chung et al. 2022, "UniMax: Fairer and
    * More Effective Language Sampling"): fill a total token budget as
    * UNIFORMLY across sources as possible, capping each source at
    * `maxEpochs` passes over its own mass — the repetition-bounded
    * alternative to temperature mixing (α-scaling still over-repeats
    * tiny sources; UniMax never exceeds the epoch cap). Exact-integer
    * water-filling: with caps c_i = mass_i · maxEpochs sorted
    * ascending, a source is CAPPED iff granting every remaining
    * source at least its cap is feasible — the cross-multiplied test
    * c_k · (n − k + 1) ≤ B − Σ_{j<k} c_j on prefix sums (monotone in
    * k, so the capped set is a prefix of the sort). Uncapped sources
    * share the leftover exactly: base = leftover DIV u with the
    * remainder distributed +1 by (source asc). Σ quota = min(B, Σ c)
    * exactly; every step is a BIGINT comparison or floor — the oracle
    * replays the sort, the feasibility test, and the remainder
    * distribution.
    *
    * Scale shape: identical to [[sqrtApportion]] — one partial-agg
    * groupBy to the per-source mass relation; every window runs on
    * those ~|sources| AGGREGATE rows. Emits (source, token_mass, cap,
    * capped, quota). */
  def unimaxAllocate(docs: DataFrame, sourceCol: String, tokenCol: String,
      budget: Long, maxEpochs: Long): DataFrame = {
    require(budget >= 0, s"budget must be non-negative: $budget")
    require(maxEpochs >= 1, s"maxEpochs must be >= 1: $maxEpochs")
    val masses = docs.groupBy(col(sourceCol))
      .agg(sum(col(tokenCol)).as("token_mass"))
      .withColumn("cap", col("token_mass") * maxEpochs)
    val wOrd = Window.orderBy(col("cap"), col(sourceCol))
    val n = masses.agg(count(lit(1)).as("__n"))
    val sorted = masses.crossJoin(broadcast(n))
      .withColumn("__k", row_number().over(wOrd).cast("long"))
      .withColumn("__p",
        coalesce(sum(col("cap")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("capped",
        when(col("cap") * (col("__n") - col("__k") + 1L)
          <= lit(budget) - col("__p"), 1L).otherwise(0L))
    val fill = sorted.agg(
      sum(when(col("capped") === 1L, col("cap")).otherwise(0L)).as("__fc"),
      sum(lit(1L) - col("capped")).as("__u"))
    sorted.crossJoin(broadcast(fill))
      .withColumn("__left", lit(budget) - col("__fc"))
      .withColumn("__base",
        when(col("__u") > 0L, expr("__left DIV __u")).otherwise(lit(0L)))
      .withColumn("__rem",
        when(col("__u") > 0L, col("__left") % col("__u")).otherwise(lit(0L)))
      .withColumn("__ur", row_number().over(
        Window.orderBy(col("capped"), col(sourceCol))).cast("long"))
      .withColumn("quota",
        when(col("capped") === 1L, col("cap"))
          .otherwise(col("__base") +
            when(col("__ur") <= col("__rem"), 1L).otherwise(0L)))
      .select(col(sourceCol), col("token_mass"), col("cap"),
        col("capped"), col("quota"))
  }
}
