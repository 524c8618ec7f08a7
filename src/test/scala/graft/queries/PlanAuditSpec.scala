package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.SparkEntry

/** Plan-shape regression guard: the physical plans that carry the
  * 100 TB design, asserted so a refactor can't silently degrade them.
  * Runs on sf0.001 by default (plan shapes, not timings); set
  * GRAFT_PLAN_AUDIT_DIR to audit the same shapes over another corpus —
  * the 10x scale rehearsal (COVERAGE.md) points it at the amplified
  * sf1-equivalent tables to confirm AQE does not re-plan any of the
  * pinned shapes at that size (documents/embeddings-backed queries;
  * TPC-H-table assertions need the standard layout and are skipped
  * there). */
class PlanAuditSpec extends AnyFunSuite {
  // q26/q40 set experimental.extraStrategies themselves (as in the
  // Verify/Bench sessions); the shared test session works as-is
  lazy val spark = SparkTestSession.spark
  val d = sys.env.getOrElse("GRAFT_PLAN_AUDIT_DIR", "/root/testdata/sf0.001")
  /** True when auditing an alternate corpus that carries only the
    * documents/embeddings tables (the scale-rehearsal layout). */
  val docsOnly = sys.env.contains("GRAFT_PLAN_AUDIT_DIR") &&
    !new java.io.File(s"$d/lineitem.parquet").exists()
  def needsTpch(): Unit = assume(!docsOnly, "TPC-H tables not in this corpus")

  def plan(name: String): String =
    SparkEntry.queries(name)(spark, d).queryExecution.executedPlan.toString

  /** Formatted explain: full (untruncated) ReadSchema + codegen ids. */
  def formatted(name: String): String =
    SparkEntry.queries(name)(spark, d).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q172 itemsets: no cartesian; pair counts partially aggregate") {
    needsTpch()
    val p = plan("q172_itemsets")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(p.contains("partial_count"), "pair counts must map-side combine")
  }

  test("q176 CF: top-K window is keyed by supplier, never global") {
    needsTpch()
    val p = plan("q176_copurchase")
    // every Window operator must carry a non-empty partition spec
    "Window \\[[^\\]]*\\], \\[([^\\]]*)\\]".r.findAllMatchIn(p).foreach { m =>
      assert(m.group(1).nonEmpty, s"unpartitioned window in q176: $p")
    }
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("q187 RFM: threshold scoring needs no window and no extra sort") {
    needsTpch()
    val p = plan("q187_rfm_segments")
    assert(!p.contains("Window"), "quintile thresholds are literals, " +
      "scoring must be a projection: " + p.take(1500))
  }

  test("q193 CUSUM: all windows keyed by event_type (aggregate-row data)") {
    needsTpch()
    val p = plan("q193_cusum")
    "Window \\[[^\\]]*\\], \\[([^\\]]*)\\]".r.findAllMatchIn(p).foreach { m =>
      assert(m.group(1).contains("event_type"),
        s"q193 window not keyed by event_type: ${m.group(1)}")
    }
  }

  test("q192 Benford: the 9-row reference joins as a broadcast") {
    needsTpch()
    assert(plan("q192_benford").contains("BroadcastHashJoin"))
  }

  test("q184 stickiness: the 7-way expand is a Generate, not a join") {
    needsTpch()
    val p = plan("q184_stickiness")
    assert(p.contains("Generate explode"), p.take(1500))
    assert(!p.contains("CartesianProduct"), p.take(1500))
  }

  test("q2 joins the nation dim with a broadcast, not a shuffle join") {
    needsTpch()
    val p = plan("q2_revenue_by_nation")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("q1 scan prunes to exactly the referenced lineitem columns") {
    needsTpch()
    val p = formatted("q1_pricing_summary")
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p).map(_.group(1))
    assert(read.isDefined, p.take(1000))
    val cols = read.get.split(",").map(_.split(":")(0)).toSet
    assert(cols == Set("l_quantity", "l_extendedprice", "l_discount",
      "l_returnflag", "l_linestatus", "l_shipdate"), cols)
  }

  test("q1 pushes the shipdate filter to the parquet scan") {
    needsTpch()
    val p = formatted("q1_pricing_summary")
    assert(p.contains("IsNotNull(l_shipdate)") &&
      p.contains("LessThanOrEqual(l_shipdate"), p.take(2000))
  }

  test("q3 top-k lands in TakeOrderedAndProject (no global sort)") {
    needsTpch()
    val p = plan("q3_top_orders")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("q26/q40 plan through the custom automaton join, not BNLJ") {
    assert(plan("q26_dictionary_join").contains("AutomatonJoin"))
    assert(plan("q40_dictionary_semi_join").contains("AutomatonJoin"))
    assert(!plan("q26_dictionary_join").contains("BroadcastNestedLoopJoin"))
  }

  test("q4 dedup aggregates partially before its one exchange") {
    needsTpch()
    // groupBy+max_by formulation would be ideal; q4 is the window form
    // on purpose (W1) — but the pipeline's Dedup.latestByKey must be
    // partial-agg shaped: exactly one exchange, HashAggregate on both
    // sides of it
    val df = graft.ops.Dedup.latestByKey(
      graft.util.Tables.orders(spark, d), "o_custkey", "o_orderkey")
    val p = df.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    // partial max_by below the exchange (map-side combine; struct
    // payload plans as SortAggregate — the partial/final split is what
    // matters, the shuffle carries one row per key per partition)
    assert(p.contains("partial_max_by"), p)
  }

  test("q44 higher-order functions run native (no UDF/encoder boundary)") {
    // HOFs are native Catalyst expressions (CodegenFallback, not
    // codegen'd — but still no serialization boundary): the whole
    // query is one narrow Project over the pruned two-column scan
    val p = plan("q44_array_hof")
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF") &&
      !p.contains("DeserializeToObject"), p.take(2000))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p.take(2000))
  }

  test("q53 stratified sample broadcasts the fractions dim") {
    val p = plan("q53_stratified_sample")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("q15 KNN exchange carries top-k rows, not all scored candidates") {
    val p = plan("q15_knn_cosine")
    // map-side-combining TopK Aggregator: partial agg before exchange
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"), p.take(2000))
  }

  test("q56 KMV sketch partially aggregates before each exchange") {
    needsTpch()
    // the whole point of the sketch: only O(k) state per partition
    // crosses the wire — a PARTIAL kmvagg runs below every exchange
    val p = formatted("q56_kmv_distinct")
    assert(p.contains("partial_kmvagg"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // each of the 3 sketch branches: partial+final ObjectHashAggregate
    // ("partial_" only prints for Partial-mode aggs — a rewrite that
    // shuffled raw hashes would plan a single Complete agg instead)
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 6, p.take(3000))
    assert("partial_kmvagg".r.findAllIn(p).size >= 3, p.take(3000))
  }

  test("q58 merge is ONE key shuffle (agg-based, not join-based)") {
    needsTpch()
    val p = plan("q58_merge_upsert")
    // one exchange for the keyed max_by agg + one for the final sort
    val exchanges = "Exchange (hash|range)partitioning".r.findAllIn(p).size
    assert(exchanges == 2, s"$exchanges exchanges\n${p.take(3000)}")
    assert(!p.contains("Join"), p.take(2000)) // no join-based merge
  }

  test("q60 blocked edit distance joins on the block key (never a cross product)") {
    needsTpch()
    val p = plan("q60_edit_distance")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p.take(2000))
  }

  test("q78 weighted sample is a TakeOrderedAndProject, not a global sort") {
    val p = plan("q78_weighted_sample")
    assert(p.contains("TakeOrderedAndProject(limit=50"), p.take(2000))
    // per-row priority over a pruned two-column scan
    assert(p.contains("ReadSchema: struct<doc_id:bigint,n_chars:bigint>"), p.take(2000))
  }

  test("q79 per-group top-k partially aggregates before its one exchange") {
    val p = plan("q79_topk_per_group")
    // bounded-buffer aggregator combines map-side: at most k pairs per
    // (group, partition) cross the wire — never the corpus rows
    assert(p.contains("partial_topkpairsagg"), p.take(3000))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p.take(3000))
    assert(!p.contains("Window"), p.take(2000)) // not the window-sort form
  }

  test("q80 keywords: broadcast stopword anti-join, partial tf agg, no cross product") {
    val p = plan("q80_tfidf_keywords")
    // stopword removal = broadcast hashed anti-join (single build side),
    // not an O(|stoplist|)-per-token scan and never a nested loop
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p.take(2000))
    // tf combines map-side before its (doc, term) exchange
    assert(p.contains("partial_count"), p.take(3000))
  }

  test("q81 heavy hitters: bounded MG state crosses the wire, candidates broadcast") {
    val p = plan("q81_heavy_hitters")
    // pass 1: partial Misra-Gries below its exchange — O(k) summaries
    // shuffle, never the vocabulary
    assert(p.contains("partial_mgagg"), p.take(3000))
    // pass 2: candidate filter is a broadcast hash join on term
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    // exact counts combine map-side
    assert(p.contains("partial_count"), p.take(3000))
  }

  test("q82 span metrics: codegen'd span hashing, partial count, no cross product") {
    val p = plan("q82_dup_spans")
    // one md5 per span via built-ins — no UDF/encoder boundary
    assert(!p.contains("ScalaUDF") && !p.contains("DeserializeToObject"), p.take(2000))
    // per-hash counts combine map-side before their exchange
    assert(p.contains("partial_count"), p.take(3000))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("q87 stratified weighted sample: partial agg, no per-source window") {
    val p = plan("q87_stratified_weighted")
    assert(p.contains("partial_topkdoubleagg"), p.take(3000))
    assert(!p.contains("Window"), p.take(2000))
  }

  test("q61 term filter sits below the first aggregate exchange") {
    // only postings matching the query terms are shuffled; the filter
    // must not migrate above the exchange
    val p = plan("q61_inverted_search")
    // the filter on the exploded term column, e.g. "term#12 IN (..."
    val filterIdx = "term#\\d+ IN \\(".r.findFirstMatchIn(p).map(_.start).getOrElse(-1)
    val exchangeIdx = p.indexOf("Exchange hashpartitioning")
    assert(filterIdx >= 0 && exchangeIdx >= 0, p.take(3000))
    assert(filterIdx > exchangeIdx,
      s"term IN-filter should print BELOW (after) its exchange in tree order\n${p.take(3000)}")
  }

  test("q97 novelty: partial aggs on every exchange, no cross product, no UDF") {
    val p = plan("q97_ngram_novelty")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p.take(2000))
    assert(!p.contains("BatchEvalPython") && !"\\bUDF\\b".r.findFirstIn(p).isDefined, p.take(2000))
    // df agg and per-doc agg both partial-aggregate below their exchange
    assert("partial_count".r.findAllIn(p).nonEmpty, p.take(3000))
  }

  test("q98 decontamination: flagged ids broadcast into the anti-join") {
    val p = plan("q98_decontaminate")
    // the corpus side must not shuffle for the removal join
    assert(p.contains("BroadcastHashJoin") && p.toLowerCase.contains("leftanti"),
      p.take(3000))
  }

  test("q107 LM score: partial-agg shuffles only, no cross product, no UDF") {
    val p = plan("q107_lm_score")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p.take(2000))
    assert(!p.contains("BatchEvalPython") && !"\\bUDF\\b".r.findFirstIn(p).isDefined, p.take(2000))
    // per-(doc,gram) counts, gram counts, and prefix counts all
    // partial-aggregate below their exchanges
    assert("partial_count|partial_sum".r.findAllIn(p).size >= 2, p.take(3000))
  }

  test("q108 chunking adds no hash exchange (pure per-row generate)") {
    val p = plan("q108_doc_chunks")
    // the oracle-ordering sort adds a rangepartitioning exchange; the
    // chunking itself must not shuffle
    assert(!p.contains("Exchange hashpartitioning"), p.take(3000))
    assert(p.contains("Generate explode"), p.take(2000))
    assert(!p.contains("BatchEvalPython"), p.take(2000))
  }

  test("q109 PCA projection is a narrow map against literal basis (no hash exchange, no UDF)") {
    val p = plan("q109_pca_projection")
    // the oracle-ordering sort adds a rangepartitioning exchange; the
    // projection itself is literal-basis arithmetic + posexplode only
    assert(!p.contains("Exchange hashpartitioning"), p.take(3000))
    assert(!p.contains("BatchEvalPython") &&
      !"\\bUDF\\b".r.findFirstIn(p).isDefined, p.take(2000))
    assert(p.contains("Generate posexplode"), p.take(2000))
  }

  test("q110 int8 quantization is one projection (no hash exchange, no UDF, no explode)") {
    val p = plan("q110_int8_quantize")
    assert(!p.contains("Exchange hashpartitioning"), p.take(3000))
    assert(!p.contains("BatchEvalPython") &&
      !"\\bUDF\\b".r.findFirstIn(p).isDefined, p.take(2000))
    // per-vector sums run as aggregate() HOFs inside the row — the
    // plan must not explode components into rows
    assert(!p.contains("Generate"), p.take(2000))
  }

  test("q111 BPE-budget chunking: doc-keyed window + partial agg, no UDF, no cross product") {
    val p = plan("q111_bpe_chunks")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p.take(2000))
    assert(!p.contains("BatchEvalPython") &&
      !"\\bUDF\\b".r.findFirstIn(p).isDefined, p.take(2000))
    // the chunk aggregation partial-aggregates below its exchange
    assert("partial_count|partial_sum".r.findFirstIn(p).isDefined, p.take(3000))
  }

  test("q112 Gopher rules: one narrow projection (no hash exchange, no UDF)") {
    val p = plan("q112_gopher_rules")
    // the oracle-ordering sort adds a rangepartitioning exchange; the
    // battery itself is per-row arithmetic over one shared token array
    assert(!p.contains("Exchange hashpartitioning"), p.take(3000))
    assert(!p.contains("BatchEvalPython") &&
      !"\\bUDF\\b".r.findFirstIn(p).isDefined, p.take(2000))
    assert(!p.contains("Generate"), p.take(2000))
  }

  test("q115 CMS: sketch and exact counts partial-aggregate, no cross product, no UDF") {
    val p = plan("q115_cms_frequency")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p.take(2000))
    assert(!p.contains("BatchEvalPython") &&
      !"\\bUDF\\b".r.findFirstIn(p).isDefined, p.take(2000))
    // bucket counts combine map-side: each partition sends at most
    // depth*width partial rows, never the token stream
    assert("partial_count".r.findAllIn(p).nonEmpty, p.take(3000))
  }

  test("q116 canonical dedup: one partial-agg hash exchange on the canonical hash") {
    val p = plan("q116_canonical_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p.take(2000))
    assert(!p.contains("BatchEvalPython") &&
      !"\\bUDF\\b".r.findFirstIn(p).isDefined, p.take(2000))
    // the count-distinct-raw rides the same grouping: partial aggs present
    assert("partial_count|partial_min".r.findAllIn(p).nonEmpty, p.take(3000))
  }

  test("q118 apportionment windows run on aggregate rows only") {
    val p = plan("q118_mixture_apportion")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BatchEvalPython") &&
      !"\\bUDF\\b".r.findFirstIn(p).isDefined, p.take(2000))
    // the per-source mass agg partial-aggregates before its exchange;
    // everything after runs on ~|sources| aggregate rows
    assert("partial_sum".r.findAllIn(p).nonEmpty, p.take(3000))
  }

  test("q95 kmeans final assignment is a narrow map (no exchange, no UDF)") {
    val p = plan("q95_kmeans")
    // orderBy for the oracle adds a rangepartitioning exchange; the
    // assignment itself must add no hashpartitioning exchange
    assert(!p.contains("Exchange hashpartitioning"), p.take(3000))
    assert(!p.contains("BatchEvalPython"), p.take(2000))
  }

  test("q119 repetition chars: keyed windows + partial aggs, no cross product, no UDF") {
    val p = plan("q119_repetition_chars")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), p.take(2000))
    assert(!p.contains("BatchEvalPython") &&
      !"\\bUDF\\b".r.findFirstIn(p).isDefined, p.take(2000))
    // every window is doc-partitioned (no single-partition global sort)
    assert(!p.contains("Window [") ||
      "hashpartitioning\\(doc_id".r.findAllIn(p).nonEmpty, p.take(3000))
    assert("partial_count|partial_sum".r.findAllIn(p).size >= 2, p.take(3000))
  }

  test("q120 DSIR: bucket model broadcasts; the only nested-loop join is the 1-row norm") {
    val p = plan("q120_dsir_weights")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // two 1-row BNLJs by design: nr × nt inside the normalizer, and
    // crossJoin(broadcast(norm)) onto the doc relation — never more
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 2, p.take(3000))
    assert(!p.contains("BatchEvalPython") &&
      !"\\bUDF\\b".r.findFirstIn(p).isDefined, p.take(2000))
    // per-(doc,bucket) counts partial-aggregate before their exchange
    assert("partial_count".r.findAllIn(p).nonEmpty, p.take(3000))
  }

  test("q121 entropy: per-(doc,codepoint) partial aggs, log on aggregated rows, no UDF") {
    val p = plan("q121_char_entropy")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), p.take(2000))
    assert(!p.contains("BatchEvalPython") &&
      !"\\bUDF\\b".r.findFirstIn(p).isDefined, p.take(2000))
    assert("partial_count|partial_sum".r.findAllIn(p).size >= 2, p.take(3000))
  }

  test("q123 PII redaction is one narrow projection (no hash exchange, no UDF)") {
    val p = plan("q123_pii_redact")
    // the oracle-ordering sort adds a rangepartitioning exchange; the
    // scrub itself is per-row regex arithmetic
    assert(!p.contains("Exchange hashpartitioning"), p.take(3000))
    assert(!p.contains("BatchEvalPython") &&
      !"\\bUDF\\b".r.findFirstIn(p).isDefined, p.take(2000))
    assert(!p.contains("Generate"), p.take(2000))
  }

  test("q125 backoff LM: keyed gram joins, the only nested-loop is the 1-row N") {
    val p = plan("q125_backoff_lm")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // crossJoin(broadcast(n1)) is a 1-row BNLJ by design; never more
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p.take(3000))
    assert(!p.contains("BatchEvalPython") &&
      !"\\bUDF\\b".r.findFirstIn(p).isDefined, p.take(2000))
    // ref n-gram relations partial-aggregate before their exchanges
    assert("partial_count".r.findAllIn(p).size >= 2, p.take(3000))
  }

  test("q126 sentence dedup: hash-keyed partial aggs, no cross product, no UDF") {
    val p = plan("q126_sentence_dedup")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), p.take(2000))
    assert(!p.contains("BatchEvalPython") &&
      !"\\bUDF\\b".r.findFirstIn(p).isDefined, p.take(2000))
    assert("partial_count|partial_min".r.findAllIn(p).nonEmpty, p.take(3000))
  }

  test("q127 zipf card: top-k in TakeOrderedAndProject, no cross join but the 1-row totals") {
    val p = plan("q127_zipf_card")
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // tot × s is a 1-row × 1-row BNLJ by design; never more
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p.take(3000))
    assert(!p.contains("BatchEvalPython") &&
      !"\\bUDF\\b".r.findFirstIn(p).isDefined, p.take(2000))
  }

  test("q124 and q128 capstones: no cartesian, no UDF, bounded 1-row BNLJs") {
    for (name <- Seq("q124_curation_funnel2", "q128_epoch_plan")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name: ${p.take(2000)}")
      // only the deliberate 1-row cross joins (DSIR totals/norm)
      assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 3,
        s"$name: ${p.take(3000)}")
      assert(!p.contains("BatchEvalPython") &&
        !"\\bUDF\\b".r.findFirstIn(p).isDefined, s"$name: ${p.take(2000)}")
    }
  }

  test("q129 incremental sentence dedup: hash-keyed join, no cross product, no UDF") {
    val p = plan("q129_sentence_dedup_inc")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), p.take(2000))
    assert(!p.contains("BatchEvalPython") &&
      !"\\bUDF\\b".r.findFirstIn(p).isDefined, p.take(2000))
  }

  test("q130 span corruption: doc-keyed windows, no cross product, no UDF") {
    val p = plan("q130_span_corrupt")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), p.take(2000))
    assert(!p.contains("BatchEvalPython") &&
      !"\\bUDF\\b".r.findFirstIn(p).isDefined, p.take(2000))
    assert("hashpartitioning\\(doc_id".r.findAllIn(p).nonEmpty, p.take(3000))
  }

  test("q131 heaps curve: banded prefix sums, partial aggs, no cross product") {
    val p = plan("q131_heaps_curve")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), p.take(2000))
    assert(!p.contains("BatchEvalPython") &&
      !"\\bUDF\\b".r.findFirstIn(p).isDefined, p.take(2000))
    assert("partial_count|partial_sum".r.findAllIn(p).size >= 2, p.take(3000))
    // row-data cumsum windows partition on the doc-id band
    assert("hashpartitioning\\(__band".r.findAllIn(p).nonEmpty, p.take(3000))
  }

  test("q132 unimax: windows on aggregate rows only (one mass shuffle)") {
    val p = plan("q132_unimax_allocate")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // only the deliberate 1-row broadcast cross joins (source count,
    // fill totals, leftover) onto the ~|sources|-row aggregate relation
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 3, p.take(3000))
    assert(!p.contains("BatchEvalPython") &&
      !"\\bUDF\\b".r.findFirstIn(p).isDefined, p.take(2000))
    assert("partial_sum".r.findAllIn(p).nonEmpty, p.take(3000))
  }

  test("q133 incremental zipf: merged-index card keeps top-k + 1-row totals shape") {
    val p = plan("q133_zipf_card_inc")
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // tot × s stays the single 1-row BNLJ; the index merge adds
    // token-keyed partial aggs, never a broadcast of corpus rows
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p.take(3000))
    assert(!p.contains("BatchEvalPython") &&
      !"\\bUDF\\b".r.findFirstIn(p).isDefined, p.take(2000))
    assert("partial_count|partial_sum".r.findAllIn(p).size >= 2, p.take(3000))
  }

  test("q134 incremental heaps: banded prefix sums survive the index path") {
    val p = plan("q134_heaps_curve_inc")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), p.take(2000))
    assert(!p.contains("BatchEvalPython") &&
      !"\\bUDF\\b".r.findFirstIn(p).isDefined, p.take(2000))
    // the row-data cumsum windows still partition on the doc-id band
    assert("hashpartitioning\\(__band".r.findAllIn(p).nonEmpty, p.take(3000))
    assert("partial_count|partial_sum".r.findAllIn(p).size >= 2, p.take(3000))
  }

  test("q135 pruned LM: prefix-keyed pruning windows, keyed gram joins, 1-row N") {
    val p = plan("q135_backoff_lm_pruned")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // crossJoin(broadcast(n1)) stays the only nested-loop join
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p.take(3000))
    assert(!p.contains("BatchEvalPython") &&
      !"\\bUDF\\b".r.findFirstIn(p).isDefined, p.take(2000))
    // the top-K pruning windows partition by conditioning prefix —
    // vocabulary-keyed, never a single-partition global window
    assert("hashpartitioning\\(__p".r.findAllIn(p).nonEmpty, p.take(3000))
    assert(!"Window \\[[^\\]]*\\], \\[\\]".r.findFirstIn(p).isDefined,
      "global (unpartitioned) window found: " + p.take(3000))
    assert("partial_count".r.findAllIn(p).size >= 2, p.take(3000))
  }

  test("q136 video frame decode: one object-pipeline stage, no shuffle before decode") {
    val p = plan("q136_video_frames")
    // synth + decode are per-row object pipelines (MapElements /
    // MapPartitions) — decoding must not shuffle payload bytes; the
    // only exchange is the final presentation sort
    assert(p.contains("MapPartitions"), p.take(3000))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), p.take(2000))
    assert(!p.contains("BatchEvalPython"), p.take(2000))
    assert("Exchange (?!rangepartitioning)".r.findAllIn(p).isEmpty,
      "non-sort exchange in the decode path: " + p.take(3000))
  }

  test("q137/q138 PCA power: emitted frame is driver-local; moments agg map-side combines") {
    // the emitted (slot, val) frame is the driver-solved eigenvector —
    // no distributed work may hide in it
    val p137 = plan("q137_pca_power")
    assert(p137.contains("LocalTableScan"), p137.take(1000))
    // the distributed half: ONE map-side-combined typed aggregate over
    // the embeddings scan (partial on the scan side, single exchange)
    import org.apache.spark.sql.functions.col
    val spark2 = spark
    import spark2.implicits._
    val mp = graft.util.Tables.embeddings(spark, d)
      .select(col("embedding")).as[Seq[Float]]
      .select(new graft.datapipe.Embeddings.MomentsAgg(64).toColumn.name("m"))
      .queryExecution.executedPlan.toString
    assert("ObjectHashAggregate|SortAggregate".r.findAllIn(mp).size == 2, mp.take(3000))
    assert("Exchange".r.findAllIn(mp).size == 1, mp.take(3000))
    assert(!mp.contains("CartesianProduct"), mp.take(2000))
  }

  test("q139 incremental ANN index: broadcast probe join, no cartesian, keyed rank window") {
    val p = plan("q139_ann_index_inc")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), p.take(2000))
    // the 10-row (query, probed-cell) relation broadcasts against the
    // persisted index — candidate generation is a keyed join, never a
    // scan of unprobed cells
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("BatchEvalPython"), p.take(2000))
    // top-k ranks inside per-query windows (query-keyed partitioning)
    assert("hashpartitioning\\(query_id".r.findAllIn(p).nonEmpty, p.take(3000))
  }

  test("q148 pair events: equi-join on (doc, pos+off), no cartesian, no UDF") {
    val ev = graft.datapipe.Cooccurrence.pairEvents(
      graft.util.Tables.documents(spark, d), window = 4)
    val p = ev.queryExecution.executedPlan.toString
    // the exploded-offset probe keys the join — a per-document
    // quadratic join-then-filter would surface as BNLJ/cartesian here
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), p.take(2000))
    assert(!p.contains("BatchEvalPython"), p.take(2000))
    assert("hashpartitioning\\(doc_id[^)]*pos_b".r.findAllIn(p).nonEmpty ||
      p.contains("BroadcastHashJoin"), p.take(3000))
  }

  test("q146 keyed KMV sketch aggregates partially before its exchange") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val sk = (1 to 100).map(i => (s"g${i % 3}", i.toLong)).toDF("g", "x")
      .select(col("g"), graft.datapipe.Sketches.kmvHash(col("x")).as("h"))
      .as[(String, Long)].groupByKey(_._1)
      .agg(graft.datapipe.Sketches.kmvSketchKeyed(16).name("mins"))
    val p = sk.queryExecution.executedPlan.toString
    // typed Aggregator plans as ObjectHashAggregate with a partial
    // (map-side) phase below the exchange — O(k) state per group
    // crosses the wire, never the raw hashes
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2 ||
      "SortAggregate".r.findAllIn(p).size >= 2, p.take(3000))
    assert(p.contains("partial_"), p.take(3000))
  }

  test("q122 epoch shuffle: banded rank (no global window), offsets broadcast") {
    val p = plan("q122_epoch_shuffle")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), p.take(2000))
    assert(!p.contains("BatchEvalPython") &&
      !"\\bUDF\\b".r.findFirstIn(p).isDefined, p.take(2000))
    // the row-data window partitions by (shard, band) — never a
    // single-partition global rank
    assert("hashpartitioning\\(shard[^)]*__band".r.findAllIn(p).nonEmpty,
      p.take(3000))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("q156 coreness round: keyed join + node-keyed window, no cartesian") {
    // one H-index round built directly (Graph.coreness materializes
    // eagerly, so the query-level plan only shows the last stage)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val adj = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("node", "nb")
    val vals = Seq((1L, 1L), (2L, 2L), (3L, 1L)).toDF("node", "val")
    val round = adj.join(vals.select(col("node").as("nb"), col("val")), "nb")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("node"))
          .orderBy(col("val").desc, col("nb"))).cast("long"))
      .groupBy(col("node"))
      .agg(sum(when(col("val") >= col("rn"), 1L).otherwise(0L)).as("val"))
    val p = round.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), p.take(2000))
    // the H-count window partitions by node — never single-partition
    assert("hashpartitioning\\(node".r.findAllIn(p).nonEmpty, p.take(3000))
    // the window's node partitioning is reused by the aggregation (no
    // extra exchange between window and groupBy)
    val nEx = "Exchange".r.findAllIn(p).size
    assert(nEx <= 3, s"expected <= 3 exchanges, got $nEx\n" + p.take(3000))
  }

  test("q157 ppjoin: keyed joins only — prefix filter never goes cartesian") {
    val p = plan("q157_ppjoin_exact")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), p.take(2000))
    assert(!p.contains("BatchEvalPython"), p.take(2000))
  }

  test("q162 incremental ppjoin: keyed joins only") {
    val p = plan("q162_ppjoin_inc")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), p.take(2000))
  }

  test("q159/q164/q165 drift: one keyed agg over rows; windows on card relations only") {
    for (q <- Seq("q159_psi_drift", "q164_ks_drift", "q165_emb_drift")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoop"), s"$q\n" + p.take(2000))
      assert(!p.contains("BatchEvalPython"), s"$q\n" + p.take(2000))
      // the row-data pass is a partial (map-side) aggregation
      assert(p.contains("partial_"), s"$q\n" + p.take(3000))
    }
  }

  test("q160 unigram encode: dictionary shape — distinct words, no cartesian") {
    val p = plan("q160_unigram_encode")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), p.take(2000))
    // per-doc reassembly groups by the doc key
    assert("hashpartitioning\\(__d".r.findAllIn(p).nonEmpty ||
      "hashpartitioning\\(doc_id".r.findAllIn(p).nonEmpty, p.take(3000))
  }

  // ── round-15 pins: graph half-steps + model-sized driver frames ──

  test("q174 HITS: barrier-materialized result; half-step is equi-join + partial sum") {
    needsTpch()
    val p = plan("q174_hits")
    // the emitted frame reads the checkpoint barriers, never re-plans
    // the 16 half-steps
    assert(p.contains("Scan ExistingRDD") && !p.contains("CartesianProduct"),
      p.take(2000))
    // the half-step itself (the shape every one of the 16 barriers
    // materialized): one equi-join, one map-side-combined sum
    import org.apache.spark.sql.functions._
    val e = GraphSketchQueries.purchaseEdgesForAudit(spark, d)
    val ranks = e.select(col("c").as("node")).distinct()
      .select(col("node"), lit(1L << 20).as("sc"))
    val hp = GraphSketchQueries.hitsHalfStep(e, ranks, "c", "sp")
      .queryExecution.executedPlan.toString
    assert(!hp.contains("CartesianProduct") &&
      !hp.contains("BroadcastNestedLoop"), hp.take(2000))
    assert(hp.contains("partial_sum"), "half-step sum must map-side combine:\n" +
      hp.take(3000))
  }

  test("q175 BFS: barrier-materialized result; expansion round is equi-join + partial min") {
    val p = plan("q175_bfs_dist")
    assert(p.contains("Scan ExistingRDD") && !p.contains("CartesianProduct"),
      p.take(2000))
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val sym = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("u", "v")
    val dist = Seq((1L, 0L)).toDF("node", "dist")
    val bp = GraphSketchQueries.bfsExpand(sym, dist)
      .queryExecution.executedPlan.toString
    assert(!bp.contains("CartesianProduct") &&
      !bp.contains("BroadcastNestedLoop"), bp.take(2000))
    assert(bp.contains("partial_min"), "frontier min must map-side combine:\n" +
      bp.take(3000))
  }

  test("q195/q204: the emitted frame is a model-sized local table (driver loop never re-plans the corpus)") {
    needsTpch()
    for (q <- Seq("q195_markov_stationary", "q204_ab_test")) {
      val p = plan(q)
      // the single corpus pass ran at construction (one keyed agg,
      // collected model-sized); the emitted frame must be local rows
      // + the output sort — no join, no aggregate, no corpus scan
      assert(p.contains("LocalTableScan"), s"$q\n" + p.take(1500))
      assert(!p.contains("HashAggregate") && !p.contains("Join") &&
        !p.contains("FileScan"), s"$q re-plans corpus work:\n" + p.take(2000))
    }
  }

  test("q207/q208: driver-solved frames — no corpus work in the emitted plan") {
    val p207 = plan("q207_pca_basis")
    assert(p207.contains("LocalTableScan") && !p207.contains("FileScan"),
      p207.take(1500))
    val p208 = plan("q208_quantile_summary")
    assert(p208.contains("LocalTableScan") && !p208.contains("FileScan"),
      p208.take(1500))
    // the radix walk never sorts row data: no Window anywhere near it
    assert(!p208.contains("Window"), p208.take(1500))
  }

  test("q209 drift gate: gate rows local, mix rows checkpoint-materialized, no cartesian") {
    val p = plan("q209_drift_gate")
    assert(p.contains("LocalTableScan") && p.contains("Scan ExistingRDD"),
      p.take(2000))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), p.take(2000))
  }
}
