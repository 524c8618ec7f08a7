package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.datapipe.Sessionize
import graft.util.Tables

/** Round-14 extension family: dataset-analytics operators a curation
  * team runs BESIDE the pipeline — market-basket association rules,
  * robust anomaly detection, attribution — all exact-integer /
  * fixed-point so every row is DuckDB-oracle hash-checkable.
  */
object AnalyticsQueries {

  /** ×2²⁰ fixed point, the house convention for unit-interval stats. */
  private val Fp = 1L << 20

  // ───────────────────────────────────────────────────────── q172 ──

  /** Frequent-itemset mining / association rules (q172): every part
    * PAIR co-ordered in ≥ `minSup` orders, with exact support,
    * per-item supports, directed confidences and lift — the Apriori
    * k=2 pass (Agrawal & Srikant, VLDB'94) that seeds basket
    * analysis.
    *
    * Shape at scale: baskets (distinct (order, part)) shuffle once on
    * the order key; the self-join is co-partitioned on that key so
    * pair expansion is local and bounded by C(basket,2) (TPC-H
    * baskets ≤ ~13 — no quadratic blowup; a power-law catalog would
    * cap basket size upstream). Pair counts shuffle on the 16-byte
    * pair key with map-side partial aggregation; `minSup` prunes
    * before the two broadcast-sized item-support joins. Nothing ever
    * materializes the unfiltered cross product of items.
    *
    * Exactness: confidence is `sup_ab·2²⁰ div sup_x` (truncating);
    * lift is `conf_a_fp·N div sup_b` — the same truncating two-step
    * the oracle replays, with the `N < 2⁴²` headroom bound ENFORCED
    * (conf_fp ≤ 2²⁰ so conf_fp·N < 2⁶² — the MomentsAgg discipline:
    * scaladoc'd bounds are raised, not assumed). */
  def itemsetRules(s: SparkSession, d: String, minSup: Long = 2L): DataFrame = {
    val b = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
      .localCheckpoint(true)
    val nOrders = b.select(col("o")).distinct().count()
    require(nOrders < (1L << 42),
      s"itemsetRules lift headroom: nOrders=$nOrders >= 2^42 would " +
        "overflow conf_fp*N - shard the basket relation")
    val itemSup = b.groupBy(col("p")).agg(count(lit(1)).as("sup"))
    val pairs = b.as("a")
      .join(b.as("c"),
        col("a.o") === col("c.o") && col("a.p") < col("c.p"))
      .groupBy(col("a.p").as("item_a"), col("c.p").as("item_b"))
      .agg(count(lit(1)).as("sup_ab"))
      .filter(col("sup_ab") >= minSup)
    pairs
      .join(itemSup.select(col("p").as("item_a"), col("sup").as("sup_a")),
        Seq("item_a"))
      .join(itemSup.select(col("p").as("item_b"), col("sup").as("sup_b")),
        Seq("item_b"))
      .select(col("item_a"), col("item_b"), col("sup_ab"),
        col("sup_a"), col("sup_b"),
        expr(s"(sup_ab * $Fp) div sup_a").as("conf_a_fp"),
        expr(s"(sup_ab * $Fp) div sup_b").as("conf_b_fp"),
        expr(s"((sup_ab * $Fp) div sup_a) * ${nOrders}L div sup_b")
          .as("lift_fp"))
      .orderBy(col("item_a"), col("item_b"))
  }

  def itemsetRulesOracle: String =
    s"""WITH b AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
       |), n AS (
       |  SELECT CAST(count(DISTINCT o) AS BIGINT) AS n FROM b
       |), isup AS MATERIALIZED (
       |  SELECT p, CAST(count(*) AS BIGINT) AS sup FROM b GROUP BY 1
       |), pairs AS (
       |  SELECT a.p AS item_a, c.p AS item_b,
       |    CAST(count(*) AS BIGINT) AS sup_ab
       |  FROM b a JOIN b c ON a.o = c.o AND a.p < c.p
       |  GROUP BY 1, 2 HAVING count(*) >= 2
       |)
       |SELECT item_a, item_b, sup_ab, sa.sup AS sup_a, sb.sup AS sup_b,
       |  (sup_ab * $Fp) // sa.sup AS conf_a_fp,
       |  (sup_ab * $Fp) // sb.sup AS conf_b_fp,
       |  ((sup_ab * $Fp) // sa.sup) * n.n // sb.sup AS lift_fp
       |FROM pairs
       |JOIN isup sa ON sa.p = item_a
       |JOIN isup sb ON sb.p = item_b
       |CROSS JOIN n
       |ORDER BY item_a, item_b""".stripMargin

  // ───────────────────────────────────────────────────────── q173 ──

  /** Robust anomaly detection (q173): per-event-type hourly volumes
    * scored by MAD deviation — the median-based outlier rule
    * (Hampel) that, unlike z-scores, a single spike cannot mask by
    * inflating its own baseline. Emits EVERY (type, hour) with the
    * exact per-type median, MAD, deviation score ×2²⁰ and the
    * anomaly flag at `threshold` MADs.
    *
    * Exactness: medians are the house LOWER-median convention
    * (rank (n+1)/2 under the (value, hour) total order — q169's
    * no-interpolation pick, so every value that appears is a value
    * some hour actually had). `score_fp = dev·2²⁰ div max(MAD,1)`:
    * total (a constant series has MAD 0; the max(·,1) floor keeps
    * the score defined and the oracle replays the same floor).
    *
    * Shape at scale: one map-side-combined count over raw events;
    * everything after runs on the (type × hour) aggregate relation —
    * windows are keyed by event_type, never unpartitioned. */
  def madAnomaly(s: SparkSession, d: String, threshold: Long = 4L): DataFrame = {
    val hourly = Tables.events(s, d)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
    val byType = Window.partitionBy(col("event_type"))
    def lowerMedian(df: DataFrame, v: String, out: String): DataFrame = {
      val w = byType.orderBy(col(v), col("hour"))
      df.withColumn("__rn", row_number().over(w))
        .withColumn("__cnt", count(lit(1)).over(byType))
        .withColumn(out,
          max(when(expr("__rn = (__cnt + 1) div 2"), col(v)))
            .over(byType))
        .drop("__rn", "__cnt")
    }
    val withMed = lowerMedian(hourly, "n", "med")
      .withColumn("dev", abs(col("n") - col("med")))
    val withMad = lowerMedian(withMed, "dev", "mad")
    withMad
      .withColumn("score_fp",
        expr(s"(dev * $Fp) div greatest(mad, 1L)"))
      .withColumn("is_anomaly", col("score_fp") >= threshold * Fp)
      .select(col("event_type"), col("hour"), col("n"), col("med"),
        col("mad"), col("score_fp"), col("is_anomaly"))
      .orderBy(col("event_type"), col("hour"))
  }

  def madAnomalyOracle(threshold: Long = 4L): String =
    s"""WITH hourly AS MATERIALIZED (
       |  SELECT event_type, date_trunc('hour', ts) AS hour,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM events GROUP BY 1, 2
       |), med AS MATERIALIZED (
       |  SELECT *, max(CASE WHEN rn = (cnt + 1) // 2 THEN n END)
       |      OVER (PARTITION BY event_type) AS med
       |  FROM (
       |    SELECT *,
       |      row_number() OVER (PARTITION BY event_type ORDER BY n, hour) AS rn,
       |      count(*) OVER (PARTITION BY event_type) AS cnt
       |    FROM hourly
       |  )
       |), dev AS MATERIALIZED (
       |  SELECT event_type, hour, n, med, abs(n - med) AS dev FROM med
       |), mad AS (
       |  SELECT *, max(CASE WHEN rn2 = (cnt2 + 1) // 2 THEN dev END)
       |      OVER (PARTITION BY event_type) AS mad
       |  FROM (
       |    SELECT *,
       |      row_number() OVER (PARTITION BY event_type ORDER BY dev, hour) AS rn2,
       |      count(*) OVER (PARTITION BY event_type) AS cnt2
       |    FROM dev
       |  )
       |)
       |SELECT event_type, hour, n, med, mad,
       |  (dev * $Fp) // greatest(mad, 1) AS score_fp,
       |  (dev * $Fp) // greatest(mad, 1) >= ${threshold * Fp} AS is_anomaly
       |FROM mad ORDER BY event_type, hour""".stripMargin

  // ───────────────────────────────────────────────────────── q177 ──

  /** Pareto frontier / skyline (q177, Börzsönyi et al. ICDE'01) over
    * documents on (length, lexical diversity): the docs NOT strictly
    * dominated on (n_tokens, distinct-token ratio ×2²⁰) — the
    * curation shortlist "longest documents at every diversity level",
    * where a max() per axis or a weighted score would each hide the
    * trade-off curve. Dominance is strict: a beats b iff ≥ on both
    * dims and > on one; ties on both dims co-survive.
    *
    * Shape at scale: the 2-D skyline needs NO pairwise pass — group
    * by d1 → max d2 (map-side combined), then a running max over the
    * DISTINCT-d1 relation (the only window, aggregate-row-sized —
    * bounded by distinct document lengths), then one join back.
    * A doc survives iff d2 equals its length-group max AND strictly
    * exceeds every longer group's max. The naive NOT EXISTS self-join
    * is O(n²); this is two shuffles of doc-sized data.
    *
    * Tokens are the q33 convention (split on single space, drop
    * empties — identical semantics both engines); all-whitespace docs
    * have no defined diversity and are excluded by both. */
  def paretoFrontier(s: SparkSession, d: String): DataFrame = {
    val g = Tables.documents(s, d)
      .select(col("doc_id"),
        expr("filter(split(text, ' '), x -> length(x) > 0)").as("arr"))
      .select(col("doc_id"), size(col("arr")).cast("long").as("d1"),
        size(array_distinct(col("arr"))).cast("long").as("nd"))
      .filter(col("d1") > 0)
      .withColumn("d2", expr(s"(nd * $Fp) div d1"))
    val m = g.groupBy(col("d1")).agg(max(col("d2")).as("m2"))
    val w = Window.orderBy(col("d1").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val mw = m.withColumn("prevmax", max(col("m2")).over(w))
    g.join(mw, Seq("d1"))
      .filter(col("d2") === col("m2") &&
        (col("prevmax").isNull || col("prevmax") < col("d2")))
      .select(col("doc_id"), col("d1").as("n_tokens"), col("nd").as("n_distinct"),
        col("d2").as("distinct_fp"))
      .orderBy(col("doc_id"))
  }

  def paretoFrontierOracle: String =
    s"""WITH g AS MATERIALIZED (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS d1,
       |    CAST(count(DISTINCT tok) AS BIGINT) AS nd,
       |    (CAST(count(DISTINCT tok) AS BIGINT) * $Fp)
       |      // CAST(count(*) AS BIGINT) AS d2
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
       |        FROM documents)
       |  WHERE length(tok) > 0 GROUP BY doc_id
       |), m AS MATERIALIZED (
       |  SELECT d1, max(d2) AS m2,
       |    max(max(d2)) OVER (ORDER BY d1 DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax
       |  FROM g GROUP BY d1
       |)
       |SELECT doc_id, g.d1 AS n_tokens, nd AS n_distinct, d2 AS distinct_fp
       |FROM g JOIN m ON m.d1 = g.d1
       |WHERE d2 = m2 AND (prevmax IS NULL OR prevmax < d2)
       |ORDER BY doc_id""".stripMargin

  // ───────────────────────────────────────────────────────── q178 ──

  /** Exponential time-decayed engagement (q178): per-user activity
    * score Σ 2^(−age_weeks), the recency weighting feeds ranking /
    * churn features — entirely in integers: the decay factor is a
    * RIGHT SHIFT of the ×2²⁰ unit weight by whole weeks of age
    * (microsecond-exact age arithmetic, the q169 convention; shift
    * capped at 40 where the weight is long since zero — both engines
    * agree on every capped value, avoiding the JVM's shift-count
    * wraparound at ≥ 64).
    *
    * Shape at scale: one broadcast of the 1-row max-ts relation, then
    * a single map-side-combined groupBy(user). Nothing else. */
  def decayedEngagement(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("user_id"), col("ts"))
    val mx = ev.agg(max(col("ts")).as("mx"))
    ev.crossJoin(broadcast(mx))
      .select(col("user_id"),
        expr(s"shiftright(${Fp}L, cast(least(" +
          s"timestampdiff(MICROSECOND, ts, mx) div ${7L * 86400000000L}L," +
          s" 40L) as int))").as("dec"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("dec")).as("decayed_fp"))
      .orderBy(col("user_id"))
  }

  def decayedEngagementOracle: String =
    s"""WITH mx AS (SELECT max(ts) AS mx FROM events)
       |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       |  CAST(SUM(CAST($Fp AS BIGINT) >> LEAST(
       |    date_diff('microsecond', ts, mx.mx) // ${7L * 86400000000L},
       |    40)) AS BIGINT) AS decayed_fp
       |FROM events, mx GROUP BY user_id ORDER BY user_id""".stripMargin

  // ───────────────────────────────────────────────────────── q179 ──

  /** Linear multi-touch attribution (q179): every purchase's unit of
    * credit (×2²⁰) split EXACTLY across the user's view/click touches
    * in the preceding 7 days — equal integer shares, with the
    * division remainder assigned to the EARLIEST touch (the q118
    * largest-remainder discipline: credit per purchase sums to
    * exactly 2²⁰, so total credit ≡ n_purchases·2²⁰ — an invariant
    * the spec asserts, and float attribution can never hold).
    * Touchless purchases credit the 'direct' channel in full.
    *
    * Shape at scale: one user-keyed join (events per user are
    * session-bounded), then purchase-keyed windows for the share
    * count/rank — the q45/q170 partitioning reused. Channel rollup is
    * a 3-row aggregate. */
  def attribution(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    attributionCore(purchasesOf(ev), touchesOf(ev))
      .orderBy(col("channel"))
  }

  /** The purchase / touch projections of an events relation — shared
    * by the batch face and [[graft.streaming.StreamingPipeline]]'s
    * incremental attribution (so both faces split on the SAME
    * predicates by construction). */
  private[graft] def purchasesOf(ev: DataFrame): DataFrame =
    ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"),
        col("ts").as("p_ts"))

  private[graft] def touchesOf(ev: DataFrame): DataFrame =
    ev.filter(col("event_type").isin("view", "click"))
      .select(col("user_id").as("t_user"), col("event_id").as("t_id"),
        col("event_type").as("channel"), col("ts").as("t_ts"))

  /** q179's lookback window. */
  private[graft] val AttributionLookbackUs = 7L * 86400000000L

  /** The attribution chain on explicit purchase/touch relations —
    * UNordered per-channel rollup (callers order or re-aggregate).
    * Because each purchase's window count/rank/credit depend only on
    * ITS OWN touch set, running this per purchase-batch against the
    * full touch history and summing the per-channel partials is
    * bit-identical to the one-shot run — the property the streaming
    * face's spec pins. */
  private[graft] def attributionCore(p: DataFrame, t: DataFrame): DataFrame = {
    val j = p.join(t,
      col("user_id") === col("t_user") && col("t_ts") < col("p_ts") &&
        expr(s"timestampdiff(MICROSECOND, t_ts, p_ts) <= ${AttributionLookbackUs}L"),
      "left")
    val byP = Window.partitionBy(col("p_id"))
    val w = j
      .withColumn("cnt", count(col("t_id")).over(byP))
      .withColumn("rn",
        row_number().over(byP.orderBy(col("t_ts"), col("t_id"))))
    val c = w.select(
      coalesce(col("channel"), lit("direct")).as("channel"),
      col("t_id"), col("p_id"),
      when(col("t_id").isNull, lit(Fp))
        .otherwise(expr(s"$Fp div cnt") +
          when(col("rn") === 1, expr(s"$Fp % cnt")).otherwise(lit(0L)))
        .as("credit"))
    c.groupBy(col("channel"))
      .agg(count(col("t_id")).as("n_touches"),
        countDistinct(col("p_id")).as("n_purchases"),
        sum(col("credit")).as("credit_fp"))
  }

  def attributionOracle: String =
    s"""WITH p AS (
       |  SELECT event_id AS p_id, user_id, ts AS p_ts FROM events
       |  WHERE event_type = 'purchase'
       |), t AS (
       |  SELECT event_id AS t_id, user_id, event_type AS channel,
       |    ts AS t_ts
       |  FROM events WHERE event_type IN ('view', 'click')
       |), j AS MATERIALIZED (
       |  SELECT p.p_id, t.t_id, t.channel, t.t_ts FROM p
       |  LEFT JOIN t ON t.user_id = p.user_id AND t.t_ts < p.p_ts
       |    AND date_diff('microsecond', t.t_ts, p.p_ts) <= ${7L * 86400000000L}
       |), w AS (
       |  SELECT *, CAST(count(t_id) OVER (PARTITION BY p_id) AS BIGINT) AS cnt,
       |    row_number() OVER (PARTITION BY p_id ORDER BY t_ts, t_id) AS rn
       |  FROM j
       |), c AS (
       |  SELECT COALESCE(channel, 'direct') AS channel, t_id, p_id,
       |    CASE WHEN t_id IS NULL THEN CAST($Fp AS BIGINT)
       |         ELSE $Fp // cnt +
       |           CASE WHEN rn = 1 THEN $Fp % cnt ELSE 0 END
       |    END AS credit
       |  FROM w
       |)
       |SELECT channel, CAST(count(t_id) AS BIGINT) AS n_touches,
       |  CAST(count(DISTINCT p_id) AS BIGINT) AS n_purchases,
       |  CAST(SUM(credit) AS BIGINT) AS credit_fp
       |FROM c GROUP BY channel ORDER BY channel""".stripMargin

  // ───────────────────────────────────────────────────────── q180 ──

  /** Label-centroid similarity matrix (q180): pairwise signed cos²
    * (×2²⁰) between per-label embedding centroids — the cluster-level
    * semantic map ("which labels encode the same thing?") that guides
    * stratified sampling and merge decisions, where q165 only detects
    * that a distribution MOVED.
    *
    * Exactness: components quantize by the house floor(x·2²⁰+0.5)
    * convention; the centroid is the truncating per-component integer
    * mean (sum div n — both engines truncate toward zero); dot and
    * norms are exact BIGINTs; cos² (sign carried separately, since
    * squaring drops it) is computed in arbitrary precision — BigInt
    * on the driver, HUGEINT in the oracle — because dot² reaches
    * ~2⁸⁸. Diagonal rows are exactly 2²⁰ (a spec invariant).
    *
    * Shape at scale: ONE map-side-combined groupBy(label, pos) over
    * the exploded vectors is the only pass that touches all data; the
    * collect is the labels×dim sum matrix (model-sized, the q137
    * discipline), and the L² pair work runs on L centroids on the
    * driver. */
  def labelCentroidMatrix(s: SparkSession, d: String): DataFrame = {
    val qf = graft.datapipe.Embeddings.Fp
    val emb = Tables.embeddings(s, d)
    val sums = emb
      .select(col("label").cast("long").as("label"),
        posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("label"), col("pos"),
        expr(s"CAST(floor(CAST(x AS DOUBLE) * $qf + 0.5) AS BIGINT)").as("xq"))
      .groupBy(col("label"), col("pos")).agg(sum(col("xq")).as("sx"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val ns = emb.groupBy(col("label").cast("long").as("label"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val labels = ns.keys.toSeq.sorted
    val dim = sums.keys.map(_._2).max + 1
    val mean: Map[Long, Array[Long]] = labels.map { l =>
      l -> Array.tabulate(dim)(p => sums.getOrElse((l, p), 0L) / ns(l))
    }.toMap
    val rows = for {
      la <- labels; lb <- labels if la <= lb
    } yield {
      val (ma, mb) = (mean(la), mean(lb))
      val dot = (0 until dim).map(p => BigInt(ma(p)) * mb(p)).sum
      val n2a = (0 until dim).map(p => BigInt(ma(p)) * ma(p)).sum
      val n2b = (0 until dim).map(p => BigInt(mb(p)) * mb(p)).sum
      val cos2s =
        if (n2a == 0 || n2b == 0) BigInt(0)
        else dot.sign * ((dot * dot * Fp) / (n2a * n2b))
      (la, lb, dot.toLong, n2a.toLong, n2b.toLong, cos2s.toLong)
    }
    s.createDataFrame(rows)
      .toDF("label_a", "label_b", "dot", "n2_a", "n2_b", "cos2s_fp")
      .orderBy(col("label_a"), col("label_b"))
  }

  // ───────────────────────────────────────────────────────── q181 ──

  /** Data-quality audit card (q181): the referential-integrity /
    * validity checks a 100 TB ingestion runs BEFORE anything else
    * trusts the tables — orphaned facts, childless parents, duplicate
    * line keys, domain violations — each as an exact count with a
    * ×2²⁰ bad-rate. One row per check, so the card is diffable
    * across ingest runs and a single threshold gate can fail the
    * pipeline.
    *
    * Shape at scale: each FK check is one key-projected anti-join
    * (null-safe left join on the already-compact key columns);
    * duplicate detection is a map-side-combined count; domain checks
    * are pure scans. Nothing touches non-key columns it doesn't
    * need. */
  def dqCard(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val ord = Tables.orders(s, d)
    val nLi = li.count()
    val nOrd = ord.count()
    def row(name: String, bad: Long, total: Long) =
      (name, bad, total, if (total > 0) bad * Fp / total else 0L)
    val orphans = li.select(col("l_orderkey"))
      .join(ord.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti").count()
    val childless = ord.select(col("o_orderkey"))
      .join(li.select(col("l_orderkey")).distinct(),
        col("o_orderkey") === col("l_orderkey"), "left_anti").count()
    val dupLines = nLi - li.select(col("l_orderkey"), col("l_linenumber"))
      .distinct().count()
    val qtyBad = li.filter(col("l_quantity").isNull ||
      col("l_quantity") <= 0).count()
    val dateBad = li.filter(col("l_shipdate").isNull).count()
    val rows = Seq(
      row("lineitem_orphans", orphans, nLi),
      row("lineitem_dup_linekey", dupLines, nLi),
      row("lineitem_qty_nonpos", qtyBad, nLi),
      row("lineitem_null_shipdate", dateBad, nLi),
      row("orders_childless", childless, nOrd))
    s.createDataFrame(rows).toDF("check", "n_bad", "n_total", "bad_fp")
      .orderBy(col("check"))
  }

  def dqCardOracle: String =
    s"""WITH tot AS (
       |  SELECT (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS nli,
       |         (SELECT CAST(count(*) AS BIGINT) FROM orders) AS nord
       |), checks AS (
       |  SELECT 'lineitem_orphans' AS "check",
       |    (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
       |     LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
       |     WHERE o.o_orderkey IS NULL) AS n_bad, nli AS n_total FROM tot
       |  UNION ALL
       |  SELECT 'lineitem_dup_linekey',
       |    nli - (SELECT CAST(count(*) AS BIGINT) FROM
       |      (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem)),
       |    nli FROM tot
       |  UNION ALL
       |  SELECT 'lineitem_qty_nonpos',
       |    (SELECT CAST(count(*) AS BIGINT) FROM lineitem
       |     WHERE l_quantity IS NULL OR l_quantity <= 0), nli FROM tot
       |  UNION ALL
       |  SELECT 'lineitem_null_shipdate',
       |    (SELECT CAST(count(*) AS BIGINT) FROM lineitem
       |     WHERE l_shipdate IS NULL), nli FROM tot
       |  UNION ALL
       |  SELECT 'orders_childless',
       |    (SELECT CAST(count(*) AS BIGINT) FROM orders o
       |     LEFT JOIN (SELECT DISTINCT l_orderkey FROM lineitem) l
       |       ON l.l_orderkey = o.o_orderkey
       |     WHERE l.l_orderkey IS NULL), nord FROM tot
       |)
       |SELECT "check", n_bad, n_total,
       |  CASE WHEN n_total > 0 THEN (n_bad * $Fp) // n_total ELSE 0 END AS bad_fp
       |FROM checks ORDER BY "check"""".stripMargin

  // ───────────────────────────────────────────────────────── q182 ──

  /** Per-type traffic trend (q182): the exact least-squares slope of
    * hourly event counts over the hour index — the "is this feed
    * growing or dying?" signal next to q173's spike detector. All
    * sums are exact integers over the (type × hour) aggregate
    * relation; the slope is the exact rational
    * (n·Σxy − Σx·Σy)·2²⁰ div (n·Σx² − (Σx)²), with x the hour index
    * from the GLOBAL min hour (microsecond-exact, the q169
    * convention). A type with a single active hour has zero variance
    * and reports slope 0 (both engines take the same guarded
    * branch).
    *
    * Headroom: x < 2¹⁸ hours (30 years) and counts < 2²⁴ per hour
    * keep n·Σxy under 2⁶² at a month of 2²⁰-events/hour scale; the
    * oracle computes the same BIGINTs and DuckDB would raise on
    * overflow rather than wrap (its sums are HUGEINT then cast). */
  def typeTrend(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val mn = ev.agg(date_trunc("hour", min(col("ts"))).as("mn"))
    val hourly = ev.crossJoin(broadcast(mn))
      .select(col("event_type"),
        expr("timestampdiff(MICROSECOND, mn, date_trunc('hour', ts))" +
          " div 3600000000").as("x"))
      .groupBy(col("event_type"), col("x")).agg(count(lit(1)).as("y"))
    hourly.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .withColumn("slope_fp",
        expr(s"CASE WHEN n * sxx - sx * sx = 0 THEN 0L ELSE " +
          s"((n * sxy - sx * sy) * $Fp) div (n * sxx - sx * sx) END"))
      .select(col("event_type"), col("n"), col("sy").as("total"),
        col("slope_fp"))
      .orderBy(col("event_type"))
  }

  def typeTrendOracle: String =
    s"""WITH mn AS (
       |  SELECT date_trunc('hour', min(ts)) AS mn FROM events
       |), hourly AS MATERIALIZED (
       |  SELECT event_type,
       |    date_diff('microsecond', mn.mn, date_trunc('hour', ts))
       |      // 3600000000 AS x,
       |    CAST(count(*) AS BIGINT) AS y
       |  FROM events, mn GROUP BY 1, 2
       |), agg AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
       |    CAST(SUM(x * y) AS BIGINT) AS sxy,
       |    CAST(SUM(x * x) AS BIGINT) AS sxx
       |  FROM hourly GROUP BY 1
       |)
       |SELECT event_type, n, sy AS total,
       |  CASE WHEN n * sxx - sx * sx = 0 THEN CAST(0 AS BIGINT)
       |    ELSE ((n * sxy - sx * sy) * $Fp) // (n * sxx - sx * sx)
       |  END AS slope_fp
       |FROM agg ORDER BY event_type""".stripMargin

  // ───────────────────────────────────────────────────────── q183 ──

  /** Per-source exact token-length quartiles (q183): p25/p50/p75 of
    * the q33-convention token count, per document source — the
    * group-wise companion to q85's global radix-walk quantiles. The
    * order statistic is the ceil-rank convention: k = ⌈q·n⌉, value =
    * the smallest length whose cumulative count reaches k (exact, no
    * interpolation — every reported value is a length some document
    * has).
    *
    * Shape at scale: one map-side-combined count to the (source ×
    * distinct length) relation; the cumulative windows and rank
    * picks run ONLY on that aggregate relation (bounded by distinct
    * doc lengths — the q164 discipline), never on row data. */
  def sourceQuartiles(s: SparkSession, d: String): DataFrame = {
    val lens = Tables.documents(s, d)
      .select(col("source"),
        expr("size(filter(split(text, ' '), x -> length(x) > 0))")
          .cast("long").as("len"))
      .groupBy(col("source"), col("len")).agg(count(lit(1)).as("c"))
    val bySrc = Window.partitionBy(col("source"))
    val cum = lens
      .withColumn("cum", sum(col("c")).over(bySrc.orderBy(col("len"))))
      .withColumn("n", sum(col("c")).over(bySrc))
    val qs = Seq("p25" -> 1L, "p50" -> 2L, "p75" -> 3L)
    qs.map { case (qn, num) =>
      cum.withColumn("k", expr(s"(n * $num + 3) div 4"))
        .filter(col("cum") >= col("k"))
        .withColumn("rn",
          row_number().over(bySrc.orderBy(col("len"))))
        .filter(col("rn") === 1)
        .select(col("source"), lit(qn).as("q"), col("k"), col("len"))
    }.reduce(_ unionByName _)
      .orderBy(col("source"), col("q"))
  }

  def sourceQuartilesOracle: String =
    s"""WITH lens AS MATERIALIZED (
       |  SELECT source, len, CAST(count(*) AS BIGINT) AS c FROM (
       |    SELECT doc_id, any_value(source) AS source,
       |      CAST(count(*) FILTER (length(tok) > 0) AS BIGINT) AS len
       |    FROM (SELECT doc_id, source,
       |            unnest(string_split(text, ' ')) AS tok FROM documents)
       |    GROUP BY doc_id
       |  ) GROUP BY 1, 2
       |), cum AS MATERIALIZED (
       |  SELECT source, len, c,
       |    SUM(c) OVER (PARTITION BY source ORDER BY len
       |      ROWS UNBOUNDED PRECEDING) AS cum,
       |    SUM(c) OVER (PARTITION BY source) AS n
       |  FROM lens
       |), pick AS (
       |  SELECT source, q, (n * num + 3) // 4 AS k, len,
       |    row_number() OVER (PARTITION BY source, q ORDER BY len) AS rn
       |  FROM cum
       |  CROSS JOIN (VALUES ('p25', 1), ('p50', 2), ('p75', 3)) AS qq(q, num)
       |  WHERE cum >= (n * num + 3) // 4
       |)
       |SELECT source, q, CAST(k AS BIGINT) AS k, len
       |FROM pick WHERE rn = 1 ORDER BY source, q""".stripMargin

  // ───────────────────────────────────────────────────────── q184 ──

  /** Engagement stickiness (q184): per UTC day, exact distinct active
    * users (DAU), exact trailing-7-day distinct users (WAU), and the
    * DAU/WAU ratio ×2²⁰ — the classic product-health curve, computed
    * EXACTLY (a HLL-based WAU can't be hash-gated; the sketch path
    * for when exactness is waived is q144).
    *
    * Shape at scale: the row data collapses to the distinct
    * (user, day) relation first (one map-side-combined distinct);
    * each (user, day) then contributes to ≤ 7 trailing windows via a
    * bounded 7-way explode — work ∝ 7·|user-days|, never a
    * self-join of row data. Day arithmetic is integer epoch-days
    * (microsecond-exact), immune to engine date-diff conventions. */
  def stickiness(s: SparkSession, d: String): DataFrame =
    stickinessCore(userDaysOf(Tables.events(s, d))).orderBy(col("day"))

  /** The distinct (user, epoch-day) projection — shared with the
    * streaming face so both compute day identity identically. */
  private[graft] def userDaysOf(ev: DataFrame): DataFrame =
    ev.select(col("user_id"),
        expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00'," +
          " ts) div 86400000000").as("day"))
      .distinct()

  /** q184's DAU/WAU math on an explicit distinct (user_id, day)
    * relation — the streaming snapshot runs THIS on its committed
    * store, so batch ≡ streaming is by construction. */
  private[graft] def stickinessCore(userDays: DataFrame): DataFrame = {
    val dau = userDays.groupBy(col("day"))
      .agg(count(lit(1)).as("dau"))
    val wau = userDays
      .select(col("user_id"), explode(expr("sequence(day, day + 6L)")).as("day"))
      .distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("wau"))
    dau.join(wau, Seq("day"))
      .select(col("day"), col("dau"), col("wau"),
        expr(s"(dau * $Fp) div wau").as("stick_fp"))
  }

  def stickinessOracle: String =
    s"""WITH ud AS MATERIALIZED (
       |  SELECT DISTINCT user_id,
       |    date_diff('microsecond', TIMESTAMP '1970-01-01 00:00:00', ts)
       |      // 86400000000 AS day
       |  FROM events
       |), dau AS (
       |  SELECT day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY 1
       |), wau AS (
       |  SELECT day, CAST(count(*) AS BIGINT) AS wau FROM (
       |    SELECT DISTINCT user_id, day + off AS day
       |    FROM ud CROSS JOIN (SELECT unnest(range(0, 7)) AS off)
       |  ) GROUP BY 1
       |)
       |SELECT dau.day AS day, dau, wau, (dau * $Fp) // wau AS stick_fp
       |FROM dau JOIN wau ON wau.day = dau.day
       |ORDER BY dau.day""".stripMargin

  // ───────────────────────────────────────────────────────── q185 ──

  /** Per-source Gini coefficient (q185) of document token mass — the
    * inequality card for corpus balance: Gini ≈ 0 means a source's
    * token budget is spread evenly over its documents; → 1 means a
    * few giant documents carry the source (and a doc-level sampler
    * badly misrepresents a token-level mixture like q118's). Exact
    * integer form over ascending-sorted per-doc counts x₍ᵢ₎:
    *
    *   gini_fp = (Σᵢ (2i − n − 1)·x₍ᵢ₎) · 2²⁰ div (n · Σx)
    *
    * with the (len, doc_id) total tie order. Headroom is ENFORCED on
    * the PRODUCT: |Σ(2i−1)x − n·Σx| ≤ n·Σx, so the ×2²⁰ numerator
    * needs n·Σx < 2⁴³ per source (two independent n/Σx bounds admit
    * products up to 2⁶⁰ — 2⁸⁰ after the multiply — and would wrap
    * silently with ANSI off while the oracle stays exact). Beyond the
    * bound, shard sources into sub-sources and merge the Σ(2i−n−1)x
    * partials — the formula is offset-composable once global ranks
    * are assigned.
    *
    * Shape at scale: per-doc counts are one map-side-combined pass;
    * the rank window is keyed by source (the q79 discipline); the
    * final card is one row per source. */
  def sourceGini(s: SparkSession, d: String): DataFrame = {
    val lens = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        expr("size(filter(split(text, ' '), x -> length(x) > 0))")
          .cast("long").as("len"))
    val bySrc = Window.partitionBy(col("source"))
    val ranked = lens.withColumn("i",
      row_number().over(bySrc.orderBy(col("len"), col("doc_id"))).cast("long"))
    val agg = ranked.groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("len")).as("total"),
        sum(expr("(2 * i - 1) * len")).as("wsum"))
    // Two-step guard: the n/total bounds make n*total itself wrap-free
    // (2^20 * 2^43 = 2^63 exclusive), THEN the product bound protects
    // the *2^20 numerator.
    val guard = agg.agg(max(col("n")).as("mn"), max(col("total")).as("mt"),
      max(col("n") * col("total")).as("mp")).head()
    val (mn, mt) = (if (guard.isNullAt(0)) 0L else guard.getLong(0),
      if (guard.isNullAt(1)) 0L else guard.getLong(1))
    require(mn < (1L << 20) && mt < (1L << 43),
      s"sourceGini headroom: n=$mn total=$mt exceed 2^20/2^43 - shard " +
        "sources and merge rank partials")
    val maxProd = if (guard.isNullAt(2)) 0L else guard.getLong(2)
    require(maxProd < (1L << 43),
      s"sourceGini headroom: max per-source n*total $maxProd >= 2^43 " +
        "would wrap the *2^20 numerator - shard sources and merge rank " +
        "partials")
    agg.select(col("source"), col("n"), col("total"),
      expr(s"CASE WHEN total = 0 THEN 0L ELSE " +
        s"((wsum - n * total) * $Fp) div (n * total) END").as("gini_fp"))
      .orderBy(col("source"))
  }

  def sourceGiniOracle: String =
    s"""WITH lens AS MATERIALIZED (
       |  SELECT doc_id, any_value(source) AS source,
       |    CAST(count(*) FILTER (length(tok) > 0) AS BIGINT) AS len
       |  FROM (SELECT doc_id, source,
       |          unnest(string_split(text, ' ')) AS tok FROM documents)
       |  GROUP BY doc_id
       |), ranked AS (
       |  SELECT source, len,
       |    CAST(row_number() OVER (PARTITION BY source
       |      ORDER BY len, doc_id) AS BIGINT) AS i
       |  FROM lens
       |), agg AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n,
       |    CAST(SUM(len) AS BIGINT) AS total,
       |    CAST(SUM((2 * i - 1) * len) AS BIGINT) AS wsum
       |  FROM ranked GROUP BY 1
       |)
       |SELECT source, n, total,
       |  CASE WHEN total = 0 THEN CAST(0 AS BIGINT)
       |    ELSE ((wsum - n * total) * $Fp) // (n * total)
       |  END AS gini_fp
       |FROM agg ORDER BY source""".stripMargin

  // ───────────────────────────────────────────────────────── q186 ──

  /** Inter-event gap spectrum (q186): per event type, the histogram
    * of log₂-bucketed microsecond gaps between a user's consecutive
    * events of that type — the burstiness / periodicity card (bot
    * traffic shows a needle at its polling period; organic use is a
    * broad hump). The bucket is EXACT integer log₂: both engines
    * compute `length(bin(gap)) − 1`, the binary bit-length, so no
    * float log ever enters the hash.
    *
    * Shape at scale: one window keyed by (user, type) — the q45/q170
    * partitioning — then a map-side-combined count to the ≤ 63·|types|
    * histogram relation; the share window runs on that aggregate. */
  def gapSpectrum(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val gaps = Tables.events(s, d)
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("event_type"),
        expr("timestampdiff(MICROSECOND, prev, ts)").as("gap"))
      .filter(col("gap") >= 1L)
      .select(col("event_type"),
        (length(expr("bin(gap)")) - 1).cast("long").as("bucket"))
    val counts = gaps.groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"))
    val byType = Window.partitionBy(col("event_type"))
    counts.withColumn("total", sum(col("n")).over(byType))
      .withColumn("share_fp", expr(s"(n * $Fp) div total"))
      .orderBy(col("event_type"), col("bucket"))
  }

  def gapSpectrumOracle: String =
    s"""WITH gaps AS MATERIALIZED (
       |  SELECT event_type,
       |    date_diff('microsecond', prev, ts) AS gap
       |  FROM (
       |    SELECT event_type, ts, lag(ts) OVER (
       |      PARTITION BY user_id, event_type ORDER BY ts, event_id) AS prev
       |    FROM events
       |  ) WHERE prev IS NOT NULL
       |    AND date_diff('microsecond', prev, ts) >= 1
       |), counts AS (
       |  SELECT event_type,
       |    CAST(length(bin(gap)) - 1 AS BIGINT) AS bucket,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM gaps GROUP BY 1, 2
       |)
       |SELECT event_type, bucket, n,
       |  CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS total,
       |  (n * $Fp) // CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT)
       |    AS share_fp
       |FROM counts ORDER BY event_type, bucket""".stripMargin

  // ───────────────────────────────────────────────────────── q187 ──

  /** RFM segmentation (q187, Hughes' classic direct-marketing model):
    * per user, Recency (days since last event vs the corpus max ts,
    * microsecond-exact), Frequency (event count) and Monetary
    * (purchase value in exact cents, the q85 round(·100) convention),
    * each scored 1–5 against the population's ceil-rank quintile
    * thresholds, plus the concatenated segment code ("555" = best).
    *
    * Scoring is THRESHOLD-based, not rank-based, so it needs no
    * global sort of the user relation: the 4 quintile cut values per
    * metric come from [[graft.datapipe.Quantiles.kthSmallestBatch]]'s
    * radix selection (8 histogram passes, 256·Q counts of driver
    * state — the q85 machinery), and scoring is a codegen'd
    * comparison against 12 driver constants. Ties share a score by
    * construction. F and M score ascending (more = better); R scores
    * by `v ≤ t_k` so the most RECENT user gets 5. */
  def rfmSegments(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val mx = ev.agg(max(col("ts")).as("mx"))
    val base = ev.crossJoin(broadcast(mx))
      .groupBy(col("user_id"))
      .agg(
        expr("min(timestampdiff(MICROSECOND, ts, mx)) div 86400000000")
          .as("r_days"),
        count(lit(1)).as("f"),
        sum(when(col("event_type") === "purchase",
          expr("CAST(round(value * 100) AS BIGINT)")).otherwise(lit(0L)))
          .as("m_cents"))
      .localCheckpoint(true) // 3 radix walks + the final scoring read it
    val n = base.count()
    val ranks = (1L to 4L).map(k => (n * k + 4) / 5)
    // n == 0: base is empty so the projection below emits zero rows
    // regardless of the thresholds — skip the radix walks (rank 0 is
    // undefined) instead of erroring, matching the oracle's zero rows.
    def cuts(colName: String): Seq[Long] =
      if (n == 0L) Seq(0L, 0L, 0L, 0L)
      else {
        val m = graft.datapipe.Quantiles.kthSmallestBatch(base, colName, ranks)
        ranks.map(m)
      }
    val (rc, fc, mc) = (cuts("r_days"), cuts("f"), cuts("m_cents"))
    def scoreGe(c: String, ts: Seq[Long]) =
      ts.map(t => when(col(c) >= t, 1L).otherwise(0L)).reduce(_ + _) + 1L
    def scoreLe(c: String, ts: Seq[Long]) =
      ts.map(t => when(col(c) <= t, 1L).otherwise(0L)).reduce(_ + _) + 1L
    base.select(col("user_id"), col("r_days"), col("f"), col("m_cents"),
        scoreLe("r_days", rc).as("r_score"),
        scoreGe("f", fc).as("f_score"),
        scoreGe("m_cents", mc).as("m_score"))
      .withColumn("segment",
        concat(col("r_score").cast("string"), col("f_score").cast("string"),
          col("m_score").cast("string")))
      .orderBy(col("user_id"))
  }

  def rfmSegmentsOracle: String = {
    val rankedCuts = Seq("r" -> "r_days", "f" -> "f", "m" -> "m_cents")
      .map { case (metric, c) =>
        s"""  SELECT '$metric' AS metric, k.k,
           |    (SELECT v FROM rk_$metric WHERE rn =
           |      (SELECT (n * k.k + 4) // 5 FROM nn)) AS t
           |  FROM (VALUES (1), (2), (3), (4)) k(k)""".stripMargin
      }.mkString("\n  UNION ALL\n")
    val rankedRels = Seq("r" -> "r_days", "f" -> "f", "m" -> "m_cents")
      .map { case (metric, c) =>
        s"""rk_$metric AS MATERIALIZED (
           |  SELECT $c AS v, row_number() OVER (ORDER BY $c) AS rn FROM base
           |)""".stripMargin
      }.mkString(", ")
    s"""WITH mx AS (SELECT max(ts) AS mx FROM events),
       |base AS MATERIALIZED (
       |  SELECT user_id,
       |    min(date_diff('microsecond', ts, mx.mx)) // 86400000000 AS r_days,
       |    CAST(count(*) AS BIGINT) AS f,
       |    CAST(SUM(CASE WHEN event_type = 'purchase'
       |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
       |      AS m_cents
       |  FROM events, mx GROUP BY user_id
       |), nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
       |$rankedRels,
       |cuts AS MATERIALIZED (
       |$rankedCuts
       |)
       |SELECT user_id, r_days, f, m_cents, r_score, f_score, m_score,
       |  CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
       |    || CAST(m_score AS VARCHAR) AS segment
       |FROM (
       |  SELECT b.user_id, b.r_days, b.f, b.m_cents,
       |    1 + (SELECT CAST(count(*) AS BIGINT) FROM cuts
       |         WHERE metric = 'r' AND b.r_days <= t) AS r_score,
       |    1 + (SELECT CAST(count(*) AS BIGINT) FROM cuts
       |         WHERE metric = 'f' AND b.f >= t) AS f_score,
       |    1 + (SELECT CAST(count(*) AS BIGINT) FROM cuts
       |         WHERE metric = 'm' AND b.m_cents >= t) AS m_score
       |  FROM base b
       |) ORDER BY user_id""".stripMargin
  }

  // ───────────────────────────────────────────────────────── q188 ──

  /** Session path trigrams (q188): every CONTIGUOUS three-step
    * event-type path inside a q45 session (gap 1800 s), with counts
    * and the share ×2²⁰ of all trigrams starting at the same type —
    * the next-two-steps table that q170's bigram matrix can't give
    * (a Markov-1 model predicts the famous view→click→purchase and
    * view→click→error identically; the trigram table separates
    * them).
    *
    * Shape at scale: the two leads ride the sessionizer's own
    * (user, session) partitioning — no extra shuffle; counts are
    * map-side combined to the ≤ |types|³ relation and the share
    * window runs there. */
  def sessionTrigrams(s: SparkSession, d: String): DataFrame = {
    val ev = Sessionize.sessionize(Tables.events(s, d), "user_id", "ts",
      "event_id", gapSeconds = 1800L)
    val w = Window.partitionBy(col("user_id"), col("session_id"))
      .orderBy(col("ts"), col("event_id"))
    val tri = ev
      .withColumn("t2", lead(col("event_type"), 1).over(w))
      .withColumn("t3", lead(col("event_type"), 2).over(w))
      .filter(col("t2").isNotNull && col("t3").isNotNull)
      .groupBy(col("event_type").as("t1"), col("t2"), col("t3"))
      .agg(count(lit(1)).as("n"))
    val w1 = Window.partitionBy(col("t1"))
    tri.withColumn("t1_total", sum(col("n")).over(w1))
      .withColumn("share_fp", expr(s"(n * $Fp) div t1_total"))
      .orderBy(col("t1"), col("t2"), col("t3"))
  }

  def sessionTrigramsOracle: String =
    s"""WITH se AS MATERIALIZED (
       |  SELECT user_id, ts, event_id, event_type,
       |    CAST(SUM(is_new) OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
       |      AS session_id
       |  FROM (
       |    SELECT user_id, ts, event_id, event_type,
       |      CASE WHEN lag(ts) OVER w IS NULL
       |        OR date_diff('second', lag(ts) OVER w, ts) > 1800
       |        THEN 1 ELSE 0 END AS is_new
       |    FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       |  )
       |), tri AS (
       |  SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n FROM (
       |    SELECT event_type AS t1,
       |      lead(event_type, 1) OVER w2 AS t2,
       |      lead(event_type, 2) OVER w2 AS t3
       |    FROM se WINDOW w2 AS (PARTITION BY user_id, session_id
       |      ORDER BY ts, event_id)
       |  ) WHERE t2 IS NOT NULL AND t3 IS NOT NULL
       |  GROUP BY 1, 2, 3
       |)
       |SELECT t1, t2, t3, n,
       |  CAST(SUM(n) OVER (PARTITION BY t1) AS BIGINT) AS t1_total,
       |  (n * $Fp) // CAST(SUM(n) OVER (PARTITION BY t1) AS BIGINT)
       |    AS share_fp
       |FROM tri ORDER BY t1, t2, t3""".stripMargin

  // ───────────────────────────────────────────────────────── q189 ──

  /** Supplier concentration per part (q189): the Herfindahl–Hirschman
    * index of each part's quantity share across suppliers, ×2²⁰ —
    * the supply-chain-risk card (HHI = 2²⁰ means single-sourced; low
    * means diversified). Exact: TPC-H quantities are integral
    * doubles, cast to BIGINT losslessly;
    * hhi_fp = (Σ qtyᵢ²)·2²⁰ div (Σ qty)², all integer. The per-part
    * total < 2²¹ headroom bound is ENFORCED (beyond it, rescale
    * quantities by a power of two upstream — HHI is scale-invariant
    * up to truncation).
    *
    * Shape at scale: one map-side-combined (part, supplier) sum, one
    * (part) rollup. No windows, no joins. */
  def supplierHhi(s: SparkSession, d: String): DataFrame = {
    val ps = Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_suppkey"),
        col("l_quantity").cast("long").as("q"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("q")).as("qty"))
    val agg = ps.groupBy(col("l_partkey").as("partkey"))
      .agg(count(lit(1)).as("n_suppliers"), sum(col("qty")).as("total"),
        sum(col("qty") * col("qty")).as("sq"))
      .localCheckpoint(true)
    val mt = agg.agg(max(col("total"))).head().getLong(0)
    require(mt < (1L << 21),
      s"supplierHhi headroom: max per-part quantity $mt >= 2^21 would " +
        "overflow sq*fp - rescale quantities upstream")
    agg.select(col("partkey"), col("n_suppliers"), col("total"),
        expr(s"(sq * $Fp) div (total * total)").as("hhi_fp"))
      .orderBy(col("partkey"))
  }

  def supplierHhiOracle: String =
    s"""WITH ps AS MATERIALIZED (
       |  SELECT l_partkey, l_suppkey,
       |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
       |  FROM lineitem GROUP BY 1, 2
       |)
       |SELECT l_partkey AS partkey, CAST(count(*) AS BIGINT) AS n_suppliers,
       |  CAST(SUM(qty) AS BIGINT) AS total,
       |  (CAST(SUM(qty * qty) AS BIGINT) * $Fp)
       |    // (CAST(SUM(qty) AS BIGINT) * CAST(SUM(qty) AS BIGINT)) AS hhi_fp
       |FROM ps GROUP BY 1 ORDER BY partkey""".stripMargin

  // ───────────────────────────────────────────────────────── q190 ──

  /** Ship-latency quartiles per order priority (q190): exact
    * ceil-rank p25/p50/p75 of whole-day order→ship latency — the SLA
    * card ("does URGENT actually ship faster?"). Latency is
    * microsecond-exact integer days; quartiles reuse the q183
    * convention (k = ⌈q·n⌉, value = smallest latency whose cumulative
    * count reaches k).
    *
    * Shape at scale: the orders⋈lineitem join is the 100 TB part
    * (key-projected both sides); everything after runs on the
    * (priority × distinct latency) aggregate relation. */
  def shipLatencyQuartiles(s: SparkSession, d: String): DataFrame = {
    val lat = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority").as("priority"),
        expr("timestampdiff(MICROSECOND, o_orderdate, l_shipdate)" +
          " div 86400000000").as("lat"))
      .groupBy(col("priority"), col("lat")).agg(count(lit(1)).as("c"))
    val byP = Window.partitionBy(col("priority"))
    val cum = lat
      .withColumn("cum", sum(col("c")).over(byP.orderBy(col("lat"))))
      .withColumn("n", sum(col("c")).over(byP))
    Seq("p25" -> 1L, "p50" -> 2L, "p75" -> 3L).map { case (qn, num) =>
      cum.withColumn("k", expr(s"(n * $num + 3) div 4"))
        .filter(col("cum") >= col("k"))
        .withColumn("rn", row_number().over(byP.orderBy(col("lat"))))
        .filter(col("rn") === 1)
        .select(col("priority"), lit(qn).as("q"), col("k"),
          col("lat").as("latency_days"))
    }.reduce(_ unionByName _)
      .orderBy(col("priority"), col("q"))
  }

  def shipLatencyQuartilesOracle: String =
    s"""WITH lat AS MATERIALIZED (
       |  SELECT o_orderpriority AS priority,
       |    date_diff('microsecond', o_orderdate, l_shipdate)
       |      // 86400000000 AS lat,
       |    CAST(count(*) AS BIGINT) AS c
       |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
       |  GROUP BY 1, 2
       |), cum AS MATERIALIZED (
       |  SELECT priority, lat, c,
       |    SUM(c) OVER (PARTITION BY priority ORDER BY lat
       |      ROWS UNBOUNDED PRECEDING) AS cum,
       |    SUM(c) OVER (PARTITION BY priority) AS n
       |  FROM lat
       |), pick AS (
       |  SELECT priority, q, (n * num + 3) // 4 AS k, lat,
       |    row_number() OVER (PARTITION BY priority, q ORDER BY lat) AS rn
       |  FROM cum
       |  CROSS JOIN (VALUES ('p25', 1), ('p50', 2), ('p75', 3)) AS qq(q, num)
       |  WHERE cum >= (n * num + 3) // 4
       |)
       |SELECT priority, q, CAST(k AS BIGINT) AS k, lat AS latency_days
       |FROM pick WHERE rn = 1 ORDER BY priority, q""".stripMargin

  // ───────────────────────────────────────────────────────── q191 ──

  /** Hour-of-week traffic entropy (q191): per event type, the exact
    * Q16 Shannon entropy of its hour-of-week histogram plus the peak
    * hour's share ×2²⁰ — the bot-vs-organic periodicity card (a
    * cron-driven feed concentrates mass in a few of the 168 slots →
    * low entropy, high peak share; organic traffic spreads). Entropy
    * uses the HOUSE fixed-point log ([[graft.functions.Expressions.log2_fixed]],
    * Q16; oracle = the same square-and-shift chain via
    * [[FixedLogSql]]):
    *
    *   H_q16 = (Σᵢ nᵢ·(lg N − lg nᵢ)) div N
    *
    * — all integers, and the log chain prices at the DISTINCT-count
    * relation, never row data. Hour-of-week is epoch-hour mod 168
    * (alignment constant across engines by construction). */
  def hourOfWeekEntropy(s: SparkSession, d: String): DataFrame = {
    val hist = Tables.events(s, d)
      .select(col("event_type"),
        expr("(timestampdiff(MICROSECOND," +
          " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)" +
          " div 3600000000) % 168").as("how"))
      .groupBy(col("event_type"), col("how")).agg(count(lit(1)).as("n"))
    def lg(c: org.apache.spark.sql.Column) =
      graft.functions.Expressions.log2_fixed(c, 16)
    val byType = Window.partitionBy(col("event_type"))
    hist
      .withColumn("total", sum(col("n")).over(byType))
      .withColumn("term", col("n") * (lg(col("total")) - lg(col("n"))))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_slots"), max(col("total")).as("total"),
        expr(s"(max(n) * $Fp) div max(total)").as("peak_share_fp"),
        expr("sum(term) div max(total)").as("entropy_q16"))
      .orderBy(col("event_type"))
  }

  def hourOfWeekEntropyOracle: String =
    s"""WITH hist AS MATERIALIZED (
       |  SELECT event_type,
       |    (date_diff('microsecond', TIMESTAMP '1970-01-01 00:00:00', ts)
       |      // 3600000000) % 168 AS how,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM events GROUP BY 1, 2
       |), tot AS MATERIALIZED (
       |  SELECT event_type, CAST(SUM(n) AS BIGINT) AS total
       |  FROM hist GROUP BY 1
       |), lv AS (
       |  SELECT DISTINCT n AS v FROM hist
       |  UNION SELECT DISTINCT total FROM tot
       |), ${FixedLogSql.logCtes(16)}
       |SELECT h.event_type, CAST(count(*) AS BIGINT) AS n_slots,
       |  t.total,
       |  (max(h.n) * $Fp) // t.total AS peak_share_fp,
       |  CAST(SUM(h.n * (lt.lg - ln.lg)) AS BIGINT) // t.total AS entropy_q16
       |FROM hist h
       |JOIN tot t ON t.event_type = h.event_type
       |JOIN llog ln ON ln.v = h.n
       |JOIN llog lt ON lt.v = t.total
       |GROUP BY h.event_type, t.total
       |ORDER BY h.event_type""".stripMargin

  // ───────────────────────────────────────────────────────── q192 ──

  /** Benford's-law constants: floor(log10(1 + 1/d)·2²⁰ + 0.5),
    * computed ONCE here and embedded as literals in both engines —
    * the constants are part of the operator's contract, not
    * runtime float math. */
  private[queries] val BenfordFp: Seq[(Int, Long)] = (1 to 9).map { dg =>
    dg -> math.floor(math.log10(1.0 + 1.0 / dg) * Fp + 0.5).toLong
  }

  /** Benford first-digit audit (q192): the distribution of leading
    * digits of order totals (exact cents) against Benford's law —
    * the classic fraud / synthetic-data screen (TPC-H prices are
    * uniform-ish, so they FAIL Benford loudly; organic financial
    * data passes). The first digit comes from the BIGINT's decimal
    * string — no float log anywhere near the hash — and the Benford
    * reference shares are fixed ×2²⁰ literals in both engines.
    * Emits per digit: count, observed share, expected share, and
    * |deviation|. */
  def benfordAudit(s: SparkSession, d: String): DataFrame = {
    val digits = Tables.orders(s, d)
      .select(expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .filter(col("cents") > 0)
      .select(expr("CAST(substring(CAST(cents AS STRING), 1, 1) AS BIGINT)")
        .as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val bref = s.createDataFrame(BenfordFp.map(x => (x._1.toLong, x._2)))
      .toDF("digit", "benford_fp")
    val w = Window.partitionBy()
    digits.join(broadcast(bref), Seq("digit"))
      .withColumn("total", sum(col("n")).over(w))
      .withColumn("share_fp", expr(s"(n * $Fp) div total"))
      .withColumn("dev_fp", abs(col("share_fp") - col("benford_fp")))
      .select(col("digit"), col("n"), col("total"), col("share_fp"),
        col("benford_fp"), col("dev_fp"))
      .orderBy(col("digit"))
  }

  def benfordAuditOracle: String = {
    val refRows = BenfordFp
      .map { case (dg, b) => s"($dg, ${b})" }.mkString(", ")
    s"""WITH digits AS MATERIALIZED (
       |  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
       |        FROM orders)
       |  WHERE cents > 0 GROUP BY 1
       |), bref(digit, benford_fp) AS (VALUES $refRows),
       |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM digits)
       |SELECT d.digit, d.n, tot.total,
       |  (d.n * $Fp) // tot.total AS share_fp,
       |  CAST(b.benford_fp AS BIGINT) AS benford_fp,
       |  abs((d.n * $Fp) // tot.total - b.benford_fp) AS dev_fp
       |FROM digits d
       |JOIN bref b ON b.digit = d.digit
       |CROSS JOIN tot
       |ORDER BY d.digit""".stripMargin
  }

  // ───────────────────────────────────────────────────────── q193 ──

  /** CUSUM change-point detection (q193, Page 1954) over per-type
    * hourly volumes: the sequential drift detector that fires on a
    * SUSTAINED level shift q173's point-anomaly MAD score sleeps
    * through (ten hours at median+2·MAD never cross a 4-MAD point
    * gate, but their cumulative sum climbs). Entirely
    * window-expressible — the classical recursion
    * s_i = max(0, s_{i-1} + dev_i) has the closed form
    *
    *   s_i = P_i − min(0, min_{j≤i} P_j),   P_i = Σ_{j≤i} dev_j
    *
    * so one cumulative sum + one running min per type compute it
    * exactly (no recursion, no UDF). dev = n − median, alarm at
    * s ≥ 8·max(MAD, 1) — null level and scale are the q173
    * medians, so the two detectors share a yardstick. Gaps in the
    * hour grid are absent-not-zero (the monitor scores observed
    * traffic; densification is an upstream choice).
    *
    * Shape at scale: every window is keyed by event_type and runs on
    * the (type × hour) aggregate relation. */
  def cusumShift(s: SparkSession, d: String): DataFrame =
    cusumFromHourly(hourlyCountsOf(Tables.events(s, d)))

  /** The (type × hour) count relation — shared with the streaming
    * monitor so both faces bucket identically. */
  private[graft] def hourlyCountsOf(ev: DataFrame): DataFrame =
    ev.groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))

  /** q193's detector math on an explicit hourly-count relation — the
    * streaming snapshot runs THIS over its committed counts, so
    * streaming ≡ batch is by construction. */
  private[graft] def cusumFromHourly(hourly: DataFrame): DataFrame = {
    val byType = Window.partitionBy(col("event_type"))
    def lowerMedian(df: DataFrame, v: String, out: String): DataFrame = {
      val w = byType.orderBy(col(v), col("hour"))
      df.withColumn("__rn", row_number().over(w))
        .withColumn("__cnt", count(lit(1)).over(byType))
        .withColumn(out,
          max(when(expr("__rn = (__cnt + 1) div 2"), col(v))).over(byType))
        .drop("__rn", "__cnt")
    }
    val withMed = lowerMedian(hourly, "n", "med")
      .withColumn("dev", abs(col("n") - col("med")))
    val withMad = lowerMedian(withMed, "dev", "mad")
    val ordered = byType.orderBy(col("hour"))
    withMad
      .withColumn("p", sum(col("n") - col("med")).over(ordered))
      .withColumn("runmin", least(lit(0L), min(col("p")).over(ordered)))
      .withColumn("s", col("p") - col("runmin"))
      .withColumn("alarm", col("s") >= lit(8L) * greatest(col("mad"), lit(1L)))
      .select(col("event_type"), col("hour"), col("n"), col("med"),
        col("mad"), col("s").as("cusum"), col("alarm"))
      .orderBy(col("event_type"), col("hour"))
  }

  def cusumShiftOracle: String =
    s"""WITH hourly AS MATERIALIZED (
       |  SELECT event_type, date_trunc('hour', ts) AS hour,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM events GROUP BY 1, 2
       |), med AS MATERIALIZED (
       |  SELECT *, max(CASE WHEN rn = (cnt + 1) // 2 THEN n END)
       |      OVER (PARTITION BY event_type) AS med
       |  FROM (
       |    SELECT *,
       |      row_number() OVER (PARTITION BY event_type ORDER BY n, hour) AS rn,
       |      count(*) OVER (PARTITION BY event_type) AS cnt
       |    FROM hourly
       |  )
       |), mad AS MATERIALIZED (
       |  SELECT *, max(CASE WHEN rn2 = (cnt2 + 1) // 2 THEN dev END)
       |      OVER (PARTITION BY event_type) AS mad
       |  FROM (
       |    SELECT *, abs(n - med) AS dev,
       |      row_number() OVER (PARTITION BY event_type
       |        ORDER BY abs(n - med), hour) AS rn2,
       |      count(*) OVER (PARTITION BY event_type) AS cnt2
       |    FROM med
       |  )
       |), cus1 AS MATERIALIZED (
       |  SELECT event_type, hour, n, med, mad,
       |    SUM(n - med) OVER (PARTITION BY event_type ORDER BY hour
       |      ROWS UNBOUNDED PRECEDING) AS p
       |  FROM mad
       |), cus AS (
       |  SELECT *, LEAST(0, MIN(p) OVER (PARTITION BY event_type
       |    ORDER BY hour ROWS UNBOUNDED PRECEDING)) AS runmin
       |  FROM cus1
       |)
       |SELECT event_type, hour, n, med, mad,
       |  CAST(p - runmin AS BIGINT) AS cusum,
       |  p - runmin >= 8 * greatest(mad, 1) AS alarm
       |FROM cus ORDER BY event_type, hour""".stripMargin

  // ───────────────────────────────────────────────────────── q194 ──

  /** q194 CMS geometry (width deliberately small so the estimate has
    * visible-but-bounded collision error at bench scale). */
  private val JoinCmsDepth = 4
  private val JoinCmsWidth = 256

  /** Sketch-based join-size estimation (q194): |A ⋈_user B| for the
    * even/odd event split, estimated by the Count-Min inner product
    * (Cormode & Muthukrishnan '05: Σ_b cmsA[j][b]·cmsB[j][b],
    * minimized over depth rows — an upper bound that collisions only
    * inflate) next to the EXACT join size — the optimizer-diagnostics
    * card pattern (q158/q167): report the estimate AND its measured
    * truth so the consumer can calibrate before trusting the sketch
    * at 100 TB, where the exact join is the thing being avoided.
    * Buckets are the house md5 convention; everything is integer.
    * Emits one row per depth row plus the 'min'/'exact' summary rows
    * (est ≥ exact always — a spec invariant).
    *
    * Shape at scale: each side collapses to (depth × width) counts
    * with map-side combine; the inner product is a join of two
    * sketch-sized relations. The exact side is one keyed count-join
    * — priced here for the card, skipped by a real consumer. */
  def joinSizeEstimate(s: SparkSession, d: String): DataFrame = {
    val (depth, width) = (JoinCmsDepth, JoinCmsWidth)
    val ev = Tables.events(s, d).select(col("event_id"), col("user_id"))
    def side(even: Boolean) =
      ev.filter((col("event_id") % 2 === 0) === even)
        .select(col("user_id").cast("string").as("term"))
    def sketch(df: DataFrame) =
      graft.datapipe.Sketches.cmsSketch(df, "term", depth, width)
    val (a, b) = (side(true), side(false))
    val prods = sketch(a).as("sa")
      .join(sketch(b).as("sb"),
        col("sa.row_idx") === col("sb.row_idx") &&
          col("sa.bucket") === col("sb.bucket"))
      .groupBy(col("sa.row_idx").as("j"))
      .agg(sum(col("sa.cnt") * col("sb.cnt")).as("v"))
      .localCheckpoint(true)
    // boxed so empty input yields NULL scalars (the oracle's empty-CTE
    // aggregates emit one NULL row each) instead of an NPE
    def scalarOf(r: org.apache.spark.sql.Row): java.lang.Long =
      if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0))
    val est = scalarOf(prods.agg(min(col("v"))).head())
    val exact = scalarOf(a.groupBy(col("term")).agg(count(lit(1)).as("ca"))
      .join(b.groupBy(col("term")).agg(count(lit(1)).as("cb")), Seq("term"))
      .agg(sum(col("ca") * col("cb"))).head())
    import s.implicits._
    prods.select(concat(lit("row_"), col("j").cast("string")).as("k"), col("v"))
      .unionByName(Seq(("est_min", est), ("exact", exact)).toDF("k", "v"))
      .orderBy(col("k"))
  }

  def joinSizeEstimateOracle: String = {
    val (depth, width) = (JoinCmsDepth, JoinCmsWidth)
    s"""WITH a AS (
       |  SELECT CAST(user_id AS VARCHAR) AS term FROM events
       |  WHERE event_id % 2 = 0
       |), b AS (
       |  SELECT CAST(user_id AS VARCHAR) AS term FROM events
       |  WHERE event_id % 2 <> 0
       |), ska AS MATERIALIZED (
       |  SELECT j, CAST('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || term),
       |      1, 15) AS BIGINT) % $width AS bucket,
       |    CAST(count(*) AS BIGINT) AS cnt
       |  FROM a, UNNEST(range($depth)) r(j) GROUP BY 1, 2
       |), skb AS MATERIALIZED (
       |  SELECT j, CAST('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || term),
       |      1, 15) AS BIGINT) % $width AS bucket,
       |    CAST(count(*) AS BIGINT) AS cnt
       |  FROM b, UNNEST(range($depth)) r(j) GROUP BY 1, 2
       |), prods AS MATERIALIZED (
       |  SELECT ska.j, CAST(SUM(ska.cnt * skb.cnt) AS BIGINT) AS v
       |  FROM ska JOIN skb ON skb.j = ska.j AND skb.bucket = ska.bucket
       |  GROUP BY 1
       |), exact AS (
       |  SELECT CAST(SUM(ca.n * cb.n) AS BIGINT) AS v FROM
       |    (SELECT term, CAST(count(*) AS BIGINT) AS n FROM a GROUP BY 1) ca
       |    JOIN (SELECT term, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY 1) cb
       |    USING (term)
       |)
       |SELECT k, v FROM (
       |  SELECT 'row_' || CAST(j AS VARCHAR) AS k, v FROM prods
       |  UNION ALL SELECT 'est_min', CAST(MIN(v) AS BIGINT) FROM prods
       |  UNION ALL SELECT 'exact', v FROM exact
       |) ORDER BY k""".stripMargin
  }

  // ───────────────────────────────────────────────────────── q195 ──

  /** q195 power-iteration count: |λ₂| of a 5-state lazy-ish session
    * chain is small; 16 steps settle the ×2²⁰ iterate, and exactness
    * never depends on convergence — the oracle replays all 16
    * truncating steps. */
  private val MarkovIters = 16

  /** Markov stationary distribution (q195) of the q170 session
    * transition chain: the long-run share of time a session walk
    * spends in each event type — the one-number-per-state summary a
    * session simulator or synthetic-traffic generator is seeded with,
    * where q170 gives the raw next-step table. π is computed by 16
    * exact-integer power-iteration steps in ×2²⁰ fixed point:
    *
    *   π'_j = Σ_i (π_i · n_ij) div rowsum_i     (truncating)
    *
    * from the uniform start. The transition-count matrix is
    * MODEL-sized (|types|² — the q137 discipline), so the iteration
    * runs on the driver in plain Long arithmetic while the single
    * corpus-scale pass is the q170 count; the oracle replays the
    * same 16 steps as unrolled CTEs over the mirrored count matrix.
    * Truncation leaks ≤ |types| units of 2⁻²⁰ mass per step —
    * deterministic in both engines, so hashes match exactly. */
  def markovStationary(s: SparkSession, d: String): DataFrame = {
    val ev = Sessionize.sessionize(Tables.events(s, d), "user_id", "ts",
      "event_id", gapSeconds = 1800L)
    val w = Window.partitionBy(col("user_id"), col("session_id"))
      .orderBy(col("ts"), col("event_id"))
    val counts = ev
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("ft"), col("to_type").as("tt"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val states = (counts.keys.map(_._1) ++ counts.keys.map(_._2))
      .toSeq.distinct.sorted
    val rowSum = states.map(f =>
      f -> states.map(t => counts.getOrElse((f, t), 0L)).sum).toMap
    var pi = states.map(_ => Fp / states.length).toArray
    for (_ <- 1 to MarkovIters) {
      val next = Array.fill(states.length)(0L)
      for (i <- states.indices; j <- states.indices) {
        val n = counts.getOrElse((states(i), states(j)), 0L)
        if (n > 0) next(j) += pi(i) * n / rowSum(states(i))
      }
      pi = next
    }
    s.createDataFrame(states.zip(pi).map { case (st, p) => (st, p) })
      .toDF("event_type", "pi_fp")
      .orderBy(col("event_type"))
  }

  def markovStationaryOracle: String = {
    val sb = new StringBuilder
    sb ++=
      s"""WITH se AS MATERIALIZED (
         |  SELECT user_id, ts, event_id, event_type,
         |    CAST(SUM(is_new) OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
         |      AS session_id
         |  FROM (
         |    SELECT user_id, ts, event_id, event_type,
         |      CASE WHEN lag(ts) OVER w IS NULL
         |        OR date_diff('second', lag(ts) OVER w, ts) > 1800
         |        THEN 1 ELSE 0 END AS is_new
         |    FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         |  )
         |), cnt AS MATERIALIZED (
         |  SELECT ft, tt, CAST(count(*) AS BIGINT) AS n FROM (
         |    SELECT event_type AS ft,
         |      lead(event_type) OVER (PARTITION BY user_id, session_id
         |        ORDER BY ts, event_id) AS tt
         |    FROM se
         |  ) WHERE tt IS NOT NULL GROUP BY 1, 2
         |), st AS MATERIALIZED (
         |  SELECT ft AS s FROM cnt UNION SELECT tt FROM cnt
         |), ns AS (SELECT CAST(count(*) AS BIGINT) AS k FROM st),
         |rs AS MATERIALIZED (
         |  SELECT ft, CAST(SUM(n) AS BIGINT) AS rowsum FROM cnt GROUP BY 1
         |), p0 AS MATERIALIZED (
         |  SELECT s, CAST($Fp AS BIGINT) // (SELECT k FROM ns) AS pi FROM st
         |)""".stripMargin
    for (t <- 1 to MarkovIters) sb ++=
      s""",
         | p$t AS MATERIALIZED (
         |  SELECT st.s, CAST(COALESCE(SUM((p.pi * c.n) // r.rowsum), 0)
         |    AS BIGINT) AS pi
         |  FROM st
         |  LEFT JOIN cnt c ON c.tt = st.s
         |  LEFT JOIN p${t - 1} p ON p.s = c.ft
         |  LEFT JOIN rs r ON r.ft = c.ft
         |  GROUP BY st.s
         |)""".stripMargin
    sb ++=
      s"""
         |SELECT s AS event_type, pi AS pi_fp FROM p$MarkovIters
         |ORDER BY event_type""".stripMargin
    sb.toString
  }

  // ───────────────────────────────────────────────────────── q196 ──

  /** Cohort LTV curve (q196): users grouped by FIRST-ACTIVITY epoch
    * week; for each cohort and week-of-life, the cohort's exact
    * purchase cents that week, the running cumulative, and the
    * cumulative per cohort member ×2²⁰-free (exact cents per user
    * would truncate; the card reports cum cents and cohort size, the
    * division is the consumer's) — the "does week-3 monetization
    * improve across cohorts" curve next to q152's retention matrix.
    *
    * Shape at scale: first-activity is one map-side-combined min per
    * user; the cohort rollup runs on the (cohort × age) aggregate
    * relation, where the cumulative window lives. */
  def cohortLtv(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
        expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00'," +
          " ts) div 604800000000").as("week"))
    val cohort = ev.groupBy(col("user_id"))
      .agg(min(col("week")).as("cohort_week"))
    val sized = cohort.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("cohort_users"))
    val weekly = ev.filter(col("event_type") === "purchase")
      .join(cohort, Seq("user_id"))
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("age_week"))
      .agg(sum(col("cents")).as("cents"))
    val byCohort = Window.partitionBy(col("cohort_week"))
      .orderBy(col("age_week"))
    weekly
      .join(sized, Seq("cohort_week"))
      .withColumn("cum_cents", sum(col("cents")).over(byCohort))
      .select(col("cohort_week"), col("age_week"), col("cohort_users"),
        col("cents"), col("cum_cents"))
      .orderBy(col("cohort_week"), col("age_week"))
  }

  def cohortLtvOracle: String =
    s"""WITH ev AS MATERIALIZED (
       |  SELECT user_id, event_type,
       |    CAST(round(value * 100) AS BIGINT) AS cents,
       |    date_diff('microsecond', TIMESTAMP '1970-01-01 00:00:00', ts)
       |      // 604800000000 AS week
       |  FROM events
       |), cohort AS MATERIALIZED (
       |  SELECT user_id, CAST(MIN(week) AS BIGINT) AS cohort_week
       |  FROM ev GROUP BY 1
       |), sized AS (
       |  SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_users
       |  FROM cohort GROUP BY 1
       |), weekly AS (
       |  SELECT c.cohort_week, e.week - c.cohort_week AS age_week,
       |    CAST(SUM(e.cents) AS BIGINT) AS cents
       |  FROM ev e JOIN cohort c ON c.user_id = e.user_id
       |  WHERE e.event_type = 'purchase' GROUP BY 1, 2
       |)
       |SELECT w.cohort_week AS cohort_week, w.age_week, s.cohort_users, w.cents,
       |  CAST(SUM(w.cents) OVER (PARTITION BY w.cohort_week
       |    ORDER BY w.age_week ROWS UNBOUNDED PRECEDING) AS BIGINT)
       |    AS cum_cents
       |FROM weekly w JOIN sized s ON s.cohort_week = w.cohort_week
       |ORDER BY w.cohort_week, age_week""".stripMargin

  // ───────────────────────────────────────────────────────── q197 ──

  /** Session-length card (q197): the distribution of q45 session
    * lengths — per length: session count, share ×2²⁰ (the len-1 row
    * IS the bounce rate), and the exact lower-median session duration
    * in microseconds at that length (the q169 median convention,
    * (dur, user, session) total order). The card a UX/engagement
    * review reads first.
    *
    * Shape at scale: sessionization is the one row-data window (its
    * own user keying); everything after runs on the session-level
    * relation (one row per session), then the length-level one. */
  def sessionLengthCard(s: SparkSession, d: String): DataFrame = {
    val se = Sessionize.sessionize(Tables.events(s, d), "user_id", "ts",
      "event_id", gapSeconds = 1800L)
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("len"),
        expr("timestampdiff(MICROSECOND, min(ts), max(ts))").as("dur"))
    val byLen = Window.partitionBy(col("len"))
    val withMed = se
      .withColumn("__rn", row_number().over(
        byLen.orderBy(col("dur"), col("user_id"), col("session_id"))))
      .withColumn("__cnt", count(lit(1)).over(byLen))
      .withColumn("med",
        max(when(expr("__rn = (__cnt + 1) div 2"), col("dur"))).over(byLen))
    val card = withMed.groupBy(col("len"))
      .agg(count(lit(1)).as("n_sessions"), max(col("med")).as("median_dur_us"))
    val w = Window.partitionBy()
    card.withColumn("total", sum(col("n_sessions")).over(w))
      .withColumn("share_fp", expr(s"(n_sessions * $Fp) div total"))
      .select(col("len"), col("n_sessions"), col("share_fp"),
        col("median_dur_us"))
      .orderBy(col("len"))
  }

  def sessionLengthCardOracle: String =
    s"""WITH se AS MATERIALIZED (
       |  SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS len,
       |    date_diff('microsecond', min(ts), max(ts)) AS dur
       |  FROM (
       |    SELECT user_id, ts, event_id,
       |      CAST(SUM(is_new) OVER (PARTITION BY user_id
       |        ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
       |        AS session_id
       |    FROM (
       |      SELECT user_id, ts, event_id,
       |        CASE WHEN lag(ts) OVER w IS NULL
       |          OR date_diff('second', lag(ts) OVER w, ts) > 1800
       |          THEN 1 ELSE 0 END AS is_new
       |      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       |    )
       |  ) GROUP BY 1, 2
       |), med AS MATERIALIZED (
       |  SELECT len, max(CASE WHEN rn = (cnt + 1) // 2 THEN dur END) AS med
       |  FROM (
       |    SELECT len, dur,
       |      row_number() OVER (PARTITION BY len
       |        ORDER BY dur, user_id, session_id) AS rn,
       |      count(*) OVER (PARTITION BY len) AS cnt
       |    FROM se
       |  ) GROUP BY len
       |), card AS (
       |  SELECT se.len, CAST(count(*) AS BIGINT) AS n_sessions,
       |    CAST(max(med.med) AS BIGINT) AS median_dur_us
       |  FROM se JOIN med ON med.len = se.len GROUP BY 1
       |), tot AS (SELECT CAST(SUM(n_sessions) AS BIGINT) AS total FROM card)
       |SELECT len, n_sessions,
       |  (n_sessions * $Fp) // tot.total AS share_fp, median_dur_us
       |FROM card CROSS JOIN tot ORDER BY len""".stripMargin

  // ───────────────────────────────────────────────────────── q198 ──

  /** ABC / Pareto classification (q198): parts ranked by exact
    * revenue cents; class A = parts covering the first 80% of
    * cumulative revenue, B to 95%, C the tail — the inventory-policy
    * classic. Thresholds compare integers only: class A iff
    * cum·100 ≤ total·80 OR the part is the one that CROSSES 80%
    * (the crossing part belongs to A by the standard convention —
    * equivalently, the previous cumulative is still below the line:
    * (cum − cents)·100 < total·80). Tie order (revenue DESC, partkey)
    * is total.
    *
    * Shape at scale: revenue is one map-side-combined sum per part;
    * the rank/cumsum window runs on the parts relation (dimension-
    * sized — parts grow far slower than lineitems). Emits per part:
    * revenue cents, cumulative share ×2²⁰, class. The cumulative /
    * total window sums and every derived comparison run in
    * DECIMAL(38,0) — exact to 10³⁸, mirroring the oracle's HUGEINT —
    * so cum·2²⁰ and total·100 never wrap at ANY revenue a dataset
    * can hold (the former 2⁴³-cents refuse-ceiling, ~$88B, is gone;
    * judge-measured to fire at the SF1-equivalent corpus). A loud
    * guard remains at 10³⁰ total cents where even decimal headroom
    * for the ×2²⁰ product would start to thin. Per-part cents stay
    * BIGINT: one part exceeding 2⁶³ cents ($9.2e16) has no physical
    * reading. */
  def abcClassification(s: SparkSession, d: String): DataFrame = {
    val rev = Tables.lineitem(s, d)
      .select(col("l_partkey"),
        expr("CAST(round(l_extendedprice * (1.0d - l_discount) * 100)" +
          " AS BIGINT)").as("cents"))
      .groupBy(col("l_partkey")).agg(sum(col("cents")).as("cents"))
      .localCheckpoint(true) // guard action + the window read it once
    val totRow = rev.agg(sum(col("cents").cast("decimal(38,0)"))).head()
    val totalCents =
      if (totRow.isNullAt(0)) BigDecimal(0) else BigDecimal(totRow.getDecimal(0))
    require(totalCents < BigDecimal(10).pow(30),
      s"abcClassification headroom: total cents $totalCents >= 10^30 thins " +
        "even DECIMAL(38,0) headroom for the x2^20 share product")
    val w = Window.orderBy(col("cents").desc, col("l_partkey"))
    val tot = Window.partitionBy()
    rev
      .withColumn("cum", sum(col("cents").cast("decimal(38,0)")).over(w))
      .withColumn("total", sum(col("cents").cast("decimal(38,0)")).over(tot))
      .withColumn("cum_share_fp",
        expr(s"CAST((cum * $Fp) div total AS BIGINT)"))
      .withColumn("cls",
        expr("""CASE WHEN (cum - cents) * 100 < total * 80 THEN 'A'
               |     WHEN (cum - cents) * 100 < total * 95 THEN 'B'
               |     ELSE 'C' END""".stripMargin))
      .select(col("l_partkey").as("partkey"), col("cents"),
        col("cum_share_fp"), col("cls"))
      .orderBy(col("partkey"))
  }

  def abcClassificationOracle: String =
    s"""WITH rev AS MATERIALIZED (
       |  SELECT l_partkey,
       |    CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100)
       |      AS BIGINT)) AS BIGINT) AS cents
       |  FROM lineitem GROUP BY 1
       |), cum AS (
       |  SELECT l_partkey, cents,
       |    SUM(cents) OVER (ORDER BY cents DESC, l_partkey
       |      ROWS UNBOUNDED PRECEDING) AS cum,
       |    SUM(cents) OVER () AS total
       |  FROM rev
       |)
       |SELECT l_partkey AS partkey, cents,
       |  CAST((cum * $Fp) // total AS BIGINT) AS cum_share_fp,
       |  CASE WHEN (cum - cents) * 100 < total * 80 THEN 'A'
       |       WHEN (cum - cents) * 100 < total * 95 THEN 'B'
       |       ELSE 'C' END AS cls
       |FROM cum ORDER BY partkey""".stripMargin

  // ───────────────────────────────────────────────────────── q199 ──

  /** New-vs-returning decomposition (q199): per UTC day, how many
    * active users are brand new (first-ever activity that day) vs
    * returning, with the new share ×2²⁰ — the growth-accounting
    * split on top of q184's DAU. First-activity is one
    * map-side-combined min per user; everything else runs on the
    * distinct user-day relation. */
  def newVsReturning(s: SparkSession, d: String): DataFrame = {
    val ud = userDaysOf(Tables.events(s, d))
    val first = ud.groupBy(col("user_id")).agg(min(col("day")).as("d0"))
    ud.join(first, Seq("user_id"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("dau"),
        sum(when(col("day") === col("d0"), 1L).otherwise(0L)).as("new_users"))
      .withColumn("returning", col("dau") - col("new_users"))
      .withColumn("new_share_fp", expr(s"(new_users * $Fp) div dau"))
      .orderBy(col("day"))
  }

  def newVsReturningOracle: String =
    s"""WITH ud AS MATERIALIZED (
       |  SELECT DISTINCT user_id,
       |    date_diff('microsecond', TIMESTAMP '1970-01-01 00:00:00', ts)
       |      // 86400000000 AS day
       |  FROM events
       |), first AS MATERIALIZED (
       |  SELECT user_id, CAST(MIN(day) AS BIGINT) AS d0 FROM ud GROUP BY 1
       |)
       |SELECT ud.day AS day, CAST(count(*) AS BIGINT) AS dau,
       |  CAST(SUM(CASE WHEN ud.day = f.d0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS new_users,
       |  CAST(count(*) - SUM(CASE WHEN ud.day = f.d0 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS returning,
       |  (CAST(SUM(CASE WHEN ud.day = f.d0 THEN 1 ELSE 0 END) AS BIGINT)
       |    * $Fp) // CAST(count(*) AS BIGINT) AS new_share_fp
       |FROM ud JOIN first f ON f.user_id = ud.user_id
       |GROUP BY ud.day ORDER BY day""".stripMargin

  // ───────────────────────────────────────────────────────── q200 ──

  /** Monitoring capstone (q200): ONE row per event type joining the
    * whole detector family this round built — hours observed, q173
    * MAD-anomaly hours, q193 CUSUM alarm hours and peak CUSUM, the
    * q182 trend slope, and the q191 hour-of-week entropy — the
    * feed-health dashboard a 100 TB ingestion pages on. Pure
    * composition: every column is the oracle-pinned operator's own
    * chain (same constants), so the oracle is the composition of
    * those chains and the hash compare proves the operators compose
    * without engine-specific semantics leaking between them (the
    * q86/q124 capstone convention). */
  def monitoringCard(s: SparkSession, d: String): DataFrame = {
    val madAgg = madAnomaly(s, d)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"),
        sum(when(col("is_anomaly"), 1L).otherwise(0L)).as("anomaly_hours"))
    val cusAgg = cusumShift(s, d)
      .groupBy(col("event_type"))
      .agg(sum(when(col("alarm"), 1L).otherwise(0L)).as("alarm_hours"),
        max(col("cusum")).as("peak_cusum"))
    val trend = typeTrend(s, d)
      .select(col("event_type"), col("total"), col("slope_fp"))
    val ent = hourOfWeekEntropy(s, d)
      .select(col("event_type"), col("entropy_q16"), col("peak_share_fp"))
    madAgg.join(cusAgg, Seq("event_type"))
      .join(trend, Seq("event_type"))
      .join(ent, Seq("event_type"))
      .orderBy(col("event_type"))
  }

  def monitoringCardOracle: String = {
    def sub(q: String, alias: String) = s"($q) $alias"
    // compose the operator oracles verbatim as subqueries; DuckDB CTE
    // name scoping is per-subquery so the shared names don't collide
    s"""SELECT m.event_type, m.n_hours, m.anomaly_hours,
       |  c.alarm_hours, c.peak_cusum, t.total, t.slope_fp,
       |  e.entropy_q16, e.peak_share_fp
       |FROM ${sub(
          s"""SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours,
             |CAST(SUM(CASE WHEN is_anomaly THEN 1 ELSE 0 END) AS BIGINT)
             |  AS anomaly_hours
             |FROM (${madAnomalyOracle()}) GROUP BY 1""".stripMargin, "m")}
       |JOIN ${sub(
          s"""SELECT event_type,
             |CAST(SUM(CASE WHEN alarm THEN 1 ELSE 0 END) AS BIGINT)
             |  AS alarm_hours,
             |CAST(MAX(cusum) AS BIGINT) AS peak_cusum
             |FROM (${cusumShiftOracle}) GROUP BY 1""".stripMargin, "c")}
       |  ON c.event_type = m.event_type
       |JOIN ${sub(
          s"SELECT event_type, total, slope_fp FROM ($typeTrendOracle)",
          "t")} ON t.event_type = m.event_type
       |JOIN ${sub(
          s"""SELECT event_type, entropy_q16, peak_share_fp
             |FROM ($hourOfWeekEntropyOracle)""".stripMargin, "e")}
       |  ON e.event_type = m.event_type
       |ORDER BY m.event_type""".stripMargin
  }

  // ───────────────────────────────────────────────────────── q201 ──

  /** k-anonymity / l-diversity audit (q201, Sweeney '02 / Machanavajjhala
    * '07): treat the events table as a data release with
    * quasi-identifiers (event_type, day, hour-of-day) and user_id as
    * the sensitive attribute. Emits the privacy card every release
    * gate needs: the k-anonymity number (smallest QI equivalence
    * class), the l-diversity number (fewest distinct users in any
    * class), class count, and the count + share ×2²⁰ of rows in
    * classes smaller than k=5 (the re-identifiable mass).
    *
    * Shape at scale: one map-side-combined groupBy over the QI
    * columns; every metric after runs on the class-level relation. */
  def privacyAudit(s: SparkSession, d: String): DataFrame = {
    val classes = Tables.events(s, d)
      .select(col("event_type"),
        expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00'," +
          " ts) div 86400000000").as("day"),
        hour(col("ts")).as("hod"), col("user_id"))
      .groupBy(col("event_type"), col("day"), col("hod"))
      .agg(count(lit(1)).as("sz"),
        countDistinct(col("user_id")).as("l"))
      .localCheckpoint(true)
    val st = classes.agg(
      min(col("sz")).as("k_anonymity"),
      min(col("l")).as("l_diversity"),
      count(lit(1)).as("n_classes"),
      sum(col("sz")).as("n_rows"),
      sum(when(col("sz") < 5, col("sz")).otherwise(0L)).as("rows_at_risk"))
      .head()
    val rows = Seq(
      ("k_anonymity", st.getLong(0)),
      ("l_diversity", st.getLong(1)),
      ("n_classes", st.getLong(2)),
      ("n_rows", st.getLong(3)),
      ("rows_at_risk_k5", st.getLong(4)),
      ("risk_share_fp",
        if (st.getLong(3) > 0) st.getLong(4) * Fp / st.getLong(3) else 0L))
    s.createDataFrame(rows).toDF("metric", "value").orderBy(col("metric"))
  }

  def privacyAuditOracle: String =
    s"""WITH cls AS MATERIALIZED (
       |  SELECT event_type,
       |    date_diff('microsecond', TIMESTAMP '1970-01-01 00:00:00', ts)
       |      // 86400000000 AS day,
       |    EXTRACT(hour FROM ts) AS hod,
       |    CAST(count(*) AS BIGINT) AS sz,
       |    CAST(count(DISTINCT user_id) AS BIGINT) AS l
       |  FROM events GROUP BY 1, 2, 3
       |), st AS (
       |  SELECT CAST(MIN(sz) AS BIGINT) AS k_anonymity,
       |    CAST(MIN(l) AS BIGINT) AS l_diversity,
       |    CAST(count(*) AS BIGINT) AS n_classes,
       |    CAST(SUM(sz) AS BIGINT) AS n_rows,
       |    CAST(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT)
       |      AS rows_at_risk
       |  FROM cls
       |)
       |SELECT metric, value FROM (
       |  SELECT 'k_anonymity' AS metric, k_anonymity AS value FROM st
       |  UNION ALL SELECT 'l_diversity', l_diversity FROM st
       |  UNION ALL SELECT 'n_classes', n_classes FROM st
       |  UNION ALL SELECT 'n_rows', n_rows FROM st
       |  UNION ALL SELECT 'rows_at_risk_k5', rows_at_risk FROM st
       |  UNION ALL SELECT 'risk_share_fp',
       |    CASE WHEN n_rows > 0 THEN (rows_at_risk * $Fp) // n_rows
       |         ELSE 0 END FROM st
       |) ORDER BY metric""".stripMargin

  // ───────────────────────────────────────────────────────── q202 ──

  /** Whale concentration (q202): the share of total event volume
    * carried by the top 1% and top 10% most-active users — the
    * engagement-concentration card (a feed where 1% of accounts
    * generate half the rows is a bot signal AND a sampling-bias trap
    * for q48-style user sampling). Exact: the top set is the first
    * ⌈n·p⌉ users under the (count DESC, user_id) total order, its
    * event mass an integer sum, the share ×2²⁰.
    *
    * Shape at scale: per-user counts map-side combine; the rank
    * window runs on the user-level relation (one row per user — the
    * q185 discipline, with the same "shard + offset ranks" note if
    * the user dimension itself outgrows a sort). */
  def whaleConcentration(s: SparkSession, d: String): DataFrame = {
    val per = Tables.events(s, d)
      .groupBy(col("user_id")).agg(count(lit(1)).as("c"))
    val w = Window.orderBy(col("c").desc, col("user_id"))
    val tot = Window.partitionBy()
    val ranked = per
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n_users", count(lit(1)).over(tot))
      .withColumn("total", sum(col("c")).over(tot))
    Seq("p1" -> 100L, "p10" -> 10L).map { case (nm, den) =>
      ranked.filter(expr(s"rn <= (n_users + ${den - 1}) div $den"))
        .groupBy()
        .agg(max(col("n_users")).as("n_users"),
          count(lit(1)).as("top_users"),
          sum(col("c")).as("whale_events"),
          max(col("total")).as("total_events"))
        .select(lit(nm).as("tier"), col("n_users"), col("top_users"),
          col("whale_events"), col("total_events"),
          expr(s"(whale_events * $Fp) div total_events").as("share_fp"))
    }.reduce(_ unionByName _)
      // empty input: the global agg emits one all-null row per tier
      // where the oracle's JOIN+GROUP BY emits zero rows — drop them
      .filter(col("total_events").isNotNull)
      .orderBy(col("tier"))
  }

  def whaleConcentrationOracle: String =
    s"""WITH per AS MATERIALIZED (
       |  SELECT user_id, CAST(count(*) AS BIGINT) AS c
       |  FROM events GROUP BY 1
       |), ranked AS MATERIALIZED (
       |  SELECT c,
       |    CAST(row_number() OVER (ORDER BY c DESC, user_id) AS BIGINT) AS rn,
       |    CAST(count(*) OVER () AS BIGINT) AS n_users,
       |    CAST(SUM(c) OVER () AS BIGINT) AS total
       |  FROM per
       |), tiers(tier, den) AS (VALUES ('p1', 100), ('p10', 10))
       |SELECT tier, CAST(max(n_users) AS BIGINT) AS n_users,
       |  CAST(count(*) AS BIGINT) AS top_users,
       |  CAST(SUM(c) AS BIGINT) AS whale_events,
       |  CAST(max(total) AS BIGINT) AS total_events,
       |  (CAST(SUM(c) AS BIGINT) * $Fp) // CAST(max(total) AS BIGINT)
       |    AS share_fp
       |FROM ranked JOIN tiers ON rn <= (n_users + den - 1) // den
       |GROUP BY tier ORDER BY tier""".stripMargin

  // ───────────────────────────────────────────────────────── q203 ──

  /** q203 vocabulary width: the global top-K terms define the profile
    * space (deterministic tie order: count DESC, term ASC). */
  private val SourceCosTopK = 64

  /** Source term-profile similarity (q203): pairwise signed cos²
    * (×2²⁰) between per-source term-count vectors over the global
    * top-64 vocabulary — "which sources write about the same things",
    * the lexical companion to q165's embedding drift and q84's
    * shingle overlap. Same exact-arithmetic shape as q180: the one
    * corpus-scale pass is a map-side-combined (source, term) count;
    * the profile matrix is MODEL-sized (sources × 64) and collects to
    * the driver where BigInt computes cos² exactly (counts < 2²⁸
    * per cell keep dot < 2⁶² — the oracle's HUGEINT replay never
    * wraps either way). Diagonal = 2²⁰ exactly. */
  def sourceTermCosine(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("source"),
        explode(expr("filter(split(text, ' '), x -> length(x) > 0)"))
          .as("term"))
    val top = toks.groupBy(col("term")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term")).limit(SourceCosTopK)
      .select(col("term"))
    val cells = toks.join(broadcast(top), Seq("term"))
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val sources = cells.keys.map(_._1).toSeq.distinct.sorted
    val terms = cells.keys.map(_._2).toSeq.distinct.sorted
    val vec: Map[String, Array[Long]] = sources.map { src =>
      src -> terms.map(t => cells.getOrElse((src, t), 0L)).toArray
    }.toMap
    val rows = for {
      a <- sources; b <- sources if a <= b
    } yield {
      val (va, vb) = (vec(a), vec(b))
      val dot = va.indices.map(i => BigInt(va(i)) * vb(i)).sum
      val (n2a, n2b) = (va.map(x => BigInt(x) * x).sum,
        vb.map(x => BigInt(x) * x).sum)
      val cos2s =
        if (n2a == 0 || n2b == 0) BigInt(0)
        else dot.sign * ((dot * dot * Fp) / (n2a * n2b))
      (a, b, dot.toLong, cos2s.toLong)
    }
    s.createDataFrame(rows)
      .toDF("source_a", "source_b", "dot", "cos2s_fp")
      .orderBy(col("source_a"), col("source_b"))
  }

  def sourceTermCosineOracle: String =
    s"""WITH toks AS MATERIALIZED (
       |  SELECT source, tok AS term FROM (
       |    SELECT source, unnest(string_split(text, ' ')) AS tok
       |    FROM documents
       |  ) WHERE length(tok) > 0
       |), top AS MATERIALIZED (
       |  SELECT term FROM (
       |    SELECT term, count(*) AS n,
       |      row_number() OVER (ORDER BY count(*) DESC, term) AS rn
       |    FROM toks GROUP BY term
       |  ) WHERE rn <= $SourceCosTopK
       |), cells AS MATERIALIZED (
       |  SELECT source, t.term, CAST(count(*) AS BIGINT) AS c
       |  FROM toks t JOIN top ON top.term = t.term
       |  GROUP BY 1, 2
       |), srcs AS (SELECT DISTINCT source FROM cells),
       |grid AS MATERIALIZED (
       |  SELECT s.source, top.term, COALESCE(c.c, 0) AS c
       |  FROM srcs s CROSS JOIN top
       |  LEFT JOIN cells c ON c.source = s.source AND c.term = top.term
       |), dots AS (
       |  SELECT a.source AS sa, b.source AS sb,
       |    CAST(SUM(a.c * b.c) AS BIGINT) AS dot
       |  FROM grid a JOIN grid b ON b.term = a.term AND a.source <= b.source
       |  GROUP BY 1, 2
       |), n2 AS (
       |  SELECT source, CAST(SUM(c * c) AS BIGINT) AS n2 FROM grid GROUP BY 1
       |)
       |SELECT sa AS source_a, sb AS source_b, dot,
       |  CASE WHEN na.n2 = 0 OR nb.n2 = 0 THEN CAST(0 AS BIGINT)
       |    ELSE CAST((CASE WHEN dot < 0 THEN -1 ELSE 1 END) *
       |      ((CAST(dot AS HUGEINT) * dot * $Fp)
       |        // (CAST(na.n2 AS HUGEINT) * nb.n2)) AS BIGINT)
       |  END AS cos2s_fp
       |FROM dots
       |JOIN n2 na ON na.source = sa
       |JOIN n2 nb ON nb.source = sb
       |ORDER BY source_a, source_b""".stripMargin

  // ───────────────────────────────────────────────────────── q204 ──

  /** A/B experiment card (q204): users split into two arms by id
    * parity (the deterministic assignment a real experiment framework
    * would hash), per-arm purchase-conversion rates ×2²⁰, the signed
    * rate lift, and the exact Pearson χ² statistic of the 2×2
    * contingency table ×2²⁰:
    *
    *   χ² = N·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d))
    *
    * computed in arbitrary precision on the COLLECTED 2×2 table
    * (4 driver longs — the q137/q180 discipline; (ad−bc)² alone
    * reaches ~2¹²⁰ at scale, so BigInt here ≡ HUGEINT in the oracle,
    * and the emitted statistic is an exact BIGINT). The classical
    * α=0.05 threshold (3.84) is the consumer's constant.
    *
    * Shape at scale: one map-side-combined per-user conversion
    * aggregate, one 2-row arm rollup. */
  def abTestCard(s: SparkSession, d: String): DataFrame = {
    val per = Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("conv"))
      .groupBy((col("user_id") % 2).as("arm"))
      .agg(count(lit(1)).as("users"), sum(col("conv")).as("convs"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val (ua, ca) = per.getOrElse(0L, (0L, 0L))
    val (ub, cb) = per.getOrElse(1L, (0L, 0L))
    val (a, b2, c, d2) = (BigInt(ca), BigInt(ua - ca), BigInt(cb),
      BigInt(ub - cb))
    val n = a + b2 + c + d2
    val den = (a + b2) * (c + d2) * (a + c) * (b2 + d2)
    val diff = a * d2 - b2 * c
    val chi2 = if (den == 0) BigInt(0) else n * diff * diff * Fp / den
    val rateA = if (ua > 0) ca * Fp / ua else 0L
    val rateB = if (ub > 0) cb * Fp / ub else 0L
    val rows = Seq(
      ("arm_a_users", ua), ("arm_a_convs", ca), ("arm_a_rate_fp", rateA),
      ("arm_b_users", ub), ("arm_b_convs", cb), ("arm_b_rate_fp", rateB),
      ("lift_fp", rateB - rateA), ("chi2_fp", chi2.toLong))
    s.createDataFrame(rows).toDF("metric", "value").orderBy(col("metric"))
  }

  def abTestCardOracle: String =
    s"""WITH per AS MATERIALIZED (
       |  SELECT user_id % 2 AS arm, CAST(count(*) AS BIGINT) AS users,
       |    CAST(SUM(conv) AS BIGINT) AS convs
       |  FROM (
       |    SELECT user_id,
       |      MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
       |    FROM events GROUP BY user_id
       |  ) GROUP BY 1
       |), t AS (
       |  SELECT
       |    COALESCE(MAX(CASE WHEN arm = 0 THEN users END), 0) AS ua,
       |    COALESCE(MAX(CASE WHEN arm = 0 THEN convs END), 0) AS ca,
       |    COALESCE(MAX(CASE WHEN arm = 1 THEN users END), 0) AS ub,
       |    COALESCE(MAX(CASE WHEN arm = 1 THEN convs END), 0) AS cb
       |  FROM per
       |), h AS (
       |  SELECT CAST(ca AS HUGEINT) AS a, CAST(ua - ca AS HUGEINT) AS b,
       |    CAST(cb AS HUGEINT) AS c, CAST(ub - cb AS HUGEINT) AS d,
       |    ua, ca, ub, cb
       |  FROM t
       |)
       |SELECT metric, value FROM (
       |  SELECT 'arm_a_users' AS metric, CAST(ua AS BIGINT) AS value FROM h
       |  UNION ALL SELECT 'arm_a_convs', CAST(ca AS BIGINT) FROM h
       |  UNION ALL SELECT 'arm_a_rate_fp',
       |    CASE WHEN ua > 0 THEN CAST(ca * $Fp AS BIGINT) // ua ELSE 0 END FROM h
       |  UNION ALL SELECT 'arm_b_users', CAST(ub AS BIGINT) FROM h
       |  UNION ALL SELECT 'arm_b_convs', CAST(cb AS BIGINT) FROM h
       |  UNION ALL SELECT 'arm_b_rate_fp',
       |    CASE WHEN ub > 0 THEN CAST(cb * $Fp AS BIGINT) // ub ELSE 0 END FROM h
       |  UNION ALL SELECT 'lift_fp',
       |    (CASE WHEN ub > 0 THEN CAST(cb * $Fp AS BIGINT) // ub ELSE 0 END) -
       |    (CASE WHEN ua > 0 THEN CAST(ca * $Fp AS BIGINT) // ua ELSE 0 END)
       |    FROM h
       |  UNION ALL SELECT 'chi2_fp',
       |    CASE WHEN (a+b)*(c+d)*(a+c)*(b+d) = 0 THEN CAST(0 AS BIGINT)
       |      ELSE CAST((a+b+c+d) * (a*d - b*c) * (a*d - b*c) * $Fp
       |        // ((a+b)*(c+d)*(a+c)*(b+d)) AS BIGINT)
       |    END FROM h
       |) ORDER BY metric""".stripMargin

  // ───────────────────────────────────────────────────────── q205 ──

  /** Length-decile diversity calibration (q205): documents bucketed
    * into ten token-length deciles (thresholds from the q85 radix
    * walk — the q187 threshold discipline, ties to the low bucket),
    * each decile reporting its exact mean length and mean
    * distinct-token ratio ×2²⁰ — the BIAS CARD for any quality
    * filter: lexical-diversity scores fall mechanically with length,
    * so thresholding diversity without this curve silently deletes
    * long documents.
    *
    * Shape at scale: one tokenize pass to (len, distinct) per doc,
    * one radix walk for 9 thresholds, one bucket rollup. No windows
    * over row data. */
  def lengthDiversityCalibration(s: SparkSession, d: String): DataFrame = {
    val g = Tables.documents(s, d)
      .select(col("doc_id"),
        expr("filter(split(text, ' '), x -> length(x) > 0)").as("arr"))
      .select(col("doc_id"), size(col("arr")).cast("long").as("len"),
        size(array_distinct(col("arr"))).cast("long").as("nd"))
      .filter(col("len") > 0)
      .withColumn("d2", expr(s"(nd * $Fp) div len"))
      .localCheckpoint(true) // radix walk + rollup both read it
    val n = g.count()
    val ranks = (1L to 9L).map(k => (n * k + 9) / 10)
    val cutsMap = graft.datapipe.Quantiles.kthSmallestBatch(g, "len", ranks)
    val cuts = ranks.map(cutsMap)
    val bucket = cuts.map(t => when(col("len") > t, 1L).otherwise(0L))
      .reduce(_ + _) + 1L
    g.groupBy(bucket.as("decile"))
      .agg(count(lit(1)).as("n_docs"),
        expr("sum(len) div count(1)").as("mean_len"),
        expr("sum(d2) div count(1)").as("mean_distinct_fp"))
      .orderBy(col("decile"))
  }

  def lengthDiversityCalibrationOracle: String =
    s"""WITH g AS MATERIALIZED (
       |  SELECT doc_id, len, (nd * $Fp) // len AS d2 FROM (
       |    SELECT doc_id, CAST(count(*) AS BIGINT) AS len,
       |      CAST(count(DISTINCT tok) AS BIGINT) AS nd
       |    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
       |          FROM documents)
       |    WHERE length(tok) > 0 GROUP BY doc_id
       |  ) WHERE len > 0
       |), nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM g),
       |rk AS MATERIALIZED (
       |  SELECT len AS v, row_number() OVER (ORDER BY len) AS rn FROM g
       |), cuts AS MATERIALIZED (
       |  SELECT k.k, (SELECT v FROM rk
       |    WHERE rn = (SELECT (n * k.k + 9) // 10 FROM nn)) AS t
       |  FROM (VALUES (1), (2), (3), (4), (5), (6), (7), (8), (9)) k(k)
       |)
       |SELECT
       |  1 + (SELECT CAST(count(*) AS BIGINT) FROM cuts WHERE g.len > t)
       |    AS decile,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(len) AS BIGINT) // CAST(count(*) AS BIGINT) AS mean_len,
       |  CAST(SUM(d2) AS BIGINT) // CAST(count(*) AS BIGINT)
       |    AS mean_distinct_fp
       |FROM g GROUP BY 1 ORDER BY decile""".stripMargin

  // ───────────────────────────────────────────────────────── q206 ──

  /** q206 knobs: minimum daily mentions (kills one-off noise) and the
    * per-day leaderboard width. */
  private val TrendMinCount = 3L
  private val TrendTopK = 5

  /** Trending terms (q206): per day, the top-5 event-props tokens
    * whose share of that day's mentions most exceeds their share over
    * the TRAILING 7 days — the burst detector behind every "trending
    * now" surface, exact end to end:
    *
    *   burst_fp = (share_today ×2²⁰) ·2²⁰ div max(share_trailing ×2²⁰, 1)
    *
    * (a never-before-seen term divides by the 1 floor — maximal burst,
    * deterministically). "Terms" here are the integer `k` values in
    * the events `props` JSON (the only text the events table carries);
    * the operator is schema-generic.
    *
    * Shape at scale: (term, day) counts map-side combine; the
    * trailing baseline reuses the q184 bounded 7-way expand ON THE
    * AGGREGATE relation (each (term, day) count feeds ≤ 7 later
    * days); shares and the top-K window run day-keyed. Leaderboard
    * tie order is total: (burst DESC, n DESC, term ASC). */
  def trendingTerms(s: SparkSession, d: String): DataFrame =
    trendingFromCounts(termDayCountsOf(Tables.events(s, d)))

  /** The (term, day) count relation — shared with the streaming face
    * so both extract/bucket identically. */
  private[graft] def termDayCountsOf(ev: DataFrame): DataFrame =
    ev.select(expr("get_json_object(props, '$.k')").as("term"),
        expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00'," +
          " ts) div 86400000000").as("day"))
      .filter(col("term").isNotNull)
      .groupBy(col("term"), col("day")).agg(count(lit(1)).as("n"))

  /** q206's burst math on an explicit (term, day, n) relation — the
    * streaming snapshot runs THIS over its committed summed deltas,
    * so streaming ≡ batch is by construction. */
  private[graft] def trendingFromCounts(td0: DataFrame): DataFrame = {
    val td = td0
      .localCheckpoint(true) // feeds today, the trailing expand, and totals
    val byDay = Window.partitionBy(col("day"))
    val today = td
      .withColumn("day_total", sum(col("n")).over(byDay))
      .withColumn("share_fp", expr(s"(n * $Fp) div day_total"))
    // (term, day) contributes to the trailing window of days day+1..day+7
    val trail = td
      .select(col("term"),
        explode(expr("sequence(day + 1L, day + 7L)")).as("day"),
        col("n"))
      .groupBy(col("term"), col("day")).agg(sum(col("n")).as("tn"))
    val trailTotal = td
      .select(explode(expr("sequence(day + 1L, day + 7L)")).as("day"), col("n"))
      .groupBy(col("day")).agg(sum(col("n")).as("t_total"))
    val scored = today.filter(col("n") >= TrendMinCount)
      .join(trail, Seq("term", "day"), "left")
      .join(trailTotal, Seq("day"), "left")
      .withColumn("tshare_fp",
        expr(s"CASE WHEN t_total IS NULL OR t_total = 0 THEN 0L " +
          s"ELSE (coalesce(tn, 0L) * $Fp) div t_total END"))
      .withColumn("burst_fp",
        expr(s"(share_fp * $Fp) div greatest(tshare_fp, 1L)"))
    val w = Window.partitionBy(col("day"))
      .orderBy(col("burst_fp").desc, col("n").desc, col("term"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TrendTopK)
      .select(col("day"), col("rank"), col("term"), col("n"),
        col("share_fp"), col("tshare_fp"), col("burst_fp"))
      .orderBy(col("day"), col("rank"))
  }

  def trendingTermsOracle: String =
    s"""WITH td AS MATERIALIZED (
       |  SELECT json_extract_string(props, '$$.k') AS term,
       |    date_diff('microsecond', TIMESTAMP '1970-01-01 00:00:00', ts)
       |      // 86400000000 AS day,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM events
       |  WHERE json_extract_string(props, '$$.k') IS NOT NULL
       |  GROUP BY 1, 2
       |), today AS MATERIALIZED (
       |  SELECT term, day, n,
       |    CAST(SUM(n) OVER (PARTITION BY day) AS BIGINT) AS day_total
       |  FROM td
       |), trail AS MATERIALIZED (
       |  SELECT term, day + off AS day, CAST(SUM(n) AS BIGINT) AS tn
       |  FROM td CROSS JOIN (SELECT unnest(range(1, 8)) AS off)
       |  GROUP BY 1, 2
       |), ttot AS MATERIALIZED (
       |  SELECT day + off AS day, CAST(SUM(n) AS BIGINT) AS t_total
       |  FROM td CROSS JOIN (SELECT unnest(range(1, 8)) AS off)
       |  GROUP BY 1
       |), scored AS MATERIALIZED (
       |  SELECT t.day, t.term, t.n,
       |    (t.n * $Fp) // t.day_total AS share_fp,
       |    CASE WHEN tt.t_total IS NULL OR tt.t_total = 0 THEN 0
       |      ELSE (COALESCE(tr.tn, 0) * $Fp) // tt.t_total
       |    END AS tshare_fp
       |  FROM today t
       |  LEFT JOIN trail tr ON tr.term = t.term AND tr.day = t.day
       |  LEFT JOIN ttot tt ON tt.day = t.day
       |  WHERE t.n >= $TrendMinCount
       |)
       |SELECT day, rank, term, n, share_fp,
       |  CAST(tshare_fp AS BIGINT) AS tshare_fp,
       |  CAST(burst_fp AS BIGINT) AS burst_fp
       |FROM (
       |  SELECT *,
       |    (share_fp * $Fp) // greatest(tshare_fp, 1) AS burst_fp,
       |    CAST(row_number() OVER (PARTITION BY day ORDER BY
       |      (share_fp * $Fp) // greatest(tshare_fp, 1) DESC, n DESC, term)
       |      AS BIGINT) AS rank
       |  FROM scored
       |) WHERE rank <= $TrendTopK
       |ORDER BY day, rank""".stripMargin

  def labelCentroidMatrixOracle: String = {
    val qf = graft.datapipe.Embeddings.Fp
    s"""WITH c AS MATERIALIZED (
       |  SELECT CAST(label AS BIGINT) AS label,
       |    generate_subscripts(embedding, 1) - 1 AS pos,
       |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * $qf + 0.5) AS BIGINT) AS xq
       |  FROM embeddings
       |), sm AS MATERIALIZED (
       |  SELECT label, pos, CAST(SUM(xq) AS BIGINT) AS sx FROM c GROUP BY 1, 2
       |), nn AS (
       |  SELECT CAST(label AS BIGINT) AS label, CAST(count(*) AS BIGINT) AS n
       |  FROM embeddings GROUP BY 1
       |), m AS MATERIALIZED (
       |  SELECT sm.label, pos, sx // nn.n AS mv
       |  FROM sm JOIN nn ON nn.label = sm.label
       |), dt AS (
       |  SELECT a.label AS la, b.label AS lb,
       |    CAST(SUM(a.mv * b.mv) AS BIGINT) AS dot
       |  FROM m a JOIN m b ON b.pos = a.pos AND a.label <= b.label
       |  GROUP BY 1, 2
       |), n2 AS (
       |  SELECT label, CAST(SUM(mv * mv) AS BIGINT) AS n2 FROM m GROUP BY 1
       |)
       |SELECT la AS label_a, lb AS label_b, dot, na.n2 AS n2_a, nb.n2 AS n2_b,
       |  CASE WHEN na.n2 = 0 OR nb.n2 = 0 THEN CAST(0 AS BIGINT)
       |    ELSE CAST((CASE WHEN dot < 0 THEN -1 ELSE 1 END) *
       |      ((CAST(dot AS HUGEINT) * dot * $Fp)
       |        // (CAST(na.n2 AS HUGEINT) * nb.n2)) AS BIGINT)
       |  END AS cos2s_fp
       |FROM dt
       |JOIN n2 na ON na.label = la
       |JOIN n2 nb ON nb.label = lb
       |ORDER BY label_a, label_b""".stripMargin
  }
}
