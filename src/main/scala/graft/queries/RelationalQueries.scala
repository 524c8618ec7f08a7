package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.util.Tables

/** Generic relational query surface (SURVEY.md §2.3-§2.6, §3.3).
  *
  * The reference's query side is Elasticsearch (filter/agg/co-occurrence
  * over enriched collections); here the same shapes are Spark SQL over
  * parquet tables. Every query is paired with a DuckDB oracle in
  * [[graft.SparkEntry.oracleSql]].
  *
  * Hash-compare discipline: money sums go through DECIMAL casts (exact,
  * order-insensitive) and back to DOUBLE; ratios are emitted as integer
  * numerator/denominator; every query ends in a deterministic total
  * ORDER BY.
  *
  * Scale notes (100 TB): filters precede joins so pushdown reaches the
  * scan; dimension tables (nation/region/customer-at-SF1) are broadcast;
  * the only wide shuffles are the groupBy keys themselves. AQE handles
  * skew/partition coalescing at the real scale.
  */
object RelationalQueries {

  /** Exact decimal sum of a money expression, surfaced as double.
    * Per-row double arithmetic is IEEE-identical across engines; the
    * decimal cast makes the *sum* order-insensitive so hashes match.
    */
  private def moneySum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast("decimal(18,4)")).cast("double")

  /** TPC-H Q1 shape: scan-heavy filtered aggregation (A5). */
  def q1PricingSummary(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).cast("double").as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Multi-way join + agg: revenue per nation; dims broadcast (J1 analog). */
  def q2RevenueByNation(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    val l = Tables.lineitem(s, d)
    val n = Tables.nation(s, d)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("n_name"))
  }

  /** Top-k by aggregated measure (TPC-H Q3 shape; W-family). */
  def q3TopOrders(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).filter(col("o_orderstatus") =!= lit("F"))
    val l = Tables.lineitem(s, d)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Latest-record-per-key window — the reference's GetLatestVersion
    * pattern (SURVEY §2.4 A2 / §2.5 W1) on the events table. */
  def q4LatestEventPerUser(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_event_type"))
      .orderBy(col("user_id"))
  }

  /** Semi + anti join — the tombstone pattern (SURVEY §2.3 J2):
    * customers that ordered but never with status 'F'. */
  def q5SemiAnti(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .join(o.filter(col("o_orderstatus") === "F"),
        c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Self co-occurrence — the LINK adjacency-matrix aggregation
    * (SURVEY §2.3 J4): part pairs appearing in the same order.
    *
    * Formulated as collect-per-key + in-map pair generation (the
    * minhash-bucket pattern) instead of a self-join: one shuffle of the
    * fact table by key, pairs expand inside the map stage via
    * higher-order array functions (codegen), then one shuffle of the
    * pair counts. A self-join of the fact table with itself either
    * broadcasts the full table (what Catalyst picks at test scale —
    * impossible at 100 TB) or shuffles it twice into a sort-merge join;
    * this shape does neither. Top-100 lands in TakeOrderedAndProject
    * (no extra shuffle). */
  def q6CoOccurrence(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
    l.groupBy(col("l_orderkey"))
      .agg(collect_list(col("l_partkey")).as("parts"))
      .select(explode(graft.functions.ArrayPairs.orderedPairs(col("parts"))).as("pr"))
      .filter(col("pr._1") < col("pr._2"))
      .groupBy(col("pr._1").as("p1"), col("pr._2").as("p2"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("p1"), col("p2"))
      .limit(100)
  }

  /** Rollup aggregation (grouping sets family, SURVEY §2.4 note). */
  def q7Rollup(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).cast("double").as("qty"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
  }

  /** Tumbling-window event aggregation (streaming-shaped, run as batch). */
  def q8EventsHourly(s: SparkSession, d: String): DataFrame = {
    Tables.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("total_value"))
      .orderBy(col("hour"), col("event_type"))
  }

  /** Union + distinct (SURVEY §2.6 U1/U2): order keys seen in either
    * high-value orders or recent lineitems. */
  def q9UnionDistinct(s: SparkSession, d: String): DataFrame = {
    val highOrders = Tables.orders(s, d)
      .filter(col("o_totalprice") > 400000.0)
      .select(col("o_orderkey").as("okey"))
    val recent = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1998-06-01"))
      .select(col("l_orderkey").as("okey"))
    highOrders.unionByName(recent).distinct().orderBy(col("okey"))
  }

  /** Left outer join preserving customers with zero orders. */
  def q21OuterJoin(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy(col("c_custkey"))
  }

  /** Multiple distinct aggregations (expand-based plan). */
  def q22DistinctAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  /** Correlated EXISTS via the spark.sql surface (subquery decorrelation
    * is Catalyst's job — SURVEY §4). */
  def q23ExistsSubquery(s: SparkSession, d: String): DataFrame = {
    Tables.supplier(s, d).createOrReplaceTempView("g_supplier")
    Tables.lineitem(s, d).createOrReplaceTempView("g_lineitem")
    s.sql("""
      SELECT s_suppkey, s_name FROM g_supplier
      WHERE EXISTS (SELECT 1 FROM g_lineitem
                    WHERE l_suppkey = s_suppkey AND l_quantity >= 49)
      ORDER BY s_suppkey""")
  }

  /** CUBE grouping sets. */
  def q24Cube(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  /** Conditional aggregation (CASE WHEN inside SUM). */
  def q25CaseAgg(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(sum(when(col("o_totalprice") > 200000.0, 1).otherwise(0)).as("n_big"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))

  /** Exact percentile aggregation (median of integer-valued doubles is
    * engine-exact: sorted interpolation of exactly-representable values). */
  def q27Percentile(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_quantity, 0.5)").as("median_qty"),
        expr("percentile(l_quantity, 0.9)").as("p90_qty"))
      .orderBy(col("l_returnflag"))

  /** String function family: case, substring, concat, trim, replace. */
  def q28StringFuncs(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_upper"),
        substring(col("p_type"), 1, 5).as("type_prefix"),
        concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
        length(regexp_replace(col("p_name"), " ", "")).cast("long").as("name_len_nospace"),
        reverse(col("p_brand")).as("brand_rev"))
      .orderBy(col("p_partkey"))

  /** Date/time function family over order dates. */
  def q29DateFuncs(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(year(col("o_orderdate")).as("y"), quarter(col("o_orderdate")).as("q"))
      .agg(count(lit(1)).as("n"),
        min(dayofmonth(col("o_orderdate"))).as("min_dom"),
        max(month(col("o_orderdate"))).as("max_month"))
      .orderBy(col("y"), col("q"))

  /** Running/frame window functions: cumulative count + spend, lag/lead
    * neighbors per customer. Ordering key (o_orderdate, o_orderkey) is
    * unique per partition, so the default RANGE frame has no peer rows
    * and both engines' prefix sums are identical; the running decimal
    * sum is order-sensitive but exact. */
  def q30WindowRunning(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d).select(
      col("o_custkey"), col("o_orderkey"),
      row_number().over(w).cast("long").as("order_seq"),
      sum(col("o_totalprice").cast("decimal(18,4)")).over(w)
        .cast("double").as("running_spend"),
      lag(col("o_orderkey"), 1).over(w).as("prev_orderkey"),
      lead(col("o_orderkey"), 1).over(w).as("next_orderkey"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Ranking window family: ntile, rank, dense_rank, percent_rank.
    * percent_rank = (rank-1)/(n-1) — the same two-integer division on
    * both engines, hence bit-identical.
    *
    * Scale note: these windows are deliberately GLOBAL — the query
    * demonstrates the native form of whole-table ranking, which Spark
    * executes as a single-task sort. At 100 TB a global rank goes
    * through deterministic value bands + per-band count offsets
    * instead — [[graft.datapipe.Packing.mixtureSchedule]] implements
    * exactly that decomposition (rank = band-local row_number +
    * offset), and the same trick applies to any of these functions
    * (ntile/percent_rank additionally need the O(1) global count). */
  def q31RankNtile(s: SparkSession, d: String): DataFrame = {
    val byPrice = Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val byPrio = Window.orderBy(col("o_orderpriority"))
    Tables.orders(s, d).select(
      col("o_orderkey"),
      ntile(4).over(byPrice).cast("long").as("price_quartile"),
      rank().over(byPrio).cast("long").as("prio_rank"),
      dense_rank().over(byPrio).cast("long").as("prio_dense_rank"),
      percent_rank().over(byPrice).as("price_pct_rank"))
      .orderBy(col("o_orderkey"))
  }

  /** INTERSECT / EXCEPT set operations (distinct semantics on both
    * engines): customers with an open order and a >100k order, minus
    * anyone with a failed order. */
  def q32SetOps(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val open = o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
    val big = o.filter(col("o_totalprice") > 100000.0).select(col("o_custkey"))
    val failed = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    open.intersect(big).except(failed).orderBy(col("o_custkey"))
  }

  /** Generator/explode + aggregation: top-100 tokens across documents
    * (the flatMap→count shape of the reference's term counting, run
    * distributed instead of per-row). */
  def q33TokenCounts(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok"))
      .limit(100)

  private val pivotPriorities = Seq(
    "1-URGENT" -> "p1_urgent", "2-HIGH" -> "p2_high", "3-MEDIUM" -> "p3_medium",
    "4-NOT SPECIFIED" -> "p4_not_specified", "5-LOW" -> "p5_low")

  /** Pivot (wide conditional aggregation): order counts per year ×
    * priority. Fixed pivot values; empty cells coalesced to 0 to match
    * the oracle's SUM(CASE). */
  def q34Pivot(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d)
      .groupBy(year(col("o_orderdate")).as("y"))
      .pivot("o_orderpriority", pivotPriorities.map(_._1))
      .agg(count(lit(1)))
    base.select(
      (col("y") +: pivotPriorities.map { case (v, alias) =>
        coalesce(col(s"`$v`"), lit(0L)).as(alias)
      }): _*)
      .orderBy(col("y"))
  }

  def q34PivotOracle: String = {
    val cases = pivotPriorities.map { case (v, alias) =>
      s"CAST(SUM(CASE WHEN o_orderpriority = '$v' THEN 1 ELSE 0 END) AS BIGINT) AS $alias"
    }.mkString(",\n ")
    s"""SELECT CAST(year(o_orderdate) AS INT) AS y,
       | $cases
       |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** Explicit GROUPING SETS with grouping_id (beyond q7/q24's
    * rollup/cube). */
  def q35GroupingSets(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d).createOrReplaceTempView("g_lineitem_gs")
    s.sql("""
      SELECT l_returnflag, l_linestatus,
        CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        COUNT(*) AS n, CAST(SUM(l_quantity) AS DOUBLE) AS qty
      FROM g_lineitem_gs
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                              (l_returnflag, l_linestatus), ())
      ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")
  }

  /** Date-range theta join: lineitems shipped within 30 days of their
    * order's date (equi key + range predicate — Catalyst plans the equi
    * part as the join key and the range as a post-filter, so no
    * nested-loop explosion). */
  def q36RangeJoin(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate"))
    val l = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
    o.join(l, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") >= col("o_orderdate") &&
        col("l_shipdate") <= date_add(col("o_orderdate"), 30))
      .groupBy(col("o_orderkey")).agg(count(lit(1)).as("n_shipped_30d"))
      .orderBy(col("o_orderkey"))
  }

  /** As-of join shape: each purchase event joined to the most recent
    * strictly-prior click of the same user — last(ignoreNulls) over a
    * [unbounded, -1] row frame, the window formulation of as-of (one
    * shuffle by user, no range self-join). */
  def q37AsofPrevClick(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, d)
      .withColumn("prev_click_id",
        last(when(col("event_type") === "click", col("event_id")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("prev_click_id"))
      .orderBy(col("event_id"))
  }

  /** Ordered string aggregation (listagg shape): deterministic via
    * array_sort before joining — collect_list order is not. */
  def q38ListAgg(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(array_join(array_sort(collect_list(col("o_orderstatus"))), ",").as("statuses"),
        count(lit(1)).as("n"))
      .orderBy(col("o_custkey"))

  /** Multiset (bag-semantics) set operations: INTERSECT ALL / EXCEPT
    * ALL preserve duplicate multiplicities, unlike q32's distinct
    * forms. */
  def q41SetOpsAll(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
    val shipped = l.filter(col("l_shipdate") >= lit("1998-01-01"))
      .select(col("l_orderkey").as("okey"))
    val returned = l.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("okey"))
    val filled = l.filter(col("l_linestatus") === "F")
      .select(col("l_orderkey").as("okey"))
    shipped.intersectAll(returned).exceptAll(filled)
      .groupBy(col("okey")).agg(count(lit(1)).as("n"))
      .orderBy(col("okey"))
  }

  /** JSON scalar functions (SURVEY §2.7 F4/F5 on the query surface):
    * from_json with an explicit schema AND get_json_object path
    * extraction over the events.props JSON column, aggregated. */
  def q39JsonFuncs(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val propsSchema = StructType(Seq(StructField("k", LongType)))
    Tables.events(s, d)
      .select(col("event_type"),
        from_json(col("props"), propsSchema).getField("k").as("k"),
        get_json_object(col("props"), "$.k").cast("long").as("k2"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_k"),
        sum(col("k")).as("sum_k"),
        min(col("k2")).as("min_k"),
        max(col("k2")).as("max_k"))
      .orderBy(col("event_type"))
  }

  /** Full outer join with null-safe key equality (<=>): per-nation
    * customer counts vs (filtered) supplier counts. The filter drops
    * most nations from the supplier side so real outer rows appear;
    * COALESCE folds both null sides. */
  def q42FullOuter(s: SparkSession, d: String): DataFrame = {
    val cn = Tables.customer(s, d)
      .groupBy(col("c_nationkey").as("cnk"))
      .agg(count(lit(1)).as("n_cust"))
    val sn = Tables.supplier(s, d)
      .filter(col("s_acctbal") > 9000.0)
      .groupBy(col("s_nationkey").as("snk"))
      .agg(count(lit(1)).as("n_supp"))
    cn.join(sn, col("cnk") <=> col("snk"), "full_outer")
      .select(coalesce(col("cnk"), col("snk")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy(col("nationkey"))
  }

  /** Positional explode (posexplode generator): first five tokens of
    * every document with their 0-based position. */
  def q43Posexplode(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .filter(col("pos") < 5)
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("col").as("tok"))
      .orderBy(col("doc_id"), col("pos"))

  /** Higher-order array functions — transform / filter / aggregate /
    * array_max / array_sort — all native Catalyst expressions: no UDF
    * or encoder boundary, no shuffle; one narrow Project over the
    * pruned scan (HOF lambdas are CodegenFallback, but stay inside the
    * columnar pipeline). */
  def q44ArrayHof(s: SparkSession, d: String): DataFrame = {
    val toks = split(col("text"), " ")
    val lens = transform(toks, t => length(t).cast("long"))
    Tables.documents(s, d)
      .select(col("doc_id"),
        size(toks).cast("long").as("n_toks"),
        size(filter(toks, t => length(t) > 4)).cast("long").as("n_long_toks"),
        aggregate(lens, lit(0L), (acc, x) => acc + x).as("total_chars"),
        array_max(lens).as("max_tok_len"),
        element_at(array_sort(toks), 1).as("first_tok_sorted"))
      .orderBy(col("doc_id"))
  }

  /** Correlated scalar subquery (decorrelated by Catalyst into an
    * aggregate + left outer join — SURVEY §4): total lineitem quantity
    * per part, 0 for parts never ordered. */
  def q46ScalarSubquery(s: SparkSession, d: String): DataFrame = {
    Tables.part(s, d).createOrReplaceTempView("g_part")
    Tables.lineitem(s, d).createOrReplaceTempView("g_lineitem_sq")
    s.sql("""
      SELECT p_partkey, p_brand,
        (SELECT COALESCE(CAST(SUM(l_quantity) AS DOUBLE), 0.0)
         FROM g_lineitem_sq WHERE l_partkey = p_partkey) AS total_qty
      FROM g_part ORDER BY p_partkey""")
  }

  /** Regular-expression function family: extract-all count, anchored
    * group extract, word-boundary match flag. Patterns stay in the
    * RE2/Java common subset so both engines agree. */
  def q47RegexpFuncs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit("[aeiou]+"), lit(0)))
          .cast("long").as("n_vowel_runs"),
        regexp_extract(col("text"), "^([a-z]+)", 1).as("first_word"),
        when(col("text").rlike("ing\\b"), 1L).otherwise(0L).as("has_ing"))
      .orderBy(col("doc_id"))

  /** Deterministic hash sampling: engine-portable ~1/16 sample keyed on
    * md5(o_orderkey) — the reproducible-sampling primitive a training
    * pipeline uses for held-out splits (TABLESAMPLE is seed-dependent
    * per engine; a content hash is not). */
  def q48HashSample(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(substring(md5(col("o_orderkey").cast("string")), 1, 1) === "0")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        moneySum(col("o_totalprice")).as("sample_revenue"))
      .orderBy(col("o_orderstatus"))

  /** RANGE-frame window (value-based, not row-based): trailing-30-day
    * order count and spend per customer, ordered by day number so the
    * frame is numeric on both engines. */
  def q49WindowRangeFrame(s: SparkSession, d: String): DataFrame = {
    val dayNum = datediff(col("o_orderdate"), lit("1970-01-01"))
    val w = Window.partitionBy(col("o_custkey")).orderBy(dayNum)
      .rangeBetween(-30, Window.currentRow)
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        count(lit(1)).over(w).as("n_last_30d"),
        sum(col("o_totalprice").cast("decimal(18,4)")).over(w)
          .cast("double").as("spend_30d"))
      .orderBy(col("o_orderkey"))
  }

  /** Map-typed column functions: parse the JSON props column into a
    * map, then map_keys / size / element_at. */
  def q50MapFuncs(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{MapType, StringType}
    val m = from_json(col("props"), MapType(StringType, StringType))
    Tables.events(s, d)
      .select(col("event_id"),
        size(map_keys(m)).cast("long").as("n_keys"),
        array_join(array_sort(map_keys(m)), ",").as("keys_sorted"),
        element_at(m, "k").as("k_val"))
      .orderBy(col("event_id"))
  }

  /** Cartesian product (explicit cross join) of two small dims. */
  def q51CrossJoin(s: SparkSession, d: String): DataFrame =
    Tables.nation(s, d).crossJoin(Tables.region(s, d))
      .select(col("n_name"), col("r_name"))
      .orderBy(col("n_name"), col("r_name"))

  /** Correlated-scalar shape (TPC-H Q17-like): lineitems below 20% of
    * the part's average quantity. */
  def q10AvgQtyFilter(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
    val avgQ = l.groupBy(col("l_partkey").as("ap"))
      .agg((avg(col("l_quantity")) * 0.2).as("thresh"))
    l.join(avgQ, col("l_partkey") === col("ap"))
      .filter(col("l_quantity") < col("thresh"))
      .agg(moneySum(col("l_extendedprice")).as("total_price"),
        count(lit(1)).as("n"))
  }
}
