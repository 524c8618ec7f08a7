package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** q172 itemset rules + q173 MAD anomaly: the DuckDB oracle gate
  * proves cross-engine agreement on the full chain; this spec drives
  * the semantic corners the bench corpus can't guarantee to contain —
  * hand-built baskets with a known rule, a spike a mean-based score
  * would mask, and the MAD=0 constant series.
  */
class AnalyticsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"
  private val Fp = 1L << 20

  test("q172: hand-built baskets yield exact support/confidence/lift") {
    import spark.implicits._
    // 6 orders; {1,2} co-occur 3x, item 1 in 4, item 2 in 3, item 3 in 2.
    val b = Seq(
      (10L, 1L), (10L, 2L), (20L, 1L), (20L, 2L), (30L, 1L), (30L, 2L),
      (40L, 1L), (40L, 3L), (50L, 3L), (60L, 4L)
    ).toDF("l_orderkey", "l_partkey")
      .withColumn("pad", org.apache.spark.sql.functions.lit(0))
    val dir = java.nio.file.Files.createTempDirectory("itemsets").toString
    b.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rules = AnalyticsQueries.itemsetRules(spark, dir, minSup = 2L)
      .collect()
    assert(rules.length == 1, "only {1,2} reaches support 2")
    val r = rules.head
    assert((r.getLong(0), r.getLong(1)) == (1L, 2L))
    assert(r.getLong(2) == 3L && r.getLong(3) == 4L && r.getLong(4) == 3L)
    assert(r.getLong(5) == 3L * Fp / 4L, "conf(1->2) = 3/4")
    assert(r.getLong(6) == 3L * Fp / 3L, "conf(2->1) = 3/3")
    // lift = conf_a_fp * nOrders / sup_b = (3fp/4)*6/3 = 1.5fp
    assert(r.getLong(7) == (3L * Fp / 4L) * 6L / 3L)
    assert(r.getLong(7) > Fp, "positively-correlated pair has lift > 1")
  }

  test("q172: duplicate lineitem rows collapse to one basket membership") {
    import spark.implicits._
    val b = Seq((10L, 1L), (10L, 1L), (10L, 2L), (20L, 1L), (20L, 2L))
      .toDF("l_orderkey", "l_partkey")
    val dir = java.nio.file.Files.createTempDirectory("itemsets2").toString
    b.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = AnalyticsQueries.itemsetRules(spark, dir, minSup = 2L).collect()
    assert(r.length == 1 && r.head.getLong(2) == 2L,
      "support counts orders, not lineitem rows")
    assert(r.head.getLong(3) == 2L, "item support deduped per order")
  }

  test("q173: a spike is flagged; the constant series (MAD=0) is not") {
    import spark.implicits._
    val base = java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0)
    def at(h: Int, i: Int) =
      base.plusHours(h.toLong).plusSeconds(i.toLong)
    // "steady": hourly counts 2,2,2,2,2,2,2,2 -> MAD 0, never anomalous.
    // "spiky":  counts 1,1,1,1,2,2,2,40 -> med 1, MAD (devs 0,0,0,0,1,1,1,39
    //           sorted -> lower median rank 4 = 0 ... careful) use 9 hours.
    val rows = (0 until 8).flatMap { h =>
      (0 until 2).map(i => (h.toLong * 2 + i, at(h, i), 1L, "steady", 0.0, "{}"))
    } ++ {
      val counts = Seq(1, 1, 1, 2, 2, 2, 3, 3, 40)
      counts.zipWithIndex.flatMap { case (c, h) =>
        (0 until c).map(i => (1000L + h * 100 + i, at(h, i), 2L, "spiky", 0.0, "{}"))
      }
    }
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("mad").toString
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = AnalyticsQueries.madAnomaly(spark, dir, threshold = 4L)
      .collect()
    val steady = out.filter(_.getString(0) == "steady")
    assert(steady.forall(!_.getBoolean(6)), "constant series never anomalous")
    assert(steady.forall(r => r.getLong(4) == 0L), "steady MAD is 0")
    val spiky = out.filter(_.getString(0) == "spiky")
    // counts sorted: 1,1,1,2,2,2,3,3,40 -> lower median rank 5 = 2
    assert(spiky.forall(_.getLong(3) == 2L), "spiky median is 2")
    // devs: 1,1,1,0,0,0,1,1,38 sorted 0,0,0,1,1,1,1,1,38 -> rank 5 = 1
    assert(spiky.forall(_.getLong(4) == 1L), "spiky MAD is 1")
    val flagged = spiky.filter(_.getBoolean(6))
    assert(flagged.length == 1 && flagged.head.getLong(2) == 40L,
      "exactly the 40-count hour is >= 4 MADs out")
    assert(flagged.head.getLong(5) == 38L * Fp, "score = dev*fp/MAD exactly")
  }

  test("q177: frontier equals the brute-force dominance check at sf0.001") {
    import org.apache.spark.sql.functions._
    val g = graft.util.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        expr("filter(split(text, ' '), x -> length(x) > 0)").as("arr"))
      .select(col("doc_id"), size(col("arr")).cast("long").as("d1"),
        size(array_distinct(col("arr"))).cast("long").as("nd"))
      .filter(col("d1") > 0)
      .withColumn("d2", expr(s"(nd * $Fp) div d1"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val brute = g.filter { case (_, d1, d2) =>
      !g.exists { case (_, e1, e2) =>
        e1 >= d1 && e2 >= d2 && (e1 > d1 || e2 > d2)
      }
    }.map(_._1).toSet
    val got = AnalyticsQueries.paretoFrontier(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    assert(got == brute, "window-based skyline == O(n^2) dominance filter")
    assert(got.nonEmpty)
  }

  test("q178: decay boundaries — same week, exactly 7 days, deep past") {
    import spark.implicits._
    val mx = java.time.LocalDateTime.of(2024, 6, 1, 0, 0, 0)
    val rows = Seq(
      (1L, mx, 10L, "view", 0.0, "{}"),                         // age 0 -> Fp
      (2L, mx.minusDays(7), 10L, "view", 0.0, "{}"),            // 1 week -> Fp/2
      (3L, mx.minusDays(7).plusNanos(1000), 11L, "view", 0.0, "{}"), // just under -> Fp
      (4L, mx.minusWeeks(45), 12L, "view", 0.0, "{}"))          // cap -> 0
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("decay").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = AnalyticsQueries.decayedEngagement(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(10L) == ((2L, Fp + Fp / 2)), "age 0 + exactly-one-week")
    assert(out(11L) == ((1L, Fp)), "1us inside the week boundary")
    assert(out(12L) == ((1L, 0L)), "45 weeks decays to exact zero")
  }

  test("q179: exact credit split, remainder to earliest, direct fallback") {
    import spark.implicits._
    val t0 = java.time.LocalDateTime.of(2024, 3, 10, 12, 0, 0)
    val rows = Seq(
      // user 1: 3 touches then a purchase -> Fp split 3 ways, rem to earliest
      (1L, t0.minusHours(3), 1L, "view", 0.0, "{}"),
      (2L, t0.minusHours(2), 1L, "click", 0.0, "{}"),
      (3L, t0.minusHours(1), 1L, "view", 0.0, "{}"),
      (4L, t0, 1L, "purchase", 0.0, "{}"),
      // user 2: touch exactly 7 days before (included) + one 1us too old
      (5L, t0.minusDays(7), 2L, "click", 0.0, "{}"),
      (6L, t0.minusDays(7).minusNanos(1000), 2L, "view", 0.0, "{}"),
      (7L, t0, 2L, "purchase", 0.0, "{}"),
      // user 3: no touches -> direct
      (8L, t0, 3L, "purchase", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("attr").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = AnalyticsQueries.attribution(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val third = Fp / 3
    // user1: view gets earliest (rem) + one more view; click one share.
    assert(out("click") == ((2L, 2L, third + Fp)),
      "user1 click share + user2's exactly-7-day click (full credit)")
    assert(out("view") == ((2L, 1L, third + (Fp % 3) + third)))
    assert(out("direct") == ((0L, 1L, Fp)))
    assert(out.values.map(_._3).sum == 3L * Fp,
      "total credit == n_purchases * Fp exactly")
  }

  test("q180: diagonal is exactly Fp; matrix covers all label pairs") {
    val out = AnalyticsQueries.labelCentroidMatrix(spark, sfDir).collect()
    val labels = out.map(_.getLong(0)).toSet ++ out.map(_.getLong(1)).toSet
    assert(out.length == labels.size * (labels.size + 1) / 2)
    out.filter(r => r.getLong(0) == r.getLong(1)).foreach { r =>
      assert(r.getLong(5) == Fp, s"diagonal cos2 must be 2^20: $r")
      assert(r.getLong(2) == r.getLong(3) && r.getLong(3) == r.getLong(4))
    }
    out.foreach(r => assert(math.abs(r.getLong(5)) <= Fp))
  }

  test("q181: planted violations are each counted by exactly one check") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dq").toString
    // orders 1..3; order 3 childless. lineitem: orphan okey 99,
    // duplicate (1,1) linekey, one non-positive qty, one null-ish? (no
    // null shipdate in fixture -> that check reads 0).
    Seq((1L, 10L), (2L, 11L), (3L, 12L)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val ts = java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
    Seq(
      (1L, 1, 5.0, ts), (1L, 1, 5.0, ts), // dup linekey
      (2L, 1, -2.0, ts),                  // non-positive qty
      (99L, 1, 1.0, ts))                  // orphan
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = AnalyticsQueries.dqCard(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out("lineitem_orphans") == ((1L, 4L, Fp / 4)))
    assert(out("lineitem_dup_linekey") == ((1L, 4L, Fp / 4)))
    assert(out("lineitem_qty_nonpos") == ((1L, 4L, Fp / 4)))
    assert(out("lineitem_null_shipdate") == ((0L, 4L, 0L)))
    assert(out("orders_childless") == ((1L, 3L, Fp / 3)))
  }

  test("q182: exact slope on a planted linear series; degenerate guards") {
    import spark.implicits._
    val base = java.time.LocalDateTime.of(2024, 2, 1, 0, 0)
    def mk(tpe: String, hour: Int, n: Int, idBase: Long) =
      (0 until n).map(i =>
        (idBase + hour * 100 + i, base.plusHours(hour.toLong), 1L, tpe, 0.0, "{}"))
    val rows =
      (0 until 4).flatMap(h => mk("lin", h, h + 1, 0L)) ++      // y = x+1
      (0 until 3).flatMap(h => mk("flat", h, 5, 10000L)) ++     // slope 0
      mk("once", 2, 7, 20000L)                                  // one hour
    val dir = java.nio.file.Files.createTempDirectory("trend").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = AnalyticsQueries.typeTrend(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out("lin") == ((4L, 10L, Fp)), "unit slope is exactly 2^20")
    assert(out("flat") == ((3L, 15L, 0L)))
    assert(out("once") == ((1L, 7L, 0L)), "zero-variance guard")
  }

  test("q183: quartiles hit the ceil-rank order statistics exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("quart").toString
    // source A: lengths 1,2,3,4 -> p25@k1=1, p50@k2=2, p75@k3=3
    // source B: lengths 5,5,9   -> p25@k1=5, p50@k2=5, p75@k3=9 (ties)
    def doc(id: Long, src: String, len: Int) =
      (id, (1 to len).map(i => s"t$i").mkString(" "), "en", src, 1L)
    val rows = Seq(doc(1, "A", 1), doc(2, "A", 2), doc(3, "A", 3),
      doc(4, "A", 4), doc(5, "B", 5), doc(6, "B", 5), doc(7, "B", 9))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = AnalyticsQueries.sourceQuartiles(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(("A", "p25")) == ((1L, 1L)))
    assert(out(("A", "p50")) == ((2L, 2L)))
    assert(out(("A", "p75")) == ((3L, 3L)))
    assert(out(("B", "p25")) == ((1L, 5L)))
    assert(out(("B", "p50")) == ((2L, 5L)))
    assert(out(("B", "p75")) == ((3L, 9L)))
  }

  test("q184: trailing-7-day WAU window; DAU/WAU hits 2^20 on overlap") {
    import spark.implicits._
    val d0 = java.time.LocalDateTime.of(2024, 5, 1, 12, 0)
    val rows = Seq(
      (1L, d0, 1L, "view", 0.0, "{}"),                 // u1 day0
      (2L, d0.plusDays(3), 1L, "view", 0.0, "{}"),     // u1 day3
      (3L, d0.plusDays(3), 2L, "view", 0.0, "{}"),     // u2 day3
      (4L, d0.plusDays(11), 2L, "view", 0.0, "{}"))    // u2 day11 (window reset)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("stick").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = AnalyticsQueries.stickiness(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length == 3, "one row per ACTIVE day only")
    assert(out(0) == ((1L, 1L, Fp)), "day0: u1 only, window has u1 only")
    assert(out(1) == ((2L, 2L, Fp)), "day3: both active, both in window")
    assert(out(2) == ((1L, 1L, Fp)), "day11: day3 activity aged out")
  }

  test("q185: Gini is 0 for equal mass, 2/3 for a planted extreme") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("gini").toString
    def doc(id: Long, src: String, len: Int) =
      (id, if (len == 0) "" else (1 to len).map(i => s"t$i").mkString(" "),
        "en", src, 1L)
    // EQ: [5,5,5] -> 0; EX: [0,0,9] -> (45-27)/27 = 2/3; ONE: [7] -> 0
    val rows = Seq(doc(1, "EQ", 5), doc(2, "EQ", 5), doc(3, "EQ", 5),
      doc(4, "EX", 0), doc(5, "EX", 0), doc(6, "EX", 9), doc(7, "ONE", 7))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = AnalyticsQueries.sourceGini(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out("EQ") == ((3L, 15L, 0L)))
    assert(out("EX") == ((3L, 9L, 18L * Fp / 27L)))
    assert(out("ONE") == ((1L, 7L, 0L)))
  }

  test("q186: exact log2 buckets; zero gaps excluded; shares partition") {
    import spark.implicits._
    val t0 = java.time.LocalDateTime.of(2024, 4, 1, 0, 0)
    val rows = Seq(
      (1L, t0, 1L, "a", 0.0, "{}"),
      (2L, t0.plusNanos(1000), 1L, "a", 0.0, "{}"),      // gap 1us  -> b0
      (3L, t0.plusNanos(3000), 1L, "a", 0.0, "{}"),      // gap 2us  -> b1
      (4L, t0.plusNanos(3000), 1L, "a", 0.0, "{}"),      // gap 0 -> dropped
      (5L, t0.plusSeconds(1), 1L, "b", 0.0, "{}"),
      (6L, t0.plusSeconds(2), 1L, "b", 0.0, "{}"))       // gap 1s -> b19
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("gap").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = AnalyticsQueries.gapSpectrum(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(4)))
      .toMap
    assert(out(("a", 0L)) == ((1L, Fp / 2)))
    assert(out(("a", 1L)) == ((1L, Fp / 2)))
    assert(out(("b", 19L)) == ((1L, Fp)), "10^6 us has bit length 20")
    assert(out.size == 3, "the zero gap produced no bucket")
  }

  test("q187: scores are monotone in their metric and ties share scores") {
    val out = AnalyticsQueries.rfmSegments(spark, sfDir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getString(7)))
    assert(out.nonEmpty)
    out.foreach { case (_, _, _, rs, fs, ms, seg) =>
      assert(rs >= 1 && rs <= 5 && fs >= 1 && fs <= 5 && ms >= 1 && ms <= 5)
      assert(seg == s"$rs$fs$ms")
    }
    // monotone: lower recency-days never scores lower; ties tie
    val byR = out.sortBy(_._1)
    byR.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 >= b._4, "r_score must be non-increasing in r_days")
      if (a._1 == b._1) assert(a._4 == b._4, "equal r_days -> equal score")
    }
    val byF = out.sortBy(_._2)
    byF.sliding(2).foreach { case Array(a, b) =>
      assert(a._5 <= b._5)
      if (a._2 == b._2) assert(a._5 == b._5)
    }
    val byM = out.sortBy(_._3)
    byM.sliding(2).foreach { case Array(a, b) =>
      assert(a._6 <= b._6)
      if (a._3 == b._3) assert(a._6 == b._6)
    }
  }

  test("q188: trigrams never cross a session boundary") {
    import spark.implicits._
    val t0 = java.time.LocalDateTime.of(2024, 7, 1, 0, 0)
    val rows = Seq(
      (1L, t0, 1L, "a", 0.0, "{}"),
      (2L, t0.plusSeconds(10), 1L, "b", 0.0, "{}"),
      (3L, t0.plusSeconds(20), 1L, "c", 0.0, "{}"),
      (4L, t0.plusSeconds(30), 1L, "d", 0.0, "{}"),
      // > 1800s gap: new session; the (c,d,e)/(d,e,f) trigrams must NOT appear
      (5L, t0.plusSeconds(3000), 1L, "e", 0.0, "{}"),
      (6L, t0.plusSeconds(3010), 1L, "f", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("tri").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = AnalyticsQueries.sessionTrigrams(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.toSet == Set(("a", "b", "c", 1L), ("b", "c", "d", 1L)),
      "only the first session has length >= 3")
  }

  test("q189: single-sourced part scores exactly 2^20; equal split halves") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("hhi").toString
    Seq((1L, 100L, 10.0), (1L, 100L, 5.0),      // part 1: one supplier
      (2L, 200L, 7.0), (2L, 201L, 7.0),         // part 2: 50/50
      (3L, 300L, 9.0), (3L, 301L, 3.0))         // part 3: 3/4 vs 1/4
      .toDF("l_partkey", "l_suppkey", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = AnalyticsQueries.supplierHhi(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(1L) == ((1L, 15L, Fp)))
    assert(out(2L) == ((2L, 14L, Fp / 2)))
    // (81+9)/144 = 5/8
    assert(out(3L) == ((2L, 12L, 5L * Fp / 8L)))
  }

  test("q191: uniform slots hit exact log2; a needle scores entropy 0") {
    import spark.implicits._
    val t0 = java.time.LocalDateTime.of(2024, 1, 1, 0, 0) // epoch-aligned hour
    // "uni": 1 event in each of 4 distinct hour-of-week slots -> H = lg(4) = 2.0
    // "needle": all 5 events in one slot -> H = 0, peak share = Fp
    val rows =
      (0 until 4).map(h => (h.toLong, t0.plusHours(h.toLong), 1L, "uni", 0.0, "{}")) ++
      (0 until 5).map(i => (100L + i, t0.plusMinutes(i.toLong), 1L, "needle", 0.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("how").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = AnalyticsQueries.hourOfWeekEntropy(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(out("uni") == ((4L, 4L, Fp / 4, 2L << 16)),
      "4 equal slots: peak 1/4, entropy exactly 2.0 in Q16")
    assert(out("needle") == ((1L, 5L, Fp, 0L)))
  }

  test("q192: Benford constants sum to ~Fp and a known digit set scores") {
    assert(AnalyticsQueries.BenfordFp.map(_._2).sum == (1L << 20) + 1,
      "the nine rounded shares telescope to log10(10) = 1 (+1 rounding)")
    val out = AnalyticsQueries.benfordAudit(spark, sfDir).collect()
    assert(out.nonEmpty && out.map(_.getLong(1)).sum == out.head.getLong(2),
      "digit counts partition the positive totals")
    out.foreach { r =>
      assert(r.getLong(0) >= 1 && r.getLong(0) <= 9)
      assert(r.getLong(5) == math.abs(r.getLong(3) - r.getLong(4)))
    }
  }

  test("q193: a sustained small shift alarms CUSUM but never the MAD gate") {
    import spark.implicits._
    val base = java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0)
    def at(h: Int, i: Int) =
      base.plusHours(h.toLong).plusSeconds(i.toLong)
    // 12 hours at 10, then 12 hours at 13: +3/hour drift. med=11 (lower),
    // dev<=2 everywhere -> q173's 4-MAD point gate never fires, but the
    // cumulative sum climbs by 2/hour for 12 hours.
    val counts = Seq.fill(12)(10) ++ Seq.fill(12)(13)
    val rows = counts.zipWithIndex.flatMap { case (c, h) =>
      (0 until c).map(i => (h.toLong * 1000 + i, at(h, i), 1L, "drift", 0.0, "{}"))
    }
    val dir = java.nio.file.Files.createTempDirectory("cusum").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val mad = AnalyticsQueries.madAnomaly(spark, dir, threshold = 4L).collect()
    assert(mad.forall(!_.getBoolean(6)), "point detector stays silent")
    // single type: the query's (event_type, hour) order IS hour order
    val cus = AnalyticsQueries.cusumShift(spark, dir).collect()
    assert(cus.exists(_.getBoolean(6)), "CUSUM fires on the sustained shift")
    // closed form == classical recursion replayed in Scala
    var sRef = 0L
    cus.foreach { r =>
      sRef = math.max(0L, sRef + (r.getLong(2) - r.getLong(3)))
      assert(r.getLong(5) == sRef,
        s"window closed form diverges from the recursion at ${r.get(1)}")
    }
  }

  test("q194: CMS inner-product estimate upper-bounds the exact join size") {
    val out = AnalyticsQueries.joinSizeEstimate(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val (est, exact) = (out("est_min"), out("exact"))
    assert(est >= exact, "collisions only inflate the inner product")
    assert(exact > 0)
    (0 until 4).foreach(j => assert(out(s"row_$j") >= est, "min over rows"))
  }

  test("q195: a two-state deterministic cycle settles near 50/50") {
    import spark.implicits._
    val t0 = java.time.LocalDateTime.of(2024, 8, 1, 0, 0)
    // one session alternating a,b,a,b,... -> P(a->b)=P(b->a)=1
    val rows = (0 until 20).map(i =>
      (i.toLong, t0.plusSeconds(i.toLong), 1L,
        if (i % 2 == 0) "a" else "b", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("markov").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = AnalyticsQueries.markovStationary(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // even iteration count of the period-2 chain returns the start
    // vector (uniform), minus deterministic truncation leak
    assert(out.keySet == Set("a", "b"))
    assert(math.abs(out("a") - Fp / 2) <= MarkovLeak)
    assert(math.abs(out("b") - Fp / 2) <= MarkovLeak)
  }
  private val MarkovLeak = 32L // 16 iters x <=2 units truncation

  test("q196: cumulative cents telescope and age 0 starts at cohort week") {
    val out = AnalyticsQueries.cohortLtv(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.head._2 >= 0, "age is never negative")
      var cum = 0L
      sorted.foreach { r =>
        cum += r._4
        assert(r._5 == cum, s"cum_cents must telescope: $r")
      }
      assert(rows.map(_._3).distinct.size == 1, "cohort size is constant")
    }
  }

  test("q197: shares partition 2^20-ish; len-1 median duration is 0") {
    val out = AnalyticsQueries.sessionLengthCard(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    out.find(_._1 == 1L).foreach(r => assert(r._4 == 0L))
    val total = out.map(_._2).sum
    out.foreach { r => assert(r._3 == r._2 * Fp / total) }
  }

  test("q198: the crossing part belongs to the class it crosses into") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("abc").toString
    // revenues 80/15/5 put the boundaries EXACTLY on 80% and 95%
    Seq((1L, 80.0, 0.0), (2L, 15.0, 0.0), (3L, 5.0, 0.0))
      .toDF("l_partkey", "l_extendedprice", "l_discount")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = AnalyticsQueries.abcClassification(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == ((Fp * 80 / 100, "A")))
    assert(out(2L) == ((Fp * 95 / 100, "B")), "exact 80% boundary -> B")
    assert(out(3L) == ((Fp, "C")), "exact 95% boundary -> C")
  }

  test("q199: day-0 users are new; day-1 mixes new and returning") {
    import spark.implicits._
    val d0 = java.time.LocalDateTime.of(2024, 9, 1, 8, 0)
    val rows = Seq(
      (1L, d0, 1L, "view", 0.0, "{}"),
      (2L, d0.plusDays(1), 1L, "view", 0.0, "{}"),
      (3L, d0.plusDays(1), 2L, "view", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("nvr").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = AnalyticsQueries.newVsReturning(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out(0) == ((1L, 1L, 0L, Fp)))
    assert(out(1) == ((2L, 1L, 1L, Fp / 2)))
  }

  test("q200: the capstone row agrees with each standalone detector") {
    val card = AnalyticsQueries.monitoringCard(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(card.nonEmpty)
    val mad = AnalyticsQueries.madAnomaly(spark, sfDir).collect()
      .groupBy(_.getString(0))
    val cus = AnalyticsQueries.cusumShift(spark, sfDir).collect()
      .groupBy(_.getString(0))
    card.foreach { case (tpe, r) =>
      assert(r.getLong(1) == mad(tpe).length.toLong, "n_hours")
      assert(r.getLong(2) == mad(tpe).count(_.getBoolean(6)).toLong)
      assert(r.getLong(3) == cus(tpe).count(_.getBoolean(6)).toLong)
      assert(r.getLong(4) == cus(tpe).map(_.getLong(5)).max)
      assert(r.getLong(2) <= r.getLong(1))
    }
  }

  test("q201: a planted singleton class drives k-anonymity to 1") {
    import spark.implicits._
    val t0 = java.time.LocalDateTime.of(2024, 10, 1, 9, 0)
    val rows = Seq(
      // class (a, day0, 9h): 5 rows, 2 users
      (1L, t0, 1L, "a", 0.0, "{}"), (2L, t0, 1L, "a", 0.0, "{}"),
      (3L, t0, 2L, "a", 0.0, "{}"), (4L, t0, 2L, "a", 0.0, "{}"),
      (5L, t0, 2L, "a", 0.0, "{}"),
      // singleton class (b, day0, 10h): 1 row, 1 user
      (6L, t0.plusHours(1), 3L, "b", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("priv").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = AnalyticsQueries.privacyAudit(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("k_anonymity") == 1L && out("l_diversity") == 1L)
    assert(out("n_classes") == 2L && out("n_rows") == 6L)
    assert(out("rows_at_risk_k5") == 1L)
    assert(out("risk_share_fp") == Fp / 6)
  }

  test("q202: a planted whale carries its exact share; ceil-rank tiers") {
    import spark.implicits._
    val t0 = java.time.LocalDateTime.of(2024, 10, 2, 0, 0)
    // 10 users: user 0 has 91 events, users 1..9 have 1 each
    val rows = (0 until 91).map(i => (i.toLong, t0.plusSeconds(i.toLong), 0L,
      "view", 0.0, "{}")) ++
      (1 to 9).map(u => (1000L + u, t0, u.toLong, "view", 0.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("whale").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = AnalyticsQueries.whaleConcentration(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(5)))
      .toMap
    // ceil(10/100)=1 top user -> 91 of 100 events
    assert(out("p1") == ((1L, 91L, 91L * Fp / 100L)))
    // ceil(10/10)=1 as well at this n
    assert(out("p10") == ((1L, 91L, 91L * Fp / 100L)))
  }

  test("q203: identical sources score Fp; disjoint vocabularies score 0") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("stc").toString
    val rows = Seq(
      (1L, "alpha beta alpha", "en", "S1", 1L),
      (2L, "alpha beta alpha", "en", "S2", 1L),
      (3L, "gamma delta gamma delta", "en", "S3", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    rows.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = AnalyticsQueries.sourceTermCosine(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    assert(out(("S1", "S2")) == Fp, "identical term profiles")
    assert(out(("S1", "S3")) == 0L && out(("S2", "S3")) == 0L)
    assert(out(("S1", "S1")) == Fp && out(("S3", "S3")) == Fp)
  }

  test("q204: a planted 2x2 table yields the textbook chi-square") {
    import spark.implicits._
    val t0 = java.time.LocalDateTime.of(2024, 11, 1, 0, 0)
    // arm A (even ids): 4 users, 3 convert; arm B (odd): 4 users, 1 converts
    // table a=3 b=1 c=1 d=3, N=8: chi2 = 8*(9-1)^2/(4*4*4*4) = 2.0
    def u(uid: Long, buys: Boolean, base: Long) =
      Seq((base, t0, uid, "view", 0.0, "{}")) ++
        (if (buys) Seq((base + 1, t0.plusMinutes(1), uid, "purchase", 0.0, "{}"))
         else Nil)
    val rows = u(2, true, 10) ++ u(4, true, 20) ++ u(6, true, 30) ++
      u(8, false, 40) ++ u(1, true, 50) ++ u(3, false, 60) ++
      u(5, false, 70) ++ u(7, false, 80)
    val dir = java.nio.file.Files.createTempDirectory("ab").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = AnalyticsQueries.abTestCard(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("arm_a_users") == 4L && out("arm_a_convs") == 3L)
    assert(out("arm_b_users") == 4L && out("arm_b_convs") == 1L)
    assert(out("chi2_fp") == 2L * Fp, "chi2 = 2.0 exactly")
    assert(out("lift_fp") == Fp / 4 - 3L * Fp / 4)
  }

  test("q205: deciles partition the corpus and diversity falls with length") {
    val out = AnalyticsQueries.lengthDiversityCalibration(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._1).toSet.subsetOf((1L to 10L).toSet))
    val nDocs = out.map(_._2).sum
    assert(nDocs > 0)
    // mean length strictly increases across deciles (distinct thresholds)
    out.sliding(2).foreach { case Array(a, b) => assert(a._3 <= b._3) }
  }

  test("q206: a planted spike tops the day; steady terms do not burst") {
    import spark.implicits._
    val d0 = java.time.LocalDateTime.of(2024, 12, 1, 12, 0)
    def ev(id: Long, day: Int, term: Int) =
      (id, d0.plusDays(day.toLong), 1L, "view", 0.0, s"""{"k": $term}""")
    // days 0..6: steady background of term 1 (5/day) and term 2 (5/day).
    // day 7: term 1 keeps 5, term 9 (never seen) spikes with 15.
    val rows =
      (0 until 7).flatMap(day =>
        (0 until 5).map(i => ev(day * 100L + i, day, 1)) ++
        (0 until 5).map(i => ev(day * 100L + 50 + i, day, 2))) ++
      (0 until 5).map(i => ev(1000L + i, 7, 1)) ++
      (0 until 15).map(i => ev(2000L + i, 7, 9))
    val dir = java.nio.file.Files.createTempDirectory("trend2").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = AnalyticsQueries.trendingTerms(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(6)))
    val lastDay = out.map(_._1).max
    val top = out.filter(r => r._1 == lastDay && r._2 == 1L).head
    assert(top._3 == "9", "the never-seen spike must lead the day")
    // tshare floor 1 -> burst = share_fp * Fp = (15*Fp/20) * Fp
    assert(top._4 == (15L * Fp / 20L) * Fp)
    val steady = out.find(r => r._1 == lastDay && r._3 == "1").get
    // term 1: today 5/20 (diluted by the spike); trailing 35/70
    // -> burst = (Fp/4)*Fp / (Fp/2) = Fp/2 exactly
    assert(steady._4 == Fp / 2, "the spike halves the steady term's burst")
  }

  test("q180: orthogonal and identical hand centroids") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cent").toString
    // label 0: e1; label 1: e2 (orthogonal); label 2: e1 scaled (parallel)
    val rows = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(1.0f, 0.0f), 0),
      (3L, Array(0.0f, 1.0f), 1),
      (4L, Array(0.5f, 0.0f), 2))
      .toDF("vec_id", "embedding", "label")
    rows.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = AnalyticsQueries.labelCentroidMatrix(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(5)).toMap
    assert(out((0L, 1L)) == 0L, "orthogonal labels -> cos2 0")
    assert(out((0L, 2L)) == Fp, "parallel labels -> cos2 2^20")
    assert(out((1L, 2L)) == 0L)
  }
}
