package graft.datapipe

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions._

class PackingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("chunking: window starts, sizes, and text slices") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 toks -> chunks at 0,3,6
      (2L, "a b c d"),                                 // exactly one full window
      (3L, "a b c d e"),                               // 5 toks -> 0 and 3 (short tail)
      (4L, "solo"),
      (5L, ""),                                        // no tokens -> no rows
      (6L, null: String),
      (7L, "a  b\t c"),                                // whitespace runs normalize
    ).toDF("doc_id", "text")
    val got = Packing.chunkDocuments(docs, chunkTokens = 4, stride = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toSet
    assert(got == Set(
      (1L, 0L, 0L, 4L, "t1 t2 t3 t4"),
      (1L, 1L, 3L, 4L, "t4 t5 t6 t7"),
      (1L, 2L, 6L, 4L, "t7 t8 t9 t10"),
      (2L, 0L, 0L, 4L, "a b c d"),
      (3L, 0L, 0L, 4L, "a b c d"),
      (3L, 1L, 3L, 2L, "d e"),
      (4L, 0L, 0L, 1L, "solo"),
      (7L, 0L, 0L, 3L, "a b c")), got)
  }

  test("chunking invariants: full coverage, stride starts, fresh tokens per chunk") {
    import spark.implicits._
    val docs = (1 to 300).map(i =>
      (i.toLong, (0 until i % 37).map(j => s"w$j").mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = Packing.chunkDocuments(docs, chunkTokens = 8, stride = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    for ((id, cs) <- chunks) {
      val n = (id % 37).toInt // token count of this doc
      val sorted = cs.sortBy(_._2)
      assert(sorted.head._3 == 0L)                               // starts at 0
      assert(sorted.map(_._2).toSeq == sorted.indices.map(_.toLong)) // dense idx
      assert(sorted.forall(c => c._3 == c._2 * 5))               // start = idx*stride
      assert(sorted.last._3 + sorted.last._4 == n)               // covers the tail
      assert(sorted.forall(c => c._4 >= 1))                      // never empty
      // every chunk past the first ends strictly later than its predecessor
      sorted.sliding(2).foreach {
        case Array(p, c) => assert(c._3 + c._4 > p._3 + p._4)
        case _ =>
      }
    }
    // docs with zero tokens emit nothing
    assert(!chunks.contains(37L * (300 / 37)))
  }

  test("budget chunking: chunk = the chunk a word's cumulative-token start falls in") {
    import spark.implicits._
    // doc 1: weights 5,5,5,5 budget 8 → cum_before 0,5,10,15 → chunks
    // 0,0,1,1 (chunk 0 carries 10 tokens: the straddling word counts
    // toward the earlier chunk, packByBudget's rule). doc 2: single
    // word heavier than the budget → one chunk, never dropped.
    val wsc = Seq(
      (1L, 0L, 5L), (1L, 1L, 5L), (1L, 2L, 5L), (1L, 3L, 5L),
      (2L, 0L, 13L)).toDF("doc_id", "j", "n_syms")
    val got = Packing.chunkByTokenBudget(wsc, budget = 8L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map(
      (1L, 0L) -> ((2L, 10L, 0L)),
      (1L, 1L) -> ((2L, 10L, 2L)),
      (2L, 0L) -> ((1L, 13L, 0L))))
    // partitioning invariance: the window orders by (doc, j) alone
    val re = Packing.chunkByTokenBudget(wsc.repartition(7), budget = 8L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(re == got)
    // chunk totals reassemble the documents exactly
    val totals = got.toSeq.groupBy(_._1._1)
      .view.mapValues(_.map(_._2._2).sum).toMap
    assert(totals == Map(1L -> 20L, 2L -> 13L))
  }

  test("offset packing: batch = the batch a doc's start offset falls in") {
    import spark.implicits._
    val docs = Seq(
      ("a", 1L, 1000L), ("a", 2L, 900L), ("a", 3L, 200L), // 200 starts at 1900 -> batch 0 (straddles)
      ("a", 4L, 5000L),                                    // oversized: spans batches 1..3
      ("a", 5L, 100L),
      ("b", 1L, 100L), ("b", 2L, 100L),                    // independent shard
    ).toDF("shard", "id", "n")
    val got = Packing.packByBudget(docs, "shard", "id", "n", tokenBudget = 2048L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    assert(got == Set(
      ("a", 1L, 0L), ("a", 2L, 0L), ("a", 3L, 0L), // starts 0, 1000, 1900
      ("a", 4L, 1L),                                // start 2100 -> batch 1
      ("a", 5L, 3L),                                // start 7100 -> batch 3 (doc 4 spanned 2)
      ("b", 1L, 0L), ("b", 2L, 0L)), got)
    // batch ids are non-decreasing in id order within a shard
    val aSeq = Packing.packByBudget(docs, "shard", "id", "n", 2048L)
      .filter($"shard" === "a").orderBy("id")
      .collect().map(_.getLong(3)).toSeq
    assert(aSeq == aSeq.sorted)
  }

  test("strict packing: batches never exceed the budget; docs stay atomic") {
    import spark.implicits._
    val docs = Seq(
      ("a", 1L, 1000L), ("a", 2L, 900L), ("a", 3L, 200L), // 1900 fits; +200 would be 2100 -> new batch
      ("a", 4L, 5000L),                                    // oversized: own batch
      ("a", 5L, 100L),
      ("b", 1L, 100L), ("b", 2L, 100L),
    ).toDF("shard", "id", "n")
    val got = Packing.packByBudgetStrict(docs, "shard", "id", "n", 2048L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    assert(got == Set(
      ("a", 1L, 0L), ("a", 2L, 0L), // 1900 <= 2048
      ("a", 3L, 1L),                // would overflow batch 0
      ("a", 4L, 2L),                // oversized alone
      ("a", 5L, 3L),
      ("b", 1L, 0L), ("b", 2L, 0L)), got)
    // invariant on random input: no multi-doc batch exceeds the budget
    val rand = (1 to 400).map(i => ("s", i.toLong, (i * 37 % 900 + 1).toLong))
      .toDF("shard", "id", "n")
    val batches = Packing.packByBudgetStrict(rand, "shard", "id", "n", 1000L)
      .groupBy("batch_id").agg(sum("n").as("total"), count(lit(1)).as("k"))
      .collect()
    assert(batches.forall(r => r.getLong(1) <= 1000L || r.getLong(2) == 1L),
      batches.toSeq.take(5).toString)
  }

  test("packing is partitioning-invariant") {
    import spark.implicits._
    val docs = (1 to 500).map(i => (s"s${i % 3}", i.toLong, (i % 97 + 1).toLong))
      .toDF("shard", "id", "n")
    val a = Packing.packByBudget(docs, "shard", "id", "n", 256L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    val b = Packing.packByBudget(docs.repartition(7), "shard", "id", "n", 256L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    assert(a == b)
  }

  test("mixture schedule: prefix proportions track the weights") {
    import spark.implicits._
    val docs = (1 to 3000).map(i =>
      (i.toLong, Seq("hot", "cold", "base")(i % 3))).toDF("id", "src")
    val sched = Packing.mixtureSchedule(docs, "src", "id",
      Map("hot" -> 2.0, "cold" -> 0.5), defaultWeight = 1.0)
    val prefix = sched.filter(col("mix_rank") <= 700)
      .groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // stride scheduling: hot appears 2x base, cold 0.5x base (ratio 4:2:1)
    assert(prefix("hot") == 400, prefix)
    assert(prefix("base") == 200, prefix)
    assert(prefix("cold") == 100, prefix)
    // deterministic: same schedule on a different partitioning
    val again = Packing.mixtureSchedule(docs.repartition(5), "src", "id",
        Map("hot" -> 2.0, "cold" -> 0.5), defaultWeight = 1.0)
      .filter(col("mix_rank") <= 50).orderBy("mix_rank")
      .collect().map(_.getLong(0)).toSeq
    val first = sched.filter(col("mix_rank") <= 50).orderBy("mix_rank")
      .collect().map(_.getLong(0)).toSeq
    assert(again == first)
  }

  test("mixture schedule: mix_rank equals the brute-force global order") {
    import spark.implicits._
    val docs = (1 to 997).map(i =>
      (i.toLong, Seq("hot", "cold", "base", "x")(i % 4))).toDF("id", "src")
    val sched = Packing.mixtureSchedule(docs, "src", "id",
        Map("hot" -> 3.0, "cold" -> 0.25), defaultWeight = 1.0, nBands = 7)
      .select("id", "src", "position", "mix_rank")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    // brute force: sort everything by (position, src, id) on the driver
    val expected = sched.sortBy(t => (t._3, t._2, t._1))
      .zipWithIndex.map { case ((id, src, _, _), i) => (id, src, i + 1L) }.toSet
    assert(sched.map(t => (t._1, t._2, t._4)).toSet == expected)
    assert(sched.map(_._4).sorted.toSeq == (1L to 997L).toSeq)
  }

  test("mixture schedule plan: no single-partition stage carries row data") {
    import spark.implicits._
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
    val docs = (1 to 200).map(i =>
      (i.toLong, Seq("a", "b")(i % 2))).toDF("id", "src")
    val sched = Packing.mixtureSchedule(docs, "src", "id",
      Map("a" -> 2.0), defaultWeight = 1.0)
    val root: SparkPlan = sched.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val singles = root.collect {
      case s: ShuffleExchangeExec if s.outputPartitioning == SinglePartition => s
    }
    // the only tolerated single-partition exchange is the O(nBands)
    // band-count cumsum — its subtree must already be aggregated
    assert(singles.forall(_.child.toString.contains("HashAggregate")),
      singles.map(_.toString.take(500)).mkString("\n---\n"))
    // and the full-data global-sort window must be gone entirely:
    // every window in the plan is partitioned
    assert(!root.toString.contains("Window [") ||
      root.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty => w
      }.forall(_.child.toString.contains("HashAggregate")),
      root.toString.take(3000))
  }

  test("mixture schedule is nBands-invariant (banding never changes values)") {
    // band count is an execution knob: any nBands must produce the
    // identical schedule (both the per-source hash-band rank and the
    // position-band mix_rank fold their offsets exactly)
    import spark.implicits._
    val docs = (1 to 601).map(i =>
      (i.toLong, Seq("hot", "cold", "base")(i % 3))).toDF("id", "src")
    def run(n: Int) = Packing.mixtureSchedule(docs, "src", "id",
        Map("hot" -> 2.0, "cold" -> 0.5), defaultWeight = 1.0, nBands = n)
      .select("id", "mix_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val base = run(1)
    assert(run(7) == base)
    assert(run(64) == base)
  }

  test("mixture schedule plan: no row-data exchange hash-partitions on source alone") {
    // a hash exchange on the source column alone is a single task PER
    // SOURCE — with O(10) sources one of which dominates a 100 TB
    // corpus, that is the same scale-killer as a global sort. Row data
    // must only ever shuffle on (source, band); source-alone exchanges
    // are tolerated solely above the O(nSources·nBands) count aggregate.
    import spark.implicits._
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    val docs = (1 to 200).map(i =>
      (i.toLong, Seq("a", "b")(i % 2))).toDF("id", "src")
    val sched = Packing.mixtureSchedule(docs, "src", "id",
      Map("a" -> 2.0), defaultWeight = 1.0)
    val root: SparkPlan = sched.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val srcAlone = root.collect {
      case s: ShuffleExchangeExec => s.outputPartitioning match {
        case h: HashPartitioning if h.expressions.size == 1 &&
            h.expressions.flatMap(_.references.toSeq.map(_.name))
              .forall(n => n == "src" || n == "__osrc") => Some(s)
        case _ => None
      }
    }.flatten
    assert(srcAlone.forall(_.child.toString.contains("HashAggregate")),
      srcAlone.map(_.toString.take(800)).mkString("\n---\n"))
    // and per-source ranking windows must partition on more than source
    val winExecs = root.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(winExecs.forall(w => w.partitionSpec.size != 1 ||
      w.child.toString.contains("HashAggregate") ||
      !w.partitionSpec.flatMap(_.references.toSeq.map(_.name)).contains("src")),
      winExecs.map(w => w.partitionSpec.mkString(",")).mkString("\n"))
  }

  def budgetDocs(n: Int) = {
    import spark.implicits._
    (1 to n).map(i =>
      (i.toLong, s"s${i % 5}", (i % 37 + 3).toLong)).toDF("id", "src", "tok")
  }

  /** naive per-source cumsum-window form of tokenBudgetSample. */
  def naiveBudget(df: org.apache.spark.sql.DataFrame,
      budgets: Map[String, Long], dflt: Long): Set[Long] = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy(col("src"))
      .orderBy(Sampling.hashKey(col("id"), "s"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val quota = budgets.foldLeft(lit(dflt)) { case (e, (s, b)) =>
      when(col("src") === s, lit(b)).otherwise(e)
    }
    df.withColumn("__cum", sum(col("tok")).over(w))
      .filter(col("__cum") <= quota)
      .select("id").collect().map(_.getLong(0)).toSet
  }

  test("token budget: equals the naive cumsum window, never exceeds quota") {
    import org.apache.spark.sql.functions._
    val df = budgetDocs(400)
    val budgets = Map("s0" -> 300L, "s1" -> 100L)
    val got = Packing.tokenBudgetSample(df, "src", "id", "tok",
      budgets, defaultBudget = 200L, salt = "s")
    val ids = got.select("id").collect().map(_.getLong(0)).toSet
    assert(ids == naiveBudget(df, budgets, 200L))
    // per-source kept token mass respects the quota
    val mass = got.groupBy("src").agg(sum("tok").as("m")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    mass.foreach { case (s, m) => assert(m <= budgets.getOrElse(s, 200L), s"$s=$m") }
  }

  test("token budget is partitioning-invariant and monotone in the quota") {
    val df = budgetDocs(300)
    def run(d: org.apache.spark.sql.DataFrame, b: Long) =
      Packing.tokenBudgetSample(d, "src", "id", "tok", Map.empty, b, salt = "s")
        .select("id").collect().map(_.getLong(0)).toSet
    assert(run(df.repartition(13), 250L) == run(df.coalesce(1), 250L))
    // raising the quota only ADDS documents (prefix property)
    assert(run(df, 150L).subsetOf(run(df, 400L)))
  }

  test("token budget excludes null-weight rows instead of emitting them") {
    import spark.implicits._
    val df = Seq((1L, "s", Some(5L)), (2L, "s", None), (3L, "s", Some(5L)))
      .toDF("id", "src", "tok")
    val got = Packing.tokenBudgetSample(df, "src", "id", "tok",
        Map.empty, defaultBudget = 100L, salt = "s")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 3L))
  }

  test("token budget plan: no row-data exchange hash-partitions on source alone") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    val df = budgetDocs(200)
    val got = Packing.tokenBudgetSample(df, "src", "id", "tok",
      Map("s0" -> 100L), defaultBudget = 200L, salt = "s")
    val root: SparkPlan = got.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val srcAlone = root.collect {
      case s: ShuffleExchangeExec => s.outputPartitioning match {
        case h: HashPartitioning if h.expressions.size == 1 &&
            h.expressions.flatMap(_.references.toSeq.map(_.name))
              .forall(n => n == "src" || n == "__osrc") => Some(s)
        case _ => None
      }
    }.flatten
    assert(srcAlone.forall(_.child.toString.contains("HashAggregate")),
      srcAlone.map(_.toString.take(800)).mkString("\n---\n"))
    val winExecs = root.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(winExecs.forall(w => w.partitionSpec.size != 1 ||
      w.child.toString.contains("HashAggregate") ||
      !w.partitionSpec.flatMap(_.references.toSeq.map(_.name)).contains("src")),
      winExecs.map(w => w.partitionSpec.mkString(",")).mkString("\n"))
  }

  test("isqrt is exact floor(sqrt) on edges, squares, and near-squares") {
    import spark.implicits._
    val cases = Seq(0L, 1L, 2L, 3L, 4L, 5L, 8L, 9L, 10L, 15L, 16L, 17L,
      999999L, 1000000L, 1000001L, (1L << 40) - 1, 1L << 40,
      (1L << 52) + 12345L) ++
      (1 to 50).map(i => i.toLong * i * 7919 + i)
    val got = cases.toDF("m")
      .select(org.apache.spark.sql.functions.col("m"),
        Packing.isqrt(org.apache.spark.sql.functions.col("m")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    cases.foreach { m =>
      val s = got(m)
      assert(s * s <= m && (s + 1) * (s + 1) > m, s"isqrt($m) = $s")
    }
  }

  test("sqrt apportionment: quotas sum to the budget exactly and track sqrt weights") {
    import spark.implicits._
    val docs = Seq.tabulate(300)(i =>
      (s"src${i % 3}", (i % 3 + 1).toLong * 10)).toDF("src", "toks")
    val got = Packing.sqrtApportion(docs, "src", "toks", budget = 9999L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._4).sum == 9999L)
    // quota within 1 of the exact proportional share
    val tw = got.map(_._3).sum.toDouble
    got.foreach { case (src, _, w, q) =>
      assert(math.abs(q - 9999L * w / tw) <= 1.0, s"$src: w=$w q=$q")
    }
    // invariant to partitioning
    val again = Packing.sqrtApportion(docs.repartition(7), "src", "toks", 9999L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("sqrt apportionment: zero-mass sources get zero quota; all-zero corpus yields zero quotas") {
    import spark.implicits._
    val mixed = Seq(("a", 100L), ("b", 0L), ("c", 25L)).toDF("src", "toks")
    val got = Packing.sqrtApportion(mixed, "src", "toks", 100L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got("b") == 0L)
    assert(got.values.sum == 100L)
    val zeros = Seq(("a", 0L), ("b", 0L)).toDF("src", "toks")
    val z = Packing.sqrtApportion(zeros, "src", "toks", 100L)
      .collect().map(r => r.getLong(3))
    assert(z.forall(_ == 0L))
  }
}
