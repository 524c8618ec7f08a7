package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.datapipe.{Contamination, EditDistance, Packing, Resample, Sampling, Sketches}
import graft.ops.Merge
import graft.util.{Tables, Tok}

/** Round-4 query surface: sketch aggregation, exact-moment statistics,
  * CDC merge, BPE-style token counting, blocked edit-distance pairs,
  * and inverted-index search. Every query carries a DuckDB oracle.
  */
object Round4Queries {

  // ---------------------------------------------------------------- q56
  /** Distinct-count sketches (KMV, k=256) over three keys: a high-
    * cardinality foreign key, the corpus token vocabulary, and a
    * low-cardinality column exercising the exact small-set path. */
  def kmvDistinct(s: SparkSession, d: String): DataFrame = {
    val k = 256
    val custkeys = Sketches.kmvDistinct(Tables.orders(s, d), "o_custkey", k)
    val tokens = Sketches.kmvDistinct(
      Tables.documents(s, d)
        .select(explode(split(lower(col("text")), Tok.WS)).as("tok"))
        .filter(col("tok") =!= ""),
      "tok", k, label = "doc_tokens")
    val statuses = Sketches.kmvDistinct(Tables.lineitem(s, d), "l_linestatus", k)
    custkeys.unionByName(tokens).unionByName(statuses)
      .orderBy(col("key_name"))
  }

  def kmvOracle: String = {
    val k = 256
    val a = Sketches.kmvOracle("orders", "CAST(o_custkey AS VARCHAR)", k, "o_custkey")
    val b = Sketches.kmvOracle(
      s"(SELECT unnest(list_filter(string_split_regex(lower(text), '${Tok.WS}'), t -> t <> '')) AS tok FROM documents)",
      "tok", k, "doc_tokens")
    val c = Sketches.kmvOracle("lineitem", "l_linestatus", k, "l_linestatus")
    s"""SELECT * FROM ($a UNION ALL $b UNION ALL $c) ORDER BY key_name"""
  }

  // ---------------------------------------------------------------- q57
  /** Distributed-exact statistical moments per group, with derived
    * correlation / stddev. The raw moments are EXACT (integer sums for
    * the integer-valued quantity, DECIMAL sums for money), so they
    * survive any partitioning / merge order — unlike Spark's float
    * `corr`/`stddev` built-ins whose streaming merges are partition-
    * order-dependent. The float stats are then ONE deterministic
    * closed-form expression over those exact components (identical
    * IEEE-754 tree in the oracle). This is the scale-correct pattern
    * for statistics over 100 TB: shuffle carries O(groups) exact
    * moment tuples; nothing depends on row order. */
  def momentStats(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val qtyL = col("l_quantity").cast("long")
    val priceDec = col("l_extendedprice").cast(DecimalType(18, 4))
    val agg = li.groupBy(col("l_returnflag")).agg(
      count(lit(1)).as("n_rows"),
      sum(qtyL).as("sum_qty"),
      sum(qtyL * qtyL).as("sum_qty2"),
      sum(priceDec).as("sum_price_dec"),
      sum((priceDec * priceDec).cast(DecimalType(38, 8))).as("sum_price2_dec"),
      sum((qtyL.cast(DecimalType(9, 0)) * priceDec).cast(DecimalType(38, 6)))
        .as("sum_qty_price_dec"))
    val n = col("n_rows").cast("double")
    val sx = col("sum_qty").cast("double")
    val sxx = col("sum_qty2").cast("double")
    val sy = col("sum_price_dec").cast("double")
    val syy = col("sum_price2_dec").cast("double")
    val sxy = col("sum_qty_price_dec").cast("double")
    agg.select(
      col("l_returnflag"),
      col("n_rows"),
      col("sum_qty"),
      sy.as("sum_price"),
      ((n * sxy - sx * sy) /
        (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))).as("corr_qty_price"),
      sqrt((n * sxx - sx * sx) / (n * n)).as("stddev_pop_qty"))
      .orderBy(col("l_returnflag"))
  }

  def momentStatsOracle: String =
    """WITH agg AS (
      |  SELECT l_returnflag,
      |    CAST(COUNT(*) AS BIGINT) AS n_rows,
      |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |    CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty2,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS sum_price_dec,
      |    SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) AS DECIMAL(19,4)) * CAST(CAST(l_extendedprice AS DECIMAL(18,4)) AS DECIMAL(19,4)) AS DECIMAL(38,8))) AS sum_price2_dec,
      |    SUM(CAST(CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(19,0)) * CAST(CAST(l_extendedprice AS DECIMAL(18,4)) AS DECIMAL(19,4)) AS DECIMAL(38,6))) AS sum_qty_price_dec
      |  FROM lineitem GROUP BY l_returnflag
      |)
      |SELECT l_returnflag, n_rows, sum_qty,
      |  CAST(sum_price_dec AS DOUBLE) AS sum_price,
      |  ((CAST(n_rows AS DOUBLE) * CAST(sum_qty_price_dec AS DOUBLE) - CAST(sum_qty AS DOUBLE) * CAST(sum_price_dec AS DOUBLE)) /
      |   (sqrt(CAST(n_rows AS DOUBLE) * CAST(sum_qty2 AS DOUBLE) - CAST(sum_qty AS DOUBLE) * CAST(sum_qty AS DOUBLE)) *
      |    sqrt(CAST(n_rows AS DOUBLE) * CAST(sum_price2_dec AS DOUBLE) - CAST(sum_price_dec AS DOUBLE) * CAST(sum_price_dec AS DOUBLE))))
      |    AS corr_qty_price,
      |  sqrt((CAST(n_rows AS DOUBLE) * CAST(sum_qty2 AS DOUBLE) - CAST(sum_qty AS DOUBLE) * CAST(sum_qty AS DOUBLE)) /
      |       (CAST(n_rows AS DOUBLE) * CAST(n_rows AS DOUBLE))) AS stddev_pop_qty
      |FROM agg ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q58
  /** CDC merge (the reference's baseline+updatefiles pattern on the
    * relational surface): a deterministic delta derived from orders —
    * status updates for keys ≡ 3 (mod 10), tombstones for keys ≡ 7
    * (mod 100), inserts of new keys — applied via [[Merge]]. */
  def mergeUpsert(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
      .withColumn("version", lit(1L))
      .withColumn("is_deleted", lit(false))
    val updates = base.filter(col("o_orderkey") % 10 === 3)
      .withColumn("o_orderstatus", lit("X"))
      .withColumn("version", lit(2L))
    val tombstones = base.filter(col("o_orderkey") % 100 === 7)
      .withColumn("version", lit(2L))
      .withColumn("is_deleted", lit(true))
    val inserts = base.filter(col("o_orderkey") % 500 === 1)
      .withColumn("o_orderkey", col("o_orderkey") + 100000000L)
      .withColumn("o_orderstatus", lit("N"))
    val delta = updates.unionByName(tombstones).unionByName(inserts)
    Merge.applyChanges(base, delta, Seq("o_orderkey"), "version", "is_deleted")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        col("version"))
      .orderBy(col("o_orderkey"))
  }

  def mergeUpsertOracle: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
      |    CAST(1 AS BIGINT) AS version, FALSE AS is_deleted, 0 AS src
      |  FROM orders
      |), delta AS (
      |  SELECT o_orderkey, o_custkey, 'X' AS o_orderstatus, o_totalprice,
      |    CAST(2 AS BIGINT) AS version, FALSE AS is_deleted, 1 AS src
      |  FROM orders WHERE o_orderkey % 10 = 3
      |  UNION ALL
      |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
      |    CAST(2 AS BIGINT) AS version, TRUE AS is_deleted, 1 AS src
      |  FROM orders WHERE o_orderkey % 100 = 7
      |  UNION ALL
      |  SELECT o_orderkey + 100000000, o_custkey, 'N' AS o_orderstatus, o_totalprice,
      |    CAST(1 AS BIGINT) AS version, FALSE AS is_deleted, 1 AS src
      |  FROM orders WHERE o_orderkey % 500 = 1
      |), unioned AS (
      |  SELECT * FROM base UNION ALL SELECT * FROM delta
      |), ranked AS (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY o_orderkey ORDER BY version DESC, src DESC) AS rn
      |  FROM unioned
      |)
      |SELECT o_orderkey, o_orderstatus, o_totalprice, version
      |FROM ranked WHERE rn = 1 AND NOT is_deleted
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q59
  /** GPT-2-style pre-tokenizer regex (no lookahead — portable between
    * Java regex and RE2): contractions, space-prefixed letter runs,
    * space-prefixed digit runs, space-prefixed punctuation runs,
    * whitespace runs. Whitespace is an EXPLICIT class, not \s: Java's
    * \s includes vertical tab U+000B while RE2's does not — the
    * explicit class keeps both engines tokenizing identically. */
  val bpePattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^ \\t\\n\\r\\f\\p{L}\\p{N}]+|[ \\t\\n\\r\\f]+"

  /** Token counting per document: whitespace tokens and BPE-ish
    * pre-tokens (the LLM-cost proxy). Pure codegen'd expressions. */
  def bpeTokenCounts(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      size(split(trim(col("text")), Tok.WS)).cast("long").as("n_ws"),
      size(regexp_extract_all(col("text"), lit(bpePattern), lit(0)))
        .cast("long").as("n_bpe"),
      length(col("text")).cast("long").as("n_chars_measured"))
      .filter(length(trim(col("text"))) > 0)
      .orderBy(col("doc_id"))

  def bpeOracle: String = {
    val pat = bpePattern.replace("'", "''")
    s"""SELECT doc_id,
       |  CAST(len(string_split_regex(trim(text), '${Tok.WS}')) AS BIGINT) AS n_ws,
       |  CAST(len(regexp_extract_all(text, '$pat')) AS BIGINT) AS n_bpe,
       |  CAST(length(text) AS BIGINT) AS n_chars_measured
       |FROM documents WHERE length(trim(text)) > 0 ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q60
  /** Blocked Levenshtein near-match pairs over part names (block =
    * brand, length band + threshold-bounded DP inside the block). */
  def editDistancePairs(s: SparkSession, d: String): DataFrame =
    EditDistance.nearMatchPairs(Tables.part(s, d), "p_partkey", "p_name",
        "p_brand", maxDist = 2)
      .orderBy(col("id_a"), col("id_b"))

  def editDistanceOracle: String =
    """SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
      |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
      |FROM part a JOIN part b
      |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
      |WHERE abs(length(a.p_name) - length(b.p_name)) <= 2
      |  AND levenshtein(a.p_name, b.p_name) <= 2
      |ORDER BY id_a, id_b""".stripMargin

  // ---------------------------------------------------------------- q61
  /** Conjunctive full-text search answered through the inverted index
    * (postings join) instead of a corpus scan; the oracle recomputes
    * the analyzer per document and tests token membership — equality
    * proves index search ≡ scan search. Query terms exercise the
    * analyzer chain: "the" drops via the ES english_stop table,
    * "windows" stems to window via minimal_english, "query" passes
    * through — so the analyzed query is (window, query), both present
    * in the corpus vocabulary. (The corpus is all-singular, so a
    * plural query term like "batches" — minimal_english stem "batche"
    * — would match zero documents.) */
  val searchQuery = "the windows query"

  def invertedSearch(s: SparkSession, d: String): DataFrame =
    SearchFacade.searchIndexAll(Tables.documents(s, d), "doc_id", "text",
        searchQuery)
      .orderBy(col("doc_id"))

  // ---------------------------------------------------------------- q62
  /** BM25 ranked search (the ES default scorer) — rank + integer
    * columns only; float scores are engine-local because ln is not
    * bit-portable (see [[SearchFacade.searchBm25]]). Ordering is
    * robust: same integer (tf, dl) ⇒ bit-equal score in each engine. */
  def bm25Search(s: SparkSession, d: String): DataFrame =
    SearchFacade.searchBm25(Tables.documents(s, d), "doc_id", "text",
      searchQuery, k = 20)

  /** The q62 BM25 scoring chain as CTE text ending in `scored
    * (doc_id, dl, score)` — shared by [[bm25Oracle]] and the q153
    * hybrid-search oracle so the lexical leg can never diverge. */
  private[queries] def bm25Ctes: String = {
    val terms = SearchFacade.analyzeQueryTerms(searchQuery).distinct
    val tfExprs = terms.zipWithIndex.map { case (t, i) =>
      s"CAST(len(list_filter(toks, x -> x = '$t')) AS DOUBLE) AS tf$i" }
      .mkString(",\n       |    ")
    val dfSubs = terms.zipWithIndex.map { case (t, i) =>
      s"(SELECT COUNT(*) FROM tok WHERE list_contains(toks, '$t')) AS df$i" }
      .mkString(",\n       |    ")
    val scoreSum = terms.indices.map { i =>
      s"""ln(1.0 + (CAST(n AS DOUBLE) - CAST(df$i AS DOUBLE) + 0.5) / (CAST(df$i AS DOUBLE) + 0.5)) *
         | (tf$i * (1.2 + 1.0)) / (tf$i + 1.2 * ((1.0 - 0.75) + 0.75 * CAST(dl AS DOUBLE) / avgdl))"""
        .stripMargin.replace("\n", " ") }
      .mkString(" + ")
    val anyMatch = terms.indices.map(i => s"tf$i > 0").mkString(" OR ")
    s"""tok AS (
       |  $analyzerTokSql
       |), pertok AS (
       |  SELECT doc_id, len(toks) AS dl,
       |    $tfExprs
       |  FROM tok
       |), stats AS (
       |  SELECT COUNT(*) AS n,
       |    CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl,
       |    $dfSubs
       |  FROM (SELECT doc_id, len(toks) AS dl FROM tok) _
       |), scored AS (
       |  SELECT doc_id, dl, $scoreSum AS score
       |  FROM pertok, stats WHERE $anyMatch
       |)""".stripMargin
  }

  def bm25Oracle: String =
    s"""WITH $bm25Ctes
       |SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
       |  doc_id, CAST(dl AS BIGINT) AS dl
       |FROM scored ORDER BY score DESC, doc_id LIMIT 20""".stripMargin

  /** RRF constant (Cormack et al. 2009's k = 60) and the ×2²⁰ score
    * scale for q153. */
  private val RrfK0 = 60
  private val RrfFp = 1L << 20

  /** Hybrid search (q153): reciprocal-rank fusion of the q62 BM25
    * lexical top-20 and a brute-force cosine more-like-this top-20
    * (query = document 0's embedding; embeddings align 1:1 with
    * doc_ids) — the RAG-retrieval staple. Fusion is pure integer
    * rank arithmetic, score = Σ_legs 2²⁰ div (60 + rank), so the
    * fused ordering is exact given the legs' orderings (both
    * oracle-green on their own: q62 and q15's portable-order
    * argument). Each leg is output-bound (top-20); the fusion is a
    * 40-row full outer join — the heavy work is the legs, which at
    * 100 TB are the index scans a search tier already runs. */
  def hybridSearchRrf(s: SparkSession, d: String): DataFrame = {
    val lex = SearchFacade.searchBm25(Tables.documents(s, d), "doc_id",
        "text", searchQuery, k = 20)
      .select(col("doc_id"), col("rank").as("lex_rank"))
    val sem = graft.datapipe.Similarity.knnBruteForce(
        Tables.embeddings(s, d),
        Tables.embeddings(s, d).filter(col("vec_id") === 0), k = 20)
      .select(col("neighbor_id").as("doc_id"),
        col("rank").cast("long").as("sem_rank"))
    lex.join(sem, Seq("doc_id"), "full")
      .select(col("doc_id"),
        coalesce(col("lex_rank"), lit(0L)).as("lex_rank"),
        coalesce(col("sem_rank"), lit(0L)).as("sem_rank"))
      .select(col("doc_id"), col("lex_rank"), col("sem_rank"),
        (when(col("lex_rank") > 0,
          expr(s"$RrfFp div ($RrfK0 + lex_rank)")).otherwise(lit(0L)) +
         when(col("sem_rank") > 0,
           expr(s"$RrfFp div ($RrfK0 + sem_rank)")).otherwise(lit(0L)))
          .as("rrf_fp"))
      .orderBy(col("rrf_fp").desc, col("doc_id"))
      .limit(10)
  }

  def hybridOracle: String =
    s"""WITH $bm25Ctes, lex AS (
       |  SELECT doc_id, rank FROM (
       |    SELECT doc_id,
       |      CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
       |    FROM scored
       |  ) WHERE rank <= 20
       |), sem AS (
       |  SELECT doc_id, rank FROM (
       |    SELECT c.vec_id AS doc_id,
       |      CAST(ROW_NUMBER() OVER (ORDER BY
       |        list_cosine_similarity(q.embedding, c.embedding) DESC,
       |        c.vec_id) AS BIGINT) AS rank
       |    FROM embeddings q, embeddings c
       |    WHERE q.vec_id = 0 AND c.vec_id <> 0
       |  ) WHERE rank <= 20
       |), fused AS (
       |  SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
       |    COALESCE(l.rank, 0) AS lex_rank,
       |    COALESCE(s.rank, 0) AS sem_rank
       |  FROM lex l FULL OUTER JOIN sem s ON s.doc_id = l.doc_id
       |)
       |SELECT doc_id, lex_rank, sem_rank,
       |  (CASE WHEN lex_rank > 0 THEN $RrfFp // ($RrfK0 + lex_rank) ELSE 0 END) +
       |  (CASE WHEN sem_rank > 0 THEN $RrfFp // ($RrfK0 + sem_rank) ELSE 0 END)
       |    AS rrf_fp
       |FROM fused ORDER BY rrf_fp DESC, doc_id LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q63
  /** Salted skew join on the query surface: revenue per supplier where
    * the fact side is salted into 8 buckets and the dim replicated per
    * bucket ([[Skew.saltedJoin]]) — semantically identical to the plain
    * join, which is exactly what the oracle checks (salting must never
    * lose or duplicate a row). */
  def saltedJoinRevenue(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_suppkey"),
        col("l_extendedprice").cast(DecimalType(18, 4)).as("p"))
    val sup = Tables.supplier(s, d)
      .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
    graft.datapipe.Skew.saltedJoin(li, sup, "l_suppkey", nSalts = 8)
      .groupBy(col("s_name"))
      .agg(sum(col("p")).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("s_name"))
  }

  def saltedJoinOracle: String =
    """SELECT s.s_name,
      |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  CAST(COUNT(*) AS BIGINT) AS n_items
      |FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |GROUP BY s.s_name ORDER BY s.s_name""".stripMargin

  // ---------------------------------------------------------------- q64
  /** Greedy sequence packing: per-language shards, whitespace token
    * counts, 2048-token batches. The token split uses an EXPLICIT
    * whitespace class (same reason as [[bpePattern]]: Java \s includes
    * U+000B, RE2's does not). */
  def sequencePacking(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), col("lang"),
        size(split(trim(col("text")), "[ \\t\\n\\r\\f]+")).cast("long").as("n_tokens"))
    Packing.packByBudget(docs, "lang", "doc_id", "n_tokens", tokenBudget = 2048L)
      .orderBy(col("doc_id"))
  }

  def sequencePackingOracle: String =
    """SELECT doc_id, lang,
      |  CAST(len(string_split_regex(trim(text), '[ \t\n\r\f]+')) AS BIGINT) AS n_tokens,
      |  CAST(floor((SUM(CAST(len(string_split_regex(trim(text), '[ \t\n\r\f]+')) AS BIGINT))
      |          OVER (PARTITION BY lang ORDER BY doc_id
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |        - CAST(len(string_split_regex(trim(text), '[ \t\n\r\f]+')) AS BIGINT))
      |       / 2048) AS BIGINT) AS batch_id
      |FROM documents WHERE length(trim(text)) > 0
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q65
  /** Deterministic weighted-mixture schedule over sources: the first
    * 500 schedule slots, weights up-sampling src1 (2x) and down-sampling src2 (0.5x). */
  def mixtureSchedule(s: SparkSession, d: String): DataFrame =
    Packing.mixtureSchedule(Tables.documents(s, d), "source", "doc_id",
        Map("src1" -> 2.0, "src2" -> 0.5), defaultWeight = 1.0)
      .filter(col("mix_rank") <= 500)
      .select(col("mix_rank"), col("doc_id"), col("source"))
      .orderBy(col("mix_rank"))

  def mixtureScheduleOracle: String =
    """WITH ranked AS (
      |  SELECT doc_id, source,
      |    CAST(row_number() OVER (PARTITION BY source
      |      ORDER BY substring(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id) AS DOUBLE)
      |    / (CASE source WHEN 'src1' THEN 2.0 WHEN 'src2' THEN 0.5 ELSE 1.0 END)
      |      AS position
      |  FROM documents
      |), sched AS (
      |  SELECT CAST(row_number() OVER (ORDER BY position, source, doc_id) AS BIGINT)
      |    AS mix_rank, doc_id, source
      |  FROM ranked
      |)
      |SELECT mix_rank, doc_id, source FROM sched
      |WHERE mix_rank <= 500 ORDER BY mix_rank""".stripMargin

  // ---------------------------------------------------------------- q66
  /** UNPIVOT (melt) — the inverse of q34's pivot, via the native
    * `Dataset.unpivot` API (plans as an Expand node: one pass, no
    * join/union of re-scans): a wide per-flag aggregate melts into
    * (flag, metric, value) long form. */
  def unpivotMetrics(s: SparkSession, d: String): DataFrame = {
    val wide = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        count(lit(1)).as("n_items"),
        countDistinct(col("l_suppkey")).as("n_suppliers"))
    wide.unpivot(
        Array(col("l_returnflag")),
        Array(col("sum_qty"), col("n_items"), col("n_suppliers")),
        "metric", "value")
      .orderBy(col("l_returnflag"), col("metric"))
  }

  def unpivotOracle: String =
    """WITH wide AS (
      |  SELECT l_returnflag,
      |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |    CAST(COUNT(*) AS BIGINT) AS n_items,
      |    CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers
      |  FROM lineitem GROUP BY l_returnflag
      |)
      |SELECT l_returnflag, metric, value FROM (
      |  SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM wide
      |  UNION ALL
      |  SELECT l_returnflag, 'n_items' AS metric, n_items AS value FROM wide
      |  UNION ALL
      |  SELECT l_returnflag, 'n_suppliers' AS metric, n_suppliers AS value FROM wide
      |)
      |ORDER BY l_returnflag, metric""".stripMargin

  // ------------------------------------------------------- q67 - q70
  /** String-mutation family (q67): global regexp redaction + translate
    * masking — the PII-scrub shape of a curation pipeline (here over
    * digit runs and vowels; the pattern, not the pattern LIST, is the
    * operator). RE2∩Java regex subset only. */
  def redaction(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      length(regexp_replace(col("text"), "[0-9]+", "#")).cast("long")
        .as("red_len"),
      substring(regexp_replace(col("text"), "[0-9]+", "#"), 1, 30)
        .as("red_prefix"),
      substring(translate(col("text"), "aeiou", "*****"), 1, 30)
        .as("masked_prefix"))
      .orderBy(col("doc_id"))

  def redactionOracle: String =
    """SELECT doc_id,
      |  CAST(length(regexp_replace(text, '[0-9]+', '#', 'g')) AS BIGINT) AS red_len,
      |  substring(regexp_replace(text, '[0-9]+', '#', 'g'), 1, 30) AS red_prefix,
      |  substring(translate(text, 'aeiou', '*****'), 1, 30) AS masked_prefix
      |FROM documents ORDER BY doc_id""".stripMargin

  private val setOpsDict = Seq("spark", "query", "window", "shuffle",
    "vector", "stream")

  /** Array set algebra (q68): per-document distinct-token set vs a
    * dictionary — union/intersect/except cardinalities (counts are
    * order-independent, so engine-specific element ordering cannot
    * leak into the compare). */
  def arraySetOps(s: SparkSession, d: String): DataFrame = {
    val dict = array(setOpsDict.map(lit): _*)
    val toks = array_distinct(filter(
      split(lower(col("text")), Tok.WS), t => t =!= ""))
    Tables.documents(s, d).select(
      col("doc_id"),
      size(array_intersect(toks, dict)).cast("long").as("n_inter"),
      size(array_union(toks, dict)).cast("long").as("n_union"),
      size(array_except(toks, dict)).cast("long").as("n_except"))
      .orderBy(col("doc_id"))
  }

  def arraySetOpsOracle: String = {
    val dict = setOpsDict.map(w => s"'$w'").mkString("[", ",", "]")
    s"""WITH tok AS (
       |  SELECT doc_id,
       |    list_distinct(list_filter(string_split_regex(lower(text), '${Tok.WS}'), t -> t <> '')) AS toks
       |  FROM documents
       |)
       |SELECT doc_id,
       |  CAST(len(list_intersect(toks, $dict)) AS BIGINT) AS n_inter,
       |  CAST(len(list_distinct(list_concat(toks, $dict))) AS BIGINT) AS n_union,
       |  CAST(len(list_filter(toks, t -> NOT list_contains($dict, t))) AS BIGINT) AS n_except
       |FROM tok ORDER BY doc_id""".stripMargin
  }

  /** Conditional-expression family (q69): nullif / coalesce / least /
    * greatest over integer-valued columns. */
  def conditionalFuncs(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") % 50 === 0)
      .select(
        col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        coalesce(nullif(col("l_quantity").cast("long"), lit(25L)), lit(-1L))
          .as("qty_not25"),
        least(col("l_quantity").cast("long"), lit(25L)).as("qty_floor"),
        greatest(col("l_quantity").cast("long"), lit(25L)).as("qty_ceil"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  def conditionalFuncsOracle: String =
    """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
      |  coalesce(nullif(CAST(l_quantity AS BIGINT), 25), -1) AS qty_not25,
      |  least(CAST(l_quantity AS BIGINT), 25) AS qty_floor,
      |  greatest(CAST(l_quantity AS BIGINT), 25) AS qty_ceil
      |FROM lineitem WHERE l_orderkey % 50 = 0
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Bitwise aggregate family (q70): bit_and / bit_or / bit_xor per
    * group + a shifted sum. */
  def bitwiseAgg(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(
        bit_and(col("o_orderkey")).as("key_and"),
        bit_or(col("o_orderkey")).as("key_or"),
        bit_xor(col("o_orderkey")).as("key_xor"),
        sum(shiftleft(col("o_custkey"), 2)).as("shifted_sum"))
      .orderBy(col("o_orderstatus"))

  def bitwiseAggOracle: String =
    """SELECT o_orderstatus,
      |  bit_and(o_orderkey) AS key_and,
      |  bit_or(o_orderkey) AS key_or,
      |  bit_xor(o_orderkey) AS key_xor,
      |  CAST(SUM(o_custkey << 2) AS BIGINT) AS shifted_sum
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------------- q71
  /** Approximate quantiles the engine-portable way (q71): a
    * deterministic 10% hash sample ([[Sampling.uniform]] — identical
    * row set on any engine/partitioning) followed by EXACT quantiles
    * over the sample. This is the scalable approximate-quantile
    * pattern whose result is still bit-reproducible: error ~
    * O(1/√|sample|) like any sampling sketch, but unlike t-digest/KLL
    * the result is deterministic and the oracle recomputes it exactly.
    * Money flows through integer cents so the quantile interpolation
    * runs on exact integers. */
  def sampledQuantiles(s: SparkSession, d: String): DataFrame = {
    val base = Tables.lineitem(s, d).select(
      col("l_returnflag"),
      (col("l_orderkey") * 10 + col("l_linenumber")).as("rowkey"),
      (col("l_extendedprice").cast(DecimalType(18, 4)) * 10000)
        .cast("long").as("cents"))
    Sampling.uniform(base, "rowkey", 0.1)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_sample"),
        expr("percentile(cents, 0.5)").as("median_cents"),
        expr("percentile(cents, 0.9)").as("p90_cents"),
        expr("percentile(cents, 0.99)").as("p99_cents"))
      .orderBy(col("l_returnflag"))
  }

  def sampledQuantilesOracle: String = {
    val t = Sampling.hexThreshold(0.1)
    s"""WITH base AS (
       |  SELECT l_returnflag,
       |    l_orderkey * 10 + l_linenumber AS rowkey,
       |    CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT) AS cents
       |  FROM lineitem
       |), samp AS (
       |  SELECT * FROM base
       |  WHERE substring(md5(CAST(rowkey AS VARCHAR)), 1, 8) < '$t'
       |)
       |SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_sample,
       |  percentile_cont(0.5) WITHIN GROUP (ORDER BY cents) AS median_cents,
       |  percentile_cont(0.9) WITHIN GROUP (ORDER BY cents) AS p90_cents,
       |  percentile_cont(0.99) WITHIN GROUP (ORDER BY cents) AS p99_cents
       |FROM samp GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  }

  // ---------------------------------------------------------------- q72
  /** Hourly resample + forward-fill over the event stream (users < 40
    * keep the grid bounded): every (user, hour) slot from the user's
    * first to last event, event counts with explicit zero gaps, and
    * the last observed value carried forward. */
  def resampleFfill(s: SparkSession, d: String): DataFrame =
    Resample.resampleFfill(
        Tables.events(s, d).filter(col("user_id") < 40),
        "user_id", "ts", "value", "event_id")
      .orderBy(col("user_id"), col("bucket_ts"))

  def resampleOracle: String =
    """WITH ev AS (
      |  SELECT *, date_trunc('hour', ts) AS hr FROM events WHERE user_id < 40
      |), ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY user_id, hr
      |    ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM ev
      |), hourly AS (
      |  SELECT user_id, hr, CAST(COUNT(*) AS BIGINT) AS n,
      |    MAX(CASE WHEN rn = 1 THEN value END) AS last_val
      |  FROM ranked GROUP BY user_id, hr
      |), span AS (
      |  SELECT user_id, date_trunc('hour', min(ts)) AS lo,
      |    date_trunc('hour', max(ts)) AS hi
      |  FROM ev GROUP BY user_id
      |), grid AS (
      |  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
      |  FROM span
      |)
      |SELECT g.user_id, g.hr AS bucket_ts,
      |  COALESCE(h.n, 0) AS n_events,
      |  last_value(h.last_val IGNORE NULLS) OVER (
      |    PARTITION BY g.user_id ORDER BY g.hr
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill_value
      |FROM grid g LEFT JOIN hourly h ON g.user_id = h.user_id AND g.hr = h.hr
      |ORDER BY g.user_id, bucket_ts""".stripMargin

  // ---------------------------------------------------------------- q73
  /** Benchmark-contamination scan: documents with doc_id ≡ 0 (mod 97)
    * act as the eval set; every other document sharing a 3-gram word
    * shingle with it is flagged with its shared-shingle count. */
  def contamination(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    Contamination.contaminated(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0),
        "doc_id", "text", n = 3)
      .orderBy(col("doc_id"))
  }

  def contaminationOracle: String =
    s"""WITH tok AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '${Tok.WS}'), t -> t <> '') AS toks
      |  FROM documents WHERE length(trim(text)) > 0
      |), sh AS (
      |  SELECT doc_id,
      |    list_distinct(CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
      |      ELSE list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' ')) END) AS sh
      |  FROM tok
      |), eval_sh AS (
      |  SELECT DISTINCT unnest(sh) AS s FROM sh WHERE doc_id % 97 = 0
      |), train_post AS (
      |  SELECT doc_id, unnest(sh) AS s FROM sh WHERE doc_id % 97 <> 0
      |)
      |SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
      |FROM train_post t JOIN eval_sh e ON t.s = e.s
      |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin

  // ---------------------------------------------------------------- q99
  /** Bloom-pruned contamination scan (q99): the q73 computation
    * through the broadcast-bloom + exact-verify path — same eval
    * split, same output, SAME oracle as q73 (the bloom is a pure
    * pruning stage, so the result is bit-identical by construction;
    * the gate proves it cross-engine). */
  def contaminationBloom(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    Contamination.contaminatedBloomPruned(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0),
        "doc_id", "text", n = 3)
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------- q98
  /** Decontamination ACTION (q98): the q73 scan's complement — the
    * training corpus with documents sharing ≥ 2 distinct eval
    * 3-gram shingles removed (minShared = 2 exercises the threshold,
    * not just the any-overlap complement of q73). */
  def decontaminated(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    Contamination.decontaminate(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0),
        "doc_id", "text", n = 3, minShared = 2L)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  def decontaminatedOracle: String =
    s"""WITH tok AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '${Tok.WS}'), t -> t <> '') AS toks
      |  FROM documents WHERE length(trim(text)) > 0
      |), sh AS (
      |  SELECT doc_id,
      |    list_distinct(CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
      |      ELSE list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' ')) END) AS sh
      |  FROM tok
      |), eval_sh AS (
      |  SELECT DISTINCT unnest(sh) AS s FROM sh WHERE doc_id % 97 = 0
      |), train_post AS (
      |  SELECT doc_id, unnest(sh) AS s FROM sh WHERE doc_id % 97 <> 0
      |), flagged AS (
      |  SELECT t.doc_id FROM train_post t JOIN eval_sh e ON t.s = e.s
      |  GROUP BY t.doc_id HAVING COUNT(*) >= 2
      |)
      |SELECT d.doc_id, d.source, d.n_chars FROM documents d
      |WHERE d.doc_id % 97 <> 0 AND d.doc_id NOT IN (SELECT doc_id FROM flagged)
      |ORDER BY d.doc_id""".stripMargin

  /** Stopword list as a DuckDB list literal (analyzer parity: the
    * Spark analyzer drops stopwords BEFORE stemming — dl must count
    * post-stopword tokens). The list is the ES mapping's exact
    * english_stop table (reference es-mapping/publication.json:9-780),
    * same resource [[SearchFacade.analyzeEnglish]] embeds. */
  private def stopListSql: String =
    graft.text.StopWords.esEnglish.toSeq.sorted
      .map(w => s"'${w.replace("'", "''")}'").mkString("[", ",", "]")

  /** Shared `tok` CTE body: the DuckDB mirror of
    * [[SearchFacade.analyzeEnglish]] — possessive strip, non-alnum
    * tokenize, ES english_stop list, then Lucene minimal_english
    * rule-for-rule (same WHEN order as the Column version). */
  private def analyzerTokSql: String =
    s"""SELECT doc_id, list_transform(
       |    list_filter(
       |      string_split_regex(regexp_replace(lower(text), '[''’＇]s\\b', '', 'g'), '[^\\p{L}\\p{N}]+'),
       |      t -> t <> '' AND NOT list_contains($stopListSql, t)),
       |    t -> CASE
       |      WHEN length(t) < 3 OR NOT regexp_matches(t, 's$$') THEN t
       |      WHEN regexp_matches(t, '(us|ss)$$') THEN t
       |      WHEN regexp_matches(t, '[^ae]ies$$') THEN regexp_replace(t, 'ies$$', 'y')
       |      WHEN regexp_matches(t, '[iaoe]es$$') THEN t
       |      ELSE substring(t, 1, length(t) - 1) END) AS toks
       |  FROM documents""".stripMargin

  def invertedSearchOracle: String = {
    val terms = SearchFacade.analyzeQueryTerms(searchQuery).distinct
    val conds = terms.map(t => s"list_contains(toks, '$t')").mkString(" AND ")
    // stopwords drop BEFORE stemming, exactly as the Spark analyzer
    // does — otherwise a stopword whose stem equals a query term would
    // make the oracle a superset of the implementation
    s"""WITH tok AS (
       |  $analyzerTokSql
       |)
       |SELECT doc_id FROM tok WHERE $conds ORDER BY doc_id""".stripMargin
  }
}
