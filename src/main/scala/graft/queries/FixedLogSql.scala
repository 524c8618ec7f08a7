package graft.queries

/** DuckDB mirror of [[graft.functions.Log2FixedExpr]]: the same
  * square-and-shift fixed-point log2, unrolled as a WITH-chain over a
  * relation of DISTINCT input values. Oracles collect every value they
  * need a log of into one small `lv(v)` CTE (bucket counts + corpus
  * totals — never row data), run this chain once, and join the results
  * back by value — so the 16-step unroll prices at the model size, not
  * the corpus size, in BOTH engines.
  */
object FixedLogSql {

  /** CTE block computing `<p>log(v, lg)` — lg = log2Fixed(v, fracBits)
    * — from an existing CTE `<p>v(v)` of positive BIGINTs (p =
    * `prefix`, default "l", so the default in/out names are `lv` /
    * `llog`). Splice into a WITH chain AFTER the input CTE; pass a
    * distinct prefix to instantiate the chain more than once in one
    * query (the q124 funnel needs it for entropy AND DSIR). */
  def logCtes(fracBits: Int = 16, prefix: String = "l"): String = {
    val two21 = 1L << 21
    val p = prefix
    val steps = (1 to fracBits).map { j =>
      val bit = 1L << (fracBits - j)
      s"""${p}l$j AS (
         |  SELECT v,
         |    CASE WHEN ((m * m) >> 20) >= $two21 THEN ((m * m) >> 20) >> 1
         |         ELSE (m * m) >> 20 END AS m,
         |    acc + CASE WHEN ((m * m) >> 20) >= $two21 THEN $bit ELSE 0 END AS acc
         |  FROM ${p}l${j - 1}
         |)""".stripMargin
    }
    s"""${p}le AS (
       |  SELECT v, CAST(length(bin(v)) - 1 AS BIGINT) AS e FROM ${p}v
       |), ${p}l0 AS (
       |  SELECT v,
       |    CASE WHEN e <= 20 THEN v << (20 - e) ELSE v >> (e - 20) END AS m,
       |    e * ${1L << fracBits} AS acc
       |  FROM ${p}le
       |), ${steps.mkString(", ")}, ${p}log AS (
       |  SELECT v, acc AS lg FROM ${p}l$fracBits
       |)""".stripMargin
  }
}
