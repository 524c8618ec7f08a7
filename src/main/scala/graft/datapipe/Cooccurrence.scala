package graft.datapipe

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Expressions
import graft.util.Tok

/** Windowed token co-occurrence counts + PMI — the statistic behind
  * GloVe co-occurrence matrices, collocation extraction ("New York"
  * scores high, "of the" low) and phrase-vocabulary induction for
  * tokenizer training. PMI(a,b) = log2( P(a,b) / (P(a)·P(b)) )
  * computed entirely in Q16 fixed point over exact integer counts:
  *
  *   pmi_q16 = lg(n_pair) + lg(N) − lg(n_a) − lg(n_b)
  *
  * with lg = [[graft.functions.Log2FixedExpr]] (codegen'd native
  * expression), so the score is a pure integer function of the counts
  * and a second engine replays it bit-for-bit (FixedLogSql prices the
  * oracle's log chain at the DISTINCT-count set, never the corpus).
  *
  * Scale shape: pair events come from an EQUI-join on (doc, position
  * + offset) — the window is exploded into w key probes per token, so
  * fan-out is exactly w·tokens, never the per-document quadratic a
  * `ON doc_id` join-then-filter would shuffle. Counts are partial-agg
  * groupBys; the corpus total is a broadcast 1-row relation; only the
  * deterministic top-k (unique (cnt desc, pair) total order) is
  * presentation-sorted. Domain: every count and the total must stay
  * below 2^42 (Log2FixedExpr's loud bound) — beyond that, shard the
  * total the way `Embeddings.shardedMoments` does. */
object Cooccurrence {

  /** Top-`topK` co-occurring unordered token pairs within a `window`-
    * token forward window, with marginal counts and Q16 PMI:
    * (tok_a, tok_b, n_pair, n_a, n_b, pmi_q16), n_pair desc. */
  /** The unordered pair-event relation (t1, t2) — one row per within-
    * window co-occurrence. Package-visible so PlanAuditSpec can pin
    * the equi-join shape. */
  private[graft] def pairEvents(docs: DataFrame, window: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(lower(col(textCol)), Tok.WS)).as(Seq("pos", "tok")))
      .filter(col("tok") =!= "")
    val probes = toks
      .select(col("doc_id"), col("pos"), col("tok").as("tok_a"),
        explode(array((1 to window).map(lit): _*)).as("off"))
      .select(col("doc_id"), (col("pos") + col("off")).as("pos_b"),
        col("tok_a"))
    probes
      .join(toks.select(col("doc_id"), col("pos").as("pos_b"),
        col("tok").as("tok_b")), Seq("doc_id", "pos_b"))
      .select(least(col("tok_a"), col("tok_b")).as("t1"),
        greatest(col("tok_a"), col("tok_b")).as("t2"))
  }

  def pmiPairs(docs: DataFrame, window: Int, topK: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(window >= 1 && topK >= 1)
    val ev = pairEvents(docs, window, idCol, textCol).persist()
    val pairCnt = ev.groupBy(col("t1"), col("t2"))
      .agg(count(lit(1)).as("n_pair"))
    val marg = ev.select(explode(array(col("t1"), col("t2"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("m"))
    val tot = ev.agg(count(lit(1)).as("n_tot"))
    def lg(c: org.apache.spark.sql.Column) = Expressions.log2_fixed(c, 16)
    val out = pairCnt
      .orderBy(col("n_pair").desc, col("t1"), col("t2")).limit(topK)
      .join(marg.select(col("tok").as("t1"), col("m").as("n_a")), "t1")
      .join(marg.select(col("tok").as("t2"), col("m").as("n_b")), "t2")
      .crossJoin(broadcast(tot))
      .select(col("t1").as("tok_a"), col("t2").as("tok_b"),
        col("n_pair"), col("n_a"), col("n_b"),
        (lg(col("n_pair")) + lg(col("n_tot")) - lg(col("n_a")) -
          lg(col("n_b"))).as("pmi_q16"))
      .orderBy(col("n_pair").desc, col("tok_a"), col("tok_b"))
      .localCheckpoint(true) // top-k-sized; free the pair-event cache
    ev.unpersist()
    out
  }
}
