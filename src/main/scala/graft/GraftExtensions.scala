package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{BioTokenCountExpr, CosineSimExpr, MinHashBandsExpr, MinHashBandsMd5Expr, SimHashExpr, SimHashMd5Expr, ZOrder2Expr}

/** SparkSessionExtensions entry point: registers the native graft
  * expressions as SQL functions so `spark.sql("SELECT simhash64(text)
  * ...")` works in any session built with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("bio_token_count"),
      info("bio_token_count", "bio_token_count(text) - biomedical token count"),
      ((args: Seq[Expression]) => BioTokenCountExpr(args.head)): FunctionBuilder))
    e.injectFunction((
      FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(text) - 64-bit SimHash of the token stream"),
      ((args: Seq[Expression]) => SimHashExpr(args.head)): FunctionBuilder))
    e.injectFunction((
      FunctionIdentifier("simhash64_md5"),
      info("simhash64_md5",
        "simhash64_md5(text) - engine-portable 64-bit SimHash (md5 token hash)"),
      ((args: Seq[Expression]) => SimHashMd5Expr(args.head)): FunctionBuilder))
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      info("cosine_sim",
        "cosine_sim(a, b) - cosine similarity of two float arrays"),
      ((args: Seq[Expression]) => CosineSimExpr(args.head, args(1))): FunctionBuilder))
    // the band-key params are plan-shaping (they fix the output arity),
    // so SQL callers pass them as integer literals
    def intLit(e: Expression, name: String): Int = {
      require(e.foldable, s"$name: numPerm/shingleN/bands must be literals")
      e.eval().asInstanceOf[Number].intValue()
    }
    e.injectFunction((
      FunctionIdentifier("minhash_bands"),
      info("minhash_bands",
        "minhash_bands(text, numPerm, shingleN, bands) - MinHash LSH band keys (fnv fast path)"),
      ((args: Seq[Expression]) => MinHashBandsExpr(args.head,
        intLit(args(1), "minhash_bands"), intLit(args(2), "minhash_bands"),
        intLit(args(3), "minhash_bands"))): FunctionBuilder))
    e.injectFunction((
      FunctionIdentifier("minhash_bands_md5"),
      info("minhash_bands_md5",
        "minhash_bands_md5(text, numPerm, shingleN, bands) - engine-portable MinHash LSH band keys"),
      ((args: Seq[Expression]) => MinHashBandsMd5Expr(args.head,
        intLit(args(1), "minhash_bands_md5"), intLit(args(2), "minhash_bands_md5"),
        intLit(args(3), "minhash_bands_md5"))): FunctionBuilder))
    e.injectFunction((
      FunctionIdentifier("zorder2"),
      info("zorder2",
        "zorder2(a, b) - sign-correct Morton z-value of two ints"),
      ((args: Seq[Expression]) => ZOrder2Expr(args.head, args(1))): FunctionBuilder))
    // rewrite contains(text, surface) inner joins into broadcast
    // Aho-Corasick scans (SURVEY §4 candidate strategy)
    e.injectPlannerStrategy(_ => graft.plans.DictionaryJoinStrategy)
  }
}
