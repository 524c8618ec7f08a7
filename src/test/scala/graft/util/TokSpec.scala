package graft.util

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions._

/** Pins the [[Tok.WsSqlLit]] contract: embedding the whitespace
  * pattern in a Spark SQL string literal must survive the literal
  * parser's escape processing. The trap: `'\f'` is not a recognized
  * Spark literal escape, so the backslash is dropped and the regex
  * class gains a literal `f` — silently tokenizing "filter" as
  * "ilter" (caught by the q108 chunk-text oracle; aggregate-count
  * queries had been passing only because f-stripped tokens happened
  * not to collide on the bench corpus).
  */
class TokSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("WsSqlLit in a SQL literal: 'f' is NOT whitespace, \\f and \\t are") {
    import spark.implicits._
    val got = Seq("fast filtershuffle\tformfeed")
      .toDF("text")
      .select(expr(s"filter(split(text, '${Tok.WsSqlLit}'), t -> t <> '')"))
      .as[Seq[String]].head()
    assert(got == Seq("fast", "filter", "shuffle", "formfeed"))
  }

  test("WsSqlLit matches the Scala-side WsRegex tokenization exactly") {
    import spark.implicits._
    val texts = Seq("a\tb\nc\rde  f", "fif fof", " lead trail ")
    val sqlSide = texts.toDF("text")
      .select(expr(s"filter(split(text, '${Tok.WsSqlLit}'), t -> t <> '')"))
      .as[Seq[String]].collect().toSeq
    val scalaSide = texts.map(t =>
      Tok.WsRegex.split(t).toSeq.filter(_.nonEmpty))
    assert(sqlSide == scalaSide)
  }
}
