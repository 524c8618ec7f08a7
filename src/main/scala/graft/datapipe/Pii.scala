package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the privacy-scrub pass every
  * production training-data pipeline runs before release (the C4/
  * RefinedWeb-family "remove emails, IPs, phone numbers" step). A
  * fixed battery of patterns, each chosen to parse IDENTICALLY in
  * Java regex (Spark) and RE2 (DuckDB) — no lookarounds, no
  * backreferences, ASCII word boundaries only — so both the counts
  * and the redacted text are oracle-checkable byte-for-byte.
  *
  * Two faces:
  *  - [[detect]]: per-document match counts per kind, computed
  *    INDEPENDENTLY on the raw text (diagnostics — a match may belong
  *    to several kinds, e.g. an IPv4 inside an email host);
  *  - [[redact]]: sequential replacement in battery order (email
  *    first, so an address containing an IP-shaped host redacts as
  *    ONE email token, not a mangled hybrid); the redacted text is
  *    the release artifact.
  *
  * Scale shape: one narrow codegen'd projection per face — no
  * shuffle, no state, no UDF; linear in corpus bytes, trivially
  * streaming-safe (the batch plan IS the streaming plan). */
object Pii {

  /** (kind, pattern, replacement token), applied in order. */
  val Patterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>"),
    ("ipv4", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b",
      "<IP>"),
    ("phone", "\\+[0-9]{7,15}\\b", "<PHONE>"))

  private def countCols(t: Column): Seq[Column] =
    Patterns.map { case (kind, pat, _) =>
      size(regexp_extract_all(t, lit(pat), lit(0))).cast("long")
        .as(s"n_$kind")
    }

  private def totalCol: Column =
    Patterns.map { case (kind, _, _) => col(s"n_$kind") }
      .reduce(_ + _).as("n_pii")

  /** Per-doc independent match counts per kind + their sum. */
  def detect(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol) +: countCols(coalesce(col(textCol), lit(""))): _*)
      .withColumn("n_pii", totalCol)

  /** Sequentially redacted text (battery order) + the same counts —
    * still ONE projection, no join. */
  def redact(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val clean = Patterns.foldLeft(t) {
      case (acc, (_, pat, token)) => regexp_replace(acc, pat, token)
    }
    docs.select(col(idCol) +: countCols(t) :+ clean.as("clean_text"): _*)
      .withColumn("n_pii", totalCol)
  }
}
