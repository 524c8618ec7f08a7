package graft.util

/** Whitespace tokenization shared VERBATIM between the Spark-side
  * tokenizers and the DuckDB oracle SQL.
  *
  * An explicit character class, not `\s`: Java's `\s` matches vertical
  * tab U+000B while DuckDB's RE2 `\s` does not, so any document
  * containing a vertical tab would silently break oracle parity — the
  * same cross-engine divergence `Round4Queries.bpePattern` documents
  * and works around. `\t` `\n` `\r` `\f` escapes parse identically in
  * Java regex and RE2, and the literal also passes unmodified through
  * a DuckDB single-quoted string (no backslash processing there).
  */
object Tok {
  /** Whitespace-run split pattern, valid in both Java regex and RE2. */
  val WS: String = "[ \\t\\n\\r\\f]+"

  /** The same pattern pre-compiled for driver/closure-side twins of
    * the Column tokenizers. */
  val WsRegex: scala.util.matching.Regex = WS.r

  /** [[WS]] escaped for embedding in a SPARK SQL single-quoted string
    * literal (`expr(s"split(c, '$WsSqlLit')")`). Spark's literal
    * parser processes C-style escapes BEFORE the regex engine sees the
    * pattern: `\t`/`\n`/`\r` become the real control characters (same
    * regex meaning, harmless) but `\f` is not a recognized escape, so
    * the backslash is DROPPED and the class gains a literal `f` —
    * silently tokenizing "filter" as "ilter". Doubling the
    * backslashes survives the literal parse intact. DuckDB literals
    * need no escaping ([[WS]] embeds verbatim there); this constant is
    * for Spark-side `expr(...)` strings only. */
  val WsSqlLit: String = WS.replace("\\", "\\\\")
}
