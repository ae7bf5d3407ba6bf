package graft.datapipe

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Markdown → clean text extraction — the sibling of [[Html]] for the
  * large slice of crawl/docs corpora that ships as markdown (READMEs,
  * wikis, forum exports). Pretraining pipelines strip markup so the
  * model trains on prose, not asterisks.
  *
  * Entirely composed of codegen'd `regexp_replace` Columns — zero
  * shuffle, zero UDF; every pattern uses portable RE2/Java-common
  * syntax with explicit `(?m)` anchors so the DuckDB oracle replays
  * the SAME rewrite chain string-for-string. Rewrite order matters
  * and is part of the contract: fences before inline code, images
  * before links, bold before italics (the `**` pair would otherwise
  * be eaten as two `*`).
  */
object Markdown {

  /** The ordered rewrite chain. */
  def toText(md: Column): Column = {
    val steps: Seq[Column => Column] = Seq(
      c => regexp_replace(c, "(?m)^```[^\n]*$", ""),            // fence delimiters (keep code body)
      c => regexp_replace(c, "`([^`]*)`", "$1"),                // inline code
      c => regexp_replace(c, "!\\[([^\\]]*)\\]\\(([^)]*)\\)", "$1"),  // images -> alt
      c => regexp_replace(c, "\\[([^\\]]*)\\]\\(([^)]*)\\)", "$1"),   // links -> text
      c => regexp_replace(c, "(?m)^#{1,6}[ \t]*", ""),          // headers
      c => regexp_replace(c, "\\*\\*([^*]+)\\*\\*", "$1"),      // bold
      c => regexp_replace(c, "__([^_]+)__", "$1"),              // bold (underscore)
      c => regexp_replace(c, "\\*([^*\n]+)\\*", "$1"),          // italics
      c => regexp_replace(c, "(?m)^>[ \t]?", ""),               // blockquote markers
      c => regexp_replace(c, "(?m)^[ \t]*[-*+][ \t]+", ""),     // unordered list markers
      c => regexp_replace(c, "(?m)^[ \t]*[0-9]+\\.[ \t]+", ""), // ordered list markers
      c => regexp_replace(c, "(?m)^[-=_]{3,}[ \t]*$", ""),      // horizontal rules
      c => regexp_replace(c, "\n{3,}", "\n\n"))                 // collapse blank runs
    trim(steps.foldLeft(md)((c, f) => f(c)))
  }

  /** The identical chain as DuckDB SQL over column expression `col` —
    * the oracle is BUILT from the same pattern list, so the two
    * engines cannot drift silently.
    */
  def toTextSql(col: String): String = {
    val patterns = Seq(
      ("(?m)^```[^\n]*$", ""),
      ("`([^`]*)`", "\\1"),
      ("!\\[([^\\]]*)\\]\\(([^)]*)\\)", "\\1"),
      ("\\[([^\\]]*)\\]\\(([^)]*)\\)", "\\1"),
      ("(?m)^#{1,6}[ \t]*", ""),
      ("\\*\\*([^*]+)\\*\\*", "\\1"),
      ("__([^_]+)__", "\\1"),
      ("\\*([^*\n]+)\\*", "\\1"),
      ("(?m)^>[ \t]?", ""),
      ("(?m)^[ \t]*[-*+][ \t]+", ""),
      ("(?m)^[ \t]*[0-9]+\\.[ \t]+", ""),
      ("(?m)^[-=_]{3,}[ \t]*$", ""),
      ("\n{3,}", "\n\n"))
    val chained = patterns.foldLeft(col) { case (acc, (pat, rep)) =>
      // DuckDB plain '...' literals are escape-free: backslashes pass
      // through to RE2 verbatim (no doubling). Real newline/tab chars
      // become RE2's own \n/\t escapes so the SQL stays one line.
      val p = pat.replace("'", "''").replace("\n", "\\n").replace("\t", "\\t")
      s"regexp_replace($acc, '$p', '$rep', 'g')"
    }
    s"trim($chained)"
  }
}
