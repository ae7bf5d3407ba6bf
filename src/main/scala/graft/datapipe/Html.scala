package graft.datapipe

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction for web-crawl corpora — the step that sits
  * in front of every quality/dedup operator when the input is raw
  * pages rather than clean text. Beyond-reference op (the reference
  * ingests structured records only): covers the trafilatura/jusText
  * niche with a deliberately deterministic, regex-only pipeline so a
  * SQL oracle can recompute it bit-for-bit.
  *
  * Every regex here is restricted to the common subset of Java
  * `java.util.regex` (Spark codegen) and RE2 (DuckDB/oracle): no
  * lookahead/lookbehind/backreferences; non-greedy `.*?` and inline
  * `(?is)` flags only. That keeps the whole pipeline inside
  * whole-stage codegen on the Spark side (pure `Column`, zero
  * shuffle, zero UDF) AND cross-checkable by an independent engine.
  *
  * Pipeline contract (documented because downstream counts depend on
  * it): (1) drop `<script>`/`<style>`/`<title>` elements with their
  * content;
  * (2) turn block-level closers + `<br>` into newlines so paragraph
  * structure survives; (3) strip every remaining tag to a space;
  * (4) decode the five XML entities plus `&nbsp;` — `&amp;` LAST so
  * `&amp;lt;` decodes to the literal `&lt;` and not to `<`;
  * (5) collapse whitespace runs and trim.
  */
object Html {

  /** Script, style, and title elements vanish entirely — their text
    * is code or metadata, not prose (title has its own extractor).
    * Non-greedy body match; an unclosed element is left alone (better
    * to over-keep than to eat the rest of the page).
    */
  def dropScriptStyle(html: Column): Column =
    Seq("script", "style", "title").foldLeft(html)((c, tag) =>
      regexp_replace(c, s"(?is)<$tag[^>]*>.*?</$tag>", " "))

  /** Block-structure closers become newlines BEFORE generic tag
    * stripping, so "…end.</p><p>Start…" doesn't fuse into one word.
    */
  def blockBreaks(html: Column): Column =
    regexp_replace(html, "(?i)<br[^>]*>|</(?:p|div|li|ul|ol|h[1-6]|tr|table|blockquote)>", "\n")

  /** Any remaining tag (open, close, comment-less) → single space. */
  def stripTags(html: Column): Column =
    regexp_replace(regexp_replace(html, "(?s)<!--.*?-->", " "), "<[^>]*>", " ")

  /** The six entities that dominate real crawls. `&amp;` is decoded
    * last on purpose — see the object doc.
    */
  def decodeEntities(text: Column): Column = {
    val steps: Seq[(String, String)] = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    steps.foldLeft(text) { case (c, (from, to)) => replace(c, lit(from), lit(to)) }
  }

  /** Full page → prose: the five steps above, then whitespace
    * normalization. Pure Column; one codegen stage per row.
    */
  def extractText(html: Column): Column =
    trim(regexp_replace(
      decodeEntities(stripTags(blockBreaks(dropScriptStyle(html)))),
      "\\s+", " "))

  /** First `<title>` body, entity-decoded and trimmed; empty string
    * when the page has none (regexp_extract's no-match value).
    */
  def title(html: Column): Column =
    trim(decodeEntities(regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1)))

  /** Every double-quoted href value, in document order. Unquoted and
    * single-quoted hrefs are out of contract (and out of the test
    * fixtures) — a crawler normalizes quoting before this point.
    */
  def links(html: Column): Column =
    regexp_extract_all(html, lit("(?i)href=\"([^\"]*)\""), lit(1))

  /** Visible-text to raw-markup size ratio — the classic boilerplate
    * page detector (link farms and chrome-only pages score near 0).
    * 0.0 for an empty page rather than a divide-by-null.
    */
  def textRatio(html: Column): Column = {
    val n = length(html)
    when(coalesce(n, lit(0)) === 0, lit(0.0))
      .otherwise(length(extractText(html)).cast("double") / n.cast("double"))
  }
}
