package graft.datapipe

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The Gopher document-quality rules (Rae et al. 2021, appendix A1.1)
  * — the published heuristic filter set most large-corpus pipelines
  * start from: word-count bounds, mean-word-length bounds, symbol and
  * bullet/ellipsis ratios, alphabetic-word fraction, and a stop-word
  * floor.
  *
  * Every rule is evaluated in INTEGER arithmetic (`10·bullets ≤
  * 9·lines` instead of `bullets/lines ≤ 0.9`), so outcomes are exact
  * and engine-portable — no IEEE ratio ever decides a document's fate
  * differently on different hardware. All counts are pure Column
  * folds/regex counts: the whole gate runs inside the scan with zero
  * shuffle, the same shape as [[TextAnalysis.qualityScore]] and
  * [[Classifier]].
  */
object Gopher {

  /** Integer rule bounds; defaults are the published Gopher values
    * (mean word length 3–10, symbols ≤ 1/10 words, bullets ≤ 9/10
    * lines, ellipsis ≤ 3/10 lines, alpha words ≥ 8/10, ≥ 2 stop
    * words) with the word window parameterized.
    */
  final case class Config(minWords: Long = 50L, maxWords: Long = 100000L,
                          minMeanLen: Long = 3L, maxMeanLen: Long = 10L,
                          minStopwords: Long = 2L)

  val stopwords: Seq[String] = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** All rule verdicts + the counts they derive from, as one struct
    * column: (n_words, n_lines, total_word_len, n_symbols, n_bullets,
    * n_ellipsis, n_alpha_words, n_stop, r1..r7 booleans, keep).
    */
  def rules(text: Column, cfg: Config = Config()): Column = {
    val t = coalesce(text, lit(""))
    val ws = TextAnalysis.words(t)
    val nWords = size(ws).cast("long")
    val totalLen = aggregate(transform(ws, w => length(w).cast("long")), lit(0L), _ + _)
    val nSymbols = (regexp_count(t, lit("#")) + regexp_count(t, lit("\\.\\.\\.")) +
      regexp_count(t, lit("…"))).cast("long")
    val lines = split(t, "\n")
    val nLines = size(lines).cast("long")
    val nBullets = size(filter(lines, l => l.rlike("^\\s*[-*•]"))).cast("long")
    val nEllipsis = size(filter(lines, l => l.rlike("(\\.\\.\\.|…)\\s*$"))).cast("long")
    val nAlpha = size(filter(ws, w => w.rlike("[a-zA-Z]"))).cast("long")
    val nStop = size(array_intersect(array_distinct(ws),
      typedlit(stopwords))).cast("long")

    val r1 = nWords >= cfg.minWords && nWords <= cfg.maxWords
    val r2 = totalLen >= lit(cfg.minMeanLen) * nWords && totalLen <= lit(cfg.maxMeanLen) * nWords
    val r3 = nSymbols * 10L <= nWords
    val r4 = nBullets * 10L <= nLines * 9L
    val r5 = nEllipsis * 10L <= nLines * 3L
    val r6 = nAlpha * 10L >= nWords * 8L
    val r7 = nStop >= cfg.minStopwords
    struct(
      nWords.as("n_words"), nLines.as("n_lines"), totalLen.as("total_word_len"),
      nSymbols.as("n_symbols"), nBullets.as("n_bullets"), nEllipsis.as("n_ellipsis"),
      nAlpha.as("n_alpha_words"), nStop.as("n_stop"),
      r1.as("ok_word_count"), r2.as("ok_mean_len"), r3.as("ok_symbols"),
      r4.as("ok_bullets"), r5.as("ok_ellipsis"), r6.as("ok_alpha"), r7.as("ok_stopwords"),
      (r1 && r2 && r3 && r4 && r5 && r6 && r7).as("keep"))
  }

  /** DuckDB twin of [[rules]]: a full flattened query over `src`
    * (which must expose `$idSql` and a `txt` column — the fixture),
    * token-for-token integer replay of every count and verdict.
    */
  def rulesSql(src: String, idSql: String, cfg: Config = Config()): String = {
    val t = "coalesce(txt, '')"
    val ws = s"list_filter(string_split_regex(lower($t), '\\s+'), x -> x <> '')"
    val stops = stopwords.map(s => s"'$s'").mkString("[", ", ", "]")
    s"""SELECT $idSql,
       |  nw AS n_words, nl AS n_lines, tl AS total_word_len, ns AS n_symbols,
       |  nb AS n_bullets, ne AS n_ellipsis, na AS n_alpha_words, nst AS n_stop,
       |  (nw >= ${cfg.minWords} AND nw <= ${cfg.maxWords}) AS ok_word_count,
       |  (tl >= ${cfg.minMeanLen} * nw AND tl <= ${cfg.maxMeanLen} * nw) AS ok_mean_len,
       |  (ns * 10 <= nw) AS ok_symbols,
       |  (nb * 10 <= nl * 9) AS ok_bullets,
       |  (ne * 10 <= nl * 3) AS ok_ellipsis,
       |  (na * 10 >= nw * 8) AS ok_alpha,
       |  (nst >= ${cfg.minStopwords}) AS ok_stopwords,
       |  ((nw >= ${cfg.minWords} AND nw <= ${cfg.maxWords})
       |    AND (tl >= ${cfg.minMeanLen} * nw AND tl <= ${cfg.maxMeanLen} * nw)
       |    AND ns * 10 <= nw AND nb * 10 <= nl * 9 AND ne * 10 <= nl * 3
       |    AND na * 10 >= nw * 8 AND nst >= ${cfg.minStopwords}) AS keep
       |FROM (SELECT $idSql,
       |   CAST(len($ws) AS BIGINT) AS nw,
       |   CAST(coalesce(list_sum(list_apply($ws, w -> length(w))), 0) AS BIGINT) AS tl,
       |   CAST(len(regexp_extract_all($t, '#')) + len(regexp_extract_all($t, '\\.\\.\\.'))
       |     + len(regexp_extract_all($t, '…')) AS BIGINT) AS ns,
       |   CAST(len(string_split($t, chr(10))) AS BIGINT) AS nl,
       |   CAST(len(list_filter(string_split($t, chr(10)), l -> regexp_matches(l, '^\\s*[-*•]'))) AS BIGINT) AS nb,
       |   CAST(len(list_filter(string_split($t, chr(10)), l -> regexp_matches(l, '(\\.\\.\\.|…)\\s*$$'))) AS BIGINT) AS ne,
       |   CAST(len(list_filter($ws, w -> regexp_matches(w, '[a-zA-Z]'))) AS BIGINT) AS na,
       |   CAST(len(list_filter(list_distinct($ws), w -> list_contains($stops, w))) AS BIGINT) AS nst
       | FROM $src)""".stripMargin
  }
}
