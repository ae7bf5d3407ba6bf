package graft.datapipe

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over a
  * `documents(text)` corpus: token counting, quality scoring, n-gram
  * language ID, fingerprinting. All pure Column programs — they run
  * inside whole-stage codegen, shuffle nothing, and scale linearly with
  * the corpus.
  */
object TextAnalysis {

  /** Whitespace token count (empty-safe). */
  def tokenCountWs(text: Column): Column =
    size(filter(split(text, "\\s+"), t => t =!= ""))

  /** BPE-ish token count: letter runs, digit runs, and single
    * punctuation each count as one token.
    */
  val bpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def tokenCountBpeish(text: Column): Column = regexp_count(text, lit(bpeishPattern))

  /** Words as an array (lowercased, empty-safe). */
  def words(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= "")

  /** Sliding word n-grams — "w-shingles" (the classic resemblance
    * unit): order-SENSITIVE dedup units, where word-set hashing calls
    * any reordering of the same words a duplicate. Documents shorter
    * than `n` words collapse to one whole-document shingle. Pure
    * Column (transform over an index sequence), no explode here — the
    * consumer explodes once, exactly like with `words`.
    */
  def shingles(text: Column, n: Int): Column = {
    require(n >= 2, "use words() for n=1")
    graft.functions.WordShingles.of(words(text), n)
  }

  /** The pre-kernel HOF formulation of `shingles` — kept as the
    * executable specification the codegen kernel is equality-tested
    * against (graft.functions.WordShingles scaladoc has the numbers).
    */
  def shinglesHof(text: Column, n: Int): Column = {
    require(n >= 2, "use words() for n=1")
    val ws = words(text)
    val count = size(ws) - (n - 1)
    when(count <= 0, array(array_join(ws, " ")))
      .otherwise(transform(sequence(lit(0), count - 1),
        i => array_join(slice(ws, i + 1, lit(n)), " ")))
  }

  /** Context-window chunking over a BOUND word-array column: windows
    * of `width` words advancing by `stride` (< width ⇒ overlap, the
    * usual boundary-context trick). Chunk i covers words
    * [i·stride, i·stride + width); the last chunk may be short; empty
    * docs produce one empty chunk. Pure Column — the array of chunk
    * strings; the consumer explodes with `posexplode` for
    * (chunk_id, chunk). `ws` MUST be a projected attribute: the
    * chunk lambda slices it per window, and Catalyst does not CSE
    * inside lambda bodies, so an inline `words(text)` here re-splits
    * the document once per chunk — O(words²/stride) per doc (the
    * q_dsir_score lesson; see the verify notes).
    */
  def chunksOfWords(ws: Column, width: Int, stride: Int): Column = {
    require(width >= 1 && stride >= 1 && stride <= width, "need 1 <= stride <= width")
    // Number of chunks: smallest c with c·stride + (width−stride) >= n,
    // i.e. ceil(max(n − width, 0) / stride) + 1 — windows starting past
    // the end would duplicate the tail.
    val n = size(ws)
    val nChunks = ceil(greatest(n - width, lit(0)).cast("double") / lit(stride.toDouble)).cast("int") + 1
    transform(sequence(lit(0), nChunks - 1),
      i => array_join(slice(ws, i * stride + 1, lit(width)), " "))
  }

  /** Convenience form over raw text — fine for one-off row-level use;
    * hot paths bind `words(text)` to an attribute first and call
    * [[chunksOfWords]] (see the scaladoc there for why).
    */
  def chunks(text: Column, width: Int, stride: Int): Column =
    chunksOfWords(words(text), width, stride)

  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "in", "to", "is")

  def stopwordCount(text: Column): Column =
    size(filter(words(text), w => w.isin(stopwords: _*)))

  def punctCount(text: Column): Column = regexp_count(text, lit("[^A-Za-z0-9\\s]"))

  /** Quality score (reference-style length/punct/stopword heuristics):
    * higher = more natural-language-like. Deterministic double
    * arithmetic only — identical on any engine.
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCountWs(text).cast("double")
    val nChars = length(text).cast("double")
    val punctRatio = punctCount(text).cast("double") / greatest(nChars, lit(1.0))
    val stopRatio = stopwordCount(text).cast("double") / greatest(nTok, lit(1.0))
    val avgWordLen = nChars / greatest(nTok, lit(1.0))
    stopRatio * lit(2.0) - punctRatio * lit(4.0) +
      when(avgWordLen >= 3.0 && avgWordLen <= 9.0, 1.0).otherwise(-1.0)
  }

  /** THE DuckDB twin of [[qualityScore]] — the single renderer every
    * oracle uses (three hand-copied variants once coexisted across the
    * registries; a formula change updated in one site would leave the
    * others verifying a different score). Same pattern as
    * Gopher.rulesSql / Markdown.toTextSql: formula and twin live
    * side by side.
    */
  def qualityScoreSql: String = {
    val stopwordsIn = stopwords.map(w => s"'$w'").mkString(", ")
    s"""CAST(len(list_filter(string_split_regex(lower(text), '\\s+'), w -> w IN ($stopwordsIn))) AS DOUBLE)
       |    / greatest(CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS DOUBLE), 1.0) * CAST(2.0 AS DOUBLE)
       |  - CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
       |    / greatest(CAST(length(text) AS DOUBLE), 1.0) * CAST(4.0 AS DOUBLE)
       |  + CASE WHEN CAST(length(text) AS DOUBLE) / greatest(CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS DOUBLE), 1.0) BETWEEN 3.0 AND 9.0
       |         THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END""".stripMargin
  }

  /** Marker-word language ID. Counts hits from tiny per-language marker
    * sets over the padded text, argmax with a fixed precedence order —
    * the n-gram-heuristic shape of fastText-free language ID.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of "),
    "de" -> Seq(" der ", " und ", " nicht "),
    "es" -> Seq(" el ", " la ", " que "),
    "fr" -> Seq(" le ", " les ", " est "),
    "zh" -> Seq("的", "是", "了"))

  def langHits(text: Column, markers: Seq[String]): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    markers.map(m => (length(padded) - length(replace(padded, lit(m), lit("")))).cast("bigint") / lit(m.length).cast("bigint"))
      .reduce(_ + _)
  }

  /** Argmax over language hit counts; "und" (undetermined) when all 0. */
  def langId(text: Column): Column = {
    val hits = langMarkers.map { case (lang, ms) => lang -> langHits(text, ms) }
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    hits.foldLeft(when(best <= 0, "und")) { case (acc, (lang, h)) => acc.when(h === best, lang) }
      .otherwise("und")
  }

  /** Fraction of word occurrences that are repeats of an earlier word
    * (1 − distinct/total): the intra-document repetition signal behind
    * "excessive duplication" quality filters. 0.0 for empty docs.
    */
  def dupWordFraction(text: Column): Column = {
    val ws = words(text)
    when(size(ws) === 0, lit(0.0)).otherwise(
      lit(1.0) - size(array_distinct(ws)).cast("double") / size(ws).cast("double"))
  }

  /** Same repetition signal over word n-grams — catches copy-pasted
    * phrases that distinct-word counting misses.
    */
  def dupShingleFraction(text: Column, n: Int): Column = {
    val sh = shingles(text, n)
    lit(1.0) - size(array_distinct(sh)).cast("double") / size(sh).cast("double")
  }

  /** Fraction of n-gram occurrences taken by the single most frequent
    * n-gram. Computed as the longest equal-run of the SORTED shingle
    * array — a pure fold, no explode/shuffle: state is
    * (prev, run, best), each element either extends the run or resets
    * it.
    */
  def topShingleFraction(text: Column, n: Int): Column = {
    val sh = array_sort(shingles(text, n))
    val folded = aggregate(
      sh,
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1).otherwise(lit(1))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      })
    folded.getField("best").cast("double") / size(sh).cast("double")
  }

  /** PII scrubbing: replace email addresses and NANP-style phone
    * numbers with typed placeholder tags. Pure regexp_replace chain —
    * codegen'd, linear, no shuffle; the regexes stay inside the RE2 ∩
    * java.util.regex common dialect so any engine agrees.
    */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(text, emailPattern, "[EMAIL]"), phonePattern, "[PHONE]")

  /** Validated PII: the pattern alone over-matches, so these families
    * pair a candidate regex with a semantic VALIDATOR and only the
    * validated matches count/redact — the standard move of the public
    * code-corpus scrubbing pipelines (a 16-digit number is only a card
    * if its Luhn checksum closes; "10.1.2.300" is dotted digits but
    * not an address). Both validators are pure Column arithmetic over
    * the candidate string (no UDF, fully codegen-lowered HOFs), so the
    * whole family stays a linear, shuffle-free, per-row map — the
    * 100 TB shape is "as fast as the scan".
    */
  val ipv4Pattern = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val ccCandidatePattern = "\\b[0-9]{13,19}\\b"

  /** All regex matches of `pattern` in `text` (whole-match group 0 —
    * the patterns use non-capturing groups only).
    */
  def candidates(text: Column, pattern: String): Column =
    regexp_extract_all(text, lit(pattern), lit(0))

  /** Luhn checksum validity of a digit string (ISO/IEC 7812 mod-10:
    * from the rightmost digit, double every second digit, subtract 9
    * from two-digit doubles, valid iff the sum ≡ 0 mod 10). The digit
    * walk runs over the ≤19-char candidate, not the document, so the
    * lambda-CSE trap (see the verify notes) costs nothing here.
    */
  def luhnValid(digits: Column): Column = {
    val rev = reverse(digits)
    val s = aggregate(
      transform(sequence(lit(1), length(rev)), i => {
        val d = rev.substr(i, lit(1)).cast("int")
        when(pmod(i, lit(2)) === 0,
          when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
      }),
      lit(0), (acc, x) => acc + x)
    pmod(s, lit(10)) === 0
  }

  /** Octet-range validity of a dotted-quad candidate (every octet
    * ≤ 255 — the pattern already guarantees 1–3 digits per octet).
    */
  def validIpv4(candidate: Column): Column =
    forall(split(candidate, "\\."), o => o.cast("int") <= 255)

  /** Replace every VALIDATED candidate with `tag` by folding a literal
    * substring replace over the validated-candidate array (conditional
    * per-match replacement is inexpressible as one regexp_replace).
    * Literal replace carries a documented caveat: a validated candidate
    * that recurs as a substring of surrounding text is replaced there
    * too — acceptable for scrubbing (over-redaction of an exact PII
    * string is the safe direction), and \b-anchored extraction keeps
    * candidates from starting mid-number.
    */
  def redactValidated(text: Column, validated: Column, tag: String): Column =
    aggregate(validated, text, (acc, c) => replace(acc, c, lit(tag)))

  /** Full scrubbing chain, fixed order: Luhn-valid card numbers, then
    * valid IPv4 addresses (both validated fold-replaces over the raw
    * text's candidates), then the email/phone regexp_replace pair.
    */
  def redactPiiStrict(text: Column): Column = {
    val cc = redactValidated(text,
      filter(candidates(text, ccCandidatePattern), c => luhnValid(c)), "[CC]")
    val ip = redactValidated(cc,
      filter(candidates(text, ipv4Pattern), c => validIpv4(c)), "[IP]")
    redactPii(ip)
  }

  /** Content fingerprint: md5 over whitespace-normalized lowercase. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))

  /** Rolling (chained) hash over the word sequence — order-sensitive,
    * unlike `fingerprint`: h = md5(…md5(md5(w1 ∥ w2) ∥ w3)…). Detects
    * token-order edits that a bag-of-words hash misses.
    */
  def rollingFingerprint(text: Column): Column = {
    val ws = words(text)
    when(size(ws) === 0, lit(null: String))
      .otherwise(aggregate(ws, lit(""), (acc, w) => md5(concat(acc, w))))
  }
}
