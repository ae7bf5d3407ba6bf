package graft.datapipe

import graft.ops.Joins
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Duplicate-SPAN detection and removal — exact substring dedup in the
  * style of Lee et al. 2022 ("Deduplicating Training Data Makes
  * Language Models Better"): a span of `w` consecutive words that
  * occurs at least `minCount` times ACROSS THE CORPUS (within-doc
  * repeats included) is a duplicated span; documents keep their unique
  * prose but lose the boilerplate/quote/template runs that document-
  * level dedup (exact or near) cannot touch. Beyond-reference op: the
  * reference has no substring-level dedup at all.
  *
  * The paper builds a suffix array; the Spark-native formulation is a
  * positional w-shingle count-join — same duplicated-span set for
  * match length w, expressed as ONE corpus aggregation (shingle →
  * count) plus ONE join of the positional shingle table against the
  * minCount-pruned duplicate set (a small fraction of the vocabulary,
  * evidence-gated broadcast). Everything downstream (interval union,
  * text reconstruction) is per-document bounded. No collect, no
  * cartesian, no suffix array to shard.
  *
  * Docs with fewer than `w` words have no spans by definition (route
  * short docs to a length gate). Covered-token accounting is the size
  * of the UNION of the [pos, pos+w) intervals, so overlapping
  * duplicated spans are not double-counted.
  */
object DupSpans {

  /** Positional w-shingles as an array (no whole-doc collapse —
    * unlike [[TextAnalysis.shingles]], a doc shorter than `w` words
    * has NO spans).
    */
  private def spanArray(ws: Column, w: Int): Column = {
    val cnt = size(ws) - (w - 1)
    when(cnt <= 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), cnt - 1),
        i => array_join(slice(ws, i + 1, lit(w)), " ")))
  }

  /** (doc, pos) of every duplicated-span start. `shingled` must be
    * (doc, pos, g); materialized by the caller when it feeds both the
    * count aggregation and the join.
    */
  private def dupPositions(shingled: DataFrame, minCount: Long): DataFrame = {
    val dupSet = shingled.groupBy(col("g")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount).select(col("g"))
    shingled.join(Joins.broadcastIfSmall(dupSet), Seq("g"))
      .select(col("doc"), col("pos"))
  }

  /** Per-document span report: (doc, n_words, n_spans, n_dup_spans,
    * covered_tokens, dup_frac, clean_text) — `covered_tokens` the
    * union size of duplicated intervals, `dup_frac` the fraction of
    * the doc's words inside some duplicated span, `clean_text` the
    * document with those words removed (the paper's dedup output).
    * Every input doc produces a row; docs with no duplicated spans
    * come back unchanged with dup_frac 0.
    */
  def report(docs: DataFrame, idCol: String, textCol: String,
             w: Int = 5, minCount: Long = 2L): DataFrame = {
    require(w >= 2, "span width must be at least 2 words")
    require(minCount >= 2, "a span occurring once is not a duplicate")
    val base = docs.select(col(idCol).as("doc"),
      TextAnalysis.words(col(textCol)).as("ws"))
    // The positional shingle table feeds both the count aggregation
    // and the dup join — materialize so the corpus shingles once.
    val shingled = graft.util.Materialize.once(
      base.select(col("doc"), posexplode(spanArray(col("ws"), w)).as(Seq("pos", "g"))))
    val dup = dupPositions(shingled, minCount)
    val spanCounts = dup.groupBy(col("doc")).agg(count(lit(1)).as("n_dup_spans"))
    // Union of [pos, pos+w) intervals via distinct covered positions —
    // per-doc bounded (≤ doc length), so collect_set is safe at scale.
    val cov = dup
      .select(col("doc"), explode(sequence(col("pos"), col("pos") + lit(w - 1))).as("p"))
      .groupBy(col("doc")).agg(collect_set(col("p")).as("cov"))
    // Kept word positions = all positions MINUS the covered set.
    // r13 OPT (guide §1.2 per-task work): the old form filtered the
    // word array with an `array_contains(covset, i)` lambda — a linear
    // probe of the covered set PER WORD, O(n_words · |covset|) per
    // document (quadratic in doc length once most of a doc is
    // covered). `array_except` builds one hash set of `covset` and
    // walks the index sequence once — O(n_words + |covset|) — and it
    // preserves the left argument's (ascending) order, so the joined
    // text is identical. The empty-doc guard matters: sequence(0, -1)
    // would produce [0, -1], not [].
    val keptIdx = when(size(col("ws")) === 0, array().cast("array<int>"))
      .otherwise(array_except(
        sequence(lit(0), size(col("ws")) - 1), col("covset")))
    base
      .join(spanCounts, Seq("doc"), "left")
      .join(cov, Seq("doc"), "left")
      .withColumn("covset", coalesce(col("cov"), array().cast("array<int>")))
      .select(
        col("doc"),
        size(col("ws")).cast("long").as("n_words"),
        greatest(size(col("ws")) - (w - 1), lit(0)).cast("long").as("n_spans"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        size(col("covset")).cast("long").as("covered_tokens"),
        when(size(col("ws")) === 0, lit(0.0))
          .otherwise(size(col("covset")).cast("double") / size(col("ws")).cast("double"))
          .as("dup_frac"),
        array_join(
          transform(keptIdx, i => element_at(col("ws"), i + 1)), " ")
          .as("clean_text"))
  }

  /** The paper's dedup transform alone: documents with duplicated
    * spans stripped, original text kept where nothing matched.
    */
  def stripDupSpans(docs: DataFrame, idCol: String, textCol: String,
                    w: Int = 5, minCount: Long = 2L): DataFrame =
    report(docs, idCol, textCol, w, minCount).select(col("doc"), col("clean_text"))
}
