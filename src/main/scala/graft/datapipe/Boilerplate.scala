package graft.datapipe

import graft.ops.Joins
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-frequency boilerplate removal — the line-level dedup pass of
  * web-corpus cleaning (CCNet-style): a line that recurs across a large
  * fraction of documents is template chrome (headers, footers, nav,
  * cookie banners), not content. Lines are scored by DOCUMENT frequency
  * over the whole corpus and stripped from every document; everything
  * else is kept in original order.
  *
  * Distinct from the intra-document repetition signals in TextAnalysis
  * (those look inside one doc) and from near-dup removal in Dedup /
  * CorpusClean (those drop whole documents): this rewrites documents.
  *
  * Scale shape (the 100-TB contract):
  *  - one corpus-wide shuffle keyed on the line hash for the document-
  *    frequency aggregate (countDistinct partial-aggregates map-side);
  *  - the boilerplate set is tiny by construction (lines present in
  *    >= minDocFrac of all docs — bounded by 1/minDocFrac DISTINCT
  *    lines, not by corpus size), so it is materialized once and join-
  *    hinted only on measured evidence (Joins.broadcastIfSmall);
  *  - one reassembly shuffle keyed on doc id (the ordered string_agg);
  *  - the exploded line view is recomputed for the anti-join rather
  *    than cached: a second columnar scan of (id, text) is cheaper at
  *    any scale than materializing a corpus-sized exploded intermediate.
  */
object Boilerplate {

  /** Normalized line identity: whitespace-insensitive, case-folded. */
  def lineKey(line: Column): Column = md5(trim(lower(line)))

  /** Strip every line whose document frequency is >= `minDocFrac` of
    * the corpus document count. Returns (idCol, clean_text) — docs
    * whose every line was boilerplate come back as the empty string.
    */
  def strip(docs: DataFrame, idCol: String, textCol: String,
            minDocFrac: Double, delim: String = "\n"): DataFrame = {
    require(minDocFrac > 0.0 && minDocFrac <= 1.0, "minDocFrac in (0, 1]")
    // coalesce: a null text must still yield an output row ("" after
    // cleaning), and posexplode of a null array would drop the doc.
    val lines = docs
      .select(col(idCol).as("__doc"),
        posexplode(split(coalesce(col(textCol), lit("")), java.util.regex.Pattern.quote(delim)))
          .as(Seq("__ord", "__line")))
      .withColumn("__h", lineKey(col("__line")))

    // Document frequency per line identity vs the corpus size. The
    // 1-row count joins in broadcast so the threshold stays a plan-time
    // scalar on any cluster. Blank (empty-after-trim) lines are never
    // boilerplate candidates: they all share one identity (md5 of ""),
    // so in any real corpus they'd clear the frequency threshold and
    // be stripped from every document, destroying paragraph structure.
    val total = docs.agg(count(lit(1)).as("__n"))
    val boilerplate = graft.util.Materialize.once(
      lines.filter(trim(col("__line")) =!= "")
        .groupBy(col("__h"))
        .agg(countDistinct(col("__doc")).as("__df"))
        .join(broadcast(total))
        .filter(col("__df").cast("double") >= col("__n").cast("double") * lit(minDocFrac))
        .select(col("__h")))

    // Flag-and-aggregate, not anti-join-and-rejoin: collect_list skips
    // the nulled-out boilerplate entries (the whole struct is nulled —
    // a struct with a null field would NOT be skipped), so an
    // all-boilerplate doc reduces to "" in the SAME aggregation — every
    // doc has >= 1 line, hence exactly one output row, and no outer
    // join back to the doc list. The boilerplate set is bounded by
    // avg-lines-per-doc / minDocFrac regardless of corpus size, but
    // the hint stays evidence-gated.
    lines
      .join(Joins.broadcastIfSmall(boilerplate.withColumn("__bp", lit(1))), Seq("__h"), "left")
      .groupBy(col("__doc"))
      .agg(array_join(
        transform(
          array_sort(collect_list(when(col("__bp").isNull,
            struct(col("__ord").as("k"), col("__line").as("v"))))),
          x => x("v")),
        delim).as("clean_text"))
      .select(col("__doc").as(idCol), col("clean_text"))
  }
}
