package graft.datapipe

import graft.ops.{ColumnOps, Joins}
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
    val lines = docs
      .select(col(idCol).as("__doc"),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(delim)))
          .as(Seq("__ord", "__line")))
      .withColumn("__h", lineKey(col("__line")))

    // Document frequency per line identity vs the corpus size. The
    // 1-row count joins in broadcast so the threshold stays a plan-time
    // scalar on any cluster.
    val total = docs.agg(count(lit(1)).as("__n"))
    val boilerplate = graft.util.Materialize.once(
      lines.groupBy(col("__h"))
        .agg(countDistinct(col("__doc")).as("__df"))
        .join(broadcast(total))
        .filter(col("__df").cast("double") >= col("__n").cast("double") * lit(minDocFrac))
        .select(col("__h")))

    val kept = lines.join(Joins.broadcastIfSmall(boilerplate), Seq("__h"), "left_anti")
    val clean = kept.groupBy(col("__doc"))
      .agg(ColumnOps.stringAgg(col("__ord"), col("__line"), delim).as("clean_text"))

    docs.select(col(idCol))
      .join(clean, col(idCol) === col("__doc"), "left")
      .select(col(idCol), coalesce(col("clean_text"), lit("")).as("clean_text"))
  }
}
