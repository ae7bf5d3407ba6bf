package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline): the rows no other row dominates,
  * maximizing both dimensions — "best tradeoff" selection (the classic
  * skyline operator of Börzsönyi/Kossmann/Stocker 2001), which a
  * curation pipeline runs as "keep documents on the quality-vs-cost
  * frontier" and a BI layer as "undominated price/performance offers".
  * A row r is DOMINATED iff some r' is ≥ on both dims and > on at
  * least one; equal points dominate nothing, so exact ties on the
  * frontier all survive.
  *
  * Shape at scale — never the quadratic pairwise test: one aggregation
  * collapses the data to (d1, max d2) per DISTINCT d1 (map-side
  * partials, output bounded by d1's cardinality); the dominance test
  * over that table is an EXCLUSIVE running max along d1 descending —
  * [[GlobalIndex.withRunningMax]]'s range-partitioned two-pass scan,
  * not a single-partition window — and the surviving frontier joins
  * back on (d1, d2) equality. Every verdict is exact long comparison.
  */
object Skyline {

  /** Rows of `df` on the (maximize `d1`, maximize `d2`) frontier, with
    * all their columns. Both dimension columns must be LongType (the
    * engine's exact-integer verdict rule — quantize doubles first) and
    * non-NULL (a NULL has no dominance order; fails loud).
    */
  def frontier2d(df: DataFrame, d1: String, d2: String): DataFrame = {
    def checked(c: String) = when(col(c).isNotNull, col(c)).otherwise(
      raise_error(lit(s"Skyline: NULL $c — dominance needs both dimensions present")))
    val pts = df.withColumn(d1, checked(d1)).withColumn(d2, checked(d2))
    val grouped = pts.groupBy(col(d1)).agg(max(col(d2)).as("__m"))
    val withPrefix = GlobalIndex.withRunningMax(
      grouped, Seq(col(d1).desc), "__m", "__pm", inclusive = false)
    val frontier = withPrefix
      .filter(col("__pm").isNull || col("__pm") < col("__m"))
      .select(col(d1), col("__m"))
    pts.join(frontier, pts(d1) === frontier(d1) && pts(d2) === frontier("__m"))
      .select(pts.columns.map(pts(_)): _*)
  }
}
