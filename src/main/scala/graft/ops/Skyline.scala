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

  /** Per-group frontier (the per-category "best tradeoffs" form). Here
    * plain PARTITIONED windows are the right tool — partitioning by
    * the group key distributes the dominance scan (only an
    * unpartitioned window funnels), and the (d1, max-d2) collapse
    * bounds the window input at |group| × |distinct d1| rows. Same
    * exact-long semantics and NULL contract as [[frontier2d]].
    */
  def frontier2dByGroup(df: DataFrame, groupCol: String, d1: String, d2: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pts = df.withColumn(d1, checked(d1)).withColumn(d2, checked(d2))
    val grouped = pts.groupBy(col(groupCol), col(d1)).agg(max(col(d2)).as("__m"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col(d1).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // Renamed join keys: unlike frontier2d (whose running-max pass
    // breaks lineage), this frontier shares pts' attributes — a raw
    // self-join would be ambiguous.
    val frontier = grouped
      .withColumn("__pm", max(col("__m")).over(w))
      .filter(col("__pm").isNull || col("__pm") < col("__m"))
      .select(col(groupCol).as("__fg"), col(d1).as("__fd1"), col("__m"))
    pts.join(frontier,
        pts(groupCol) === col("__fg") && pts(d1) === col("__fd1") &&
          pts(d2) === col("__m"))
      .select(pts.columns.map(pts(_)): _*)
  }

  private def checked(c: String) = when(col(c).isNotNull, col(c)).otherwise(
    raise_error(lit(s"Skyline: NULL $c — dominance needs both dimensions present")))
}
