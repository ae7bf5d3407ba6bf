package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Calendar gap-fill for per-entity daily series — the dashboard/
  * feature-pipeline staple: a fact table only has rows for days with
  * activity, but downstream consumers (charts, trailing features,
  * join keys) need one row per entity per day.
  *
  * Two pieces, composable:
  *  - [[dateSpine]]: the dense (entity, day) scaffold between each
  *    entity's own first and last active day — `sequence()` +
  *    `explode`, a narrow per-row expansion, NO cross join of
  *    entities × global calendar (the global scaffold at 100 TB
  *    manufactures rows for entities long dead; per-entity bounds
  *    keep the blow-up proportional to actual lifetimes).
  *  - [[locf]]: last-observation-carried-forward over the spine via
  *    `last(col, ignoreNulls)` in one per-entity ordered window —
  *    the same single-exchange shape as every other window op here.
  */
object TimeSeries {

  /** Dense daily scaffold per entity, bounded by that entity's own
    * [min(day), max(day)] — columns (`entityCol`, `dayCol`).
    */
  def dateSpine(df: DataFrame, entityCol: String, dayCol: String): DataFrame =
    df.groupBy(col(entityCol))
      .agg(min(col(dayCol)).as("__lo"), max(col(dayCol)).as("__hi"))
      .select(col(entityCol),
        explode(sequence(col("__lo"), col("__hi"), expr("interval 1 day"))).as(dayCol))

  /** Left-join `df` onto its own spine and carry `valueCols` forward
    * through the manufactured gap days. Gap rows keep NULL until the
    * first real observation (nothing to carry). `df` must be unique
    * per (entity, day) — pre-aggregate if not.
    */
  def locf(df: DataFrame, entityCol: String, dayCol: String,
           valueCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col(dayCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = dateSpine(df, entityCol, dayCol)
      .join(df, Seq(entityCol, dayCol), "left")
    valueCols.foldLeft(filled) { (acc, c) =>
      acc.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
  }
}
