package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-level data profiling — the audit pass a warehouse runs
  * before trusting a new feed (null rates, cardinalities, value
  * ranges; the reference's EDA notebook does this ad hoc per column).
  *
  * One plan for every column: the table UNPIVOTS to
  * (col_name, stringified value) and a single col_name-keyed
  * aggregation computes all profiles — n columns never become n scans.
  * The unpivot multiplies row volume by the column count, which is the
  * honest cost of single-pass profiling; at 100 TB you run it over a
  * `Sampling.sampleByHash` slice (profiling is an audit, not a
  * pipeline stage) — the plan shape is identical.
  *
  * Values profile as STRINGS (uniform schema across columns; min/max
  * are lexicographic and both engines compare binary UTF-8, so the
  * result is engine-exact for string and integer columns; float
  * columns should be profiled through an explicit integer quantization
  * because float→string formatting is engine-specific).
  */
object Profiler {

  /** One row per column: (col_name, n_rows, n_nonnull, n_distinct,
    * min_v, max_v). `n_distinct` counts non-null distinct values.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val stacked = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(c).cast("string").as("v"))): _*)).as("s"))
      .select(col("s.col_name"), col("s.v"))
    stacked.groupBy(col("col_name"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("v")).as("n_nonnull"),
        countDistinct(col("v")).as("n_distinct"),
        min(col("v")).as("min_v"),
        max(col("v")).as("max_v"))
  }
}
