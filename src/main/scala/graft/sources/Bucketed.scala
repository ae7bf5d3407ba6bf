package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table surface for shuffle-free co-located joins
  * (SURVEY.md §7.5.7: "co-locate joins via bucketing"). Writing both
  * sides of a recurring join bucketed on the key means every
  * subsequent join reads pre-partitioned data — no Exchange in the
  * plan, which at 100 TB removes the dominant cost of the nightly
  * claims ⋈ visits join. Verified in BucketedSpec by asserting the
  * joined plan contains no shuffle.
  */
object Bucketed {

  def write(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** Join two tables bucketed on `key` — with equal bucket counts the
    * planner uses the existing bucketing as the join distribution.
    */
  def join(spark: SparkSession, left: String, right: String, key: String,
           joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key), joinType)
}
