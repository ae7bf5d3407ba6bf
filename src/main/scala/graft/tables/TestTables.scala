package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated TPC-H-ish parquet tables
  * (/root/repo/TESTDATA.md). All engine queries take a `dir` so the same
  * program runs at any scale factor — at cluster scale the same code
  * points at a partitioned table root and Catalyst prunes partitions.
  */
object TestTables {
  def region(spark: SparkSession, dir: String): DataFrame   = spark.read.parquet(s"$dir/region.parquet")
  def nation(spark: SparkSession, dir: String): DataFrame   = spark.read.parquet(s"$dir/nation.parquet")
  def customer(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(s"$dir/customer.parquet")
  def supplier(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(s"$dir/supplier.parquet")
  def part(spark: SparkSession, dir: String): DataFrame     = spark.read.parquet(s"$dir/part.parquet")
  def orders(spark: SparkSession, dir: String): DataFrame   = spark.read.parquet(s"$dir/orders.parquet")
  def lineitem(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(s"$dir/lineitem.parquet")
  def documents(spark: SparkSession, dir: String): DataFrame  = spark.read.parquet(s"$dir/documents.parquet")
  def embeddings(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(s"$dir/embeddings.parquet")

  /** `events.ts` is physical INT64 TIMESTAMP(NANOS) parquet, which Spark's
    * vectorized reader rejects ([PARQUET_TYPE_ILLEGAL]). Read nanos as a
    * long and rebuild a microsecond timestamp — integer division floors,
    * matching the ns→µs truncation DuckDB applies when casting
    * TIMESTAMP_NS to TIMESTAMP, so oracle comparisons line up exactly.
    * Exposes both `ts` (timestamp, µs) and `ts_us` (epoch micros long).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      // Keep the RAW ns column: predicates on it push down to the
      // parquet scan (row-group pruning), which predicates on the
      // computed timestamp below cannot.
      .withColumn("ts_ns", col("ts"))
      .withColumn("ts_us", expr("ts div 1000")) // integer division — ts/1000 would go through double and lose precision past 2^53 ns
      .withColumn("ts", timestamp_micros(col("ts_us")))
  }

  /** Register every table as a temp view (for spark.sql / CTE queries). */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
      .foreach(t => spark.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t))
    documents(spark, dir).createOrReplaceTempView("documents")
    embeddings(spark, dir).createOrReplaceTempView("embeddings")
    events(spark, dir).createOrReplaceTempView("events")
  }
}
