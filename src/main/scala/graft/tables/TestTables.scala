package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** `events.ts` has shipped under two physical parquet encodings
    * (INT64 TIMESTAMP(NANOS) and plain timestamp[us]); the loader
    * adapts to whichever the file declares instead of assuming one —
    * an external table's physical layout is upstream's choice, not a
    * contract. Uniform output either way: `ts` (TimestampType, µs),
    * `ts_us` (epoch micros long), `ts_ns` (epoch nanos long; for µs
    * files this is ts_us·1000 — sub-µs digits are gone in the data).
    *
    * Watermark predicates must NOT be written against these derived
    * columns — use [[eventsWatermarkPredicate]], which targets the raw
    * scan column so the cut reaches the parquet scan's PushedFilters
    * (row-group pruning — the difference between a poll that reads one
    * new partition and one that re-scans 100 TB).
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeEvents(rawEvents(spark, dir))

  /** The encoding-adaptive ts normalization, shared by the batch loader
    * and streaming sources (which stage the same files): branches on
    * the `ts` type the scan produced, never on an assumed physical
    * layout.
    */
  def normalizeEvents(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case LongType => // INT64 TIMESTAMP(NANOS): nanos-as-long read
        raw
          .withColumn("ts_ns", col("ts"))
          .withColumn("ts_us", expr("ts div 1000")) // integer division — ts/1000 would go through double and lose precision past 2^53 ns
          .withColumn("ts", timestamp_micros(col("ts_us")))
      case _ => // timestamp[us] — read as TIMESTAMP_NTZ (or LTZ); wall clock is UTC
        raw
          .withColumn("ts_raw", col("ts"))
          .withColumn("ts_us", unix_micros(col("ts").cast(TimestampType)))
          .withColumn("ts_ns", col("ts_us") * lit(1000L))
          .withColumn("ts", timestamp_micros(col("ts_us")))
    }

  /** Physical schema of the events file as the parquet scan reports it
    * — what a `readStream` over staged copies must declare.
    */
  def rawEventsSchema(spark: SparkSession, dir: String): org.apache.spark.sql.types.StructType =
    rawEvents(spark, dir).schema

  /** The session conf a TIMESTAMP(NANOS)-encoded events file needs:
    * without it Spark's vectorized reader rejects the type outright
    * ([PARQUET_TYPE_ILLEGAL]); it is a no-op for µs files. Set it at
    * SESSION BUILD (all graft mains and SharedSpark do) — the loader
    * itself never mutates session conf: a reader that silently flips a
    * session-wide legacy flag is exactly the config class that caused
    * the round-5 regression, and save/restore around the eager read is
    * unsound because the scan re-reads the conf at ACTION time.
    */
  val nanosAsLongConf: (String, String) = ("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** Raw, untransformed events scan. Mutation-free: if the file is
    * NANOS-encoded and the session lacks [[nanosAsLongConf]], the
    * scan's own error is rethrown with the fix attached.
    */
  private def rawEvents(spark: SparkSession, dir: String): DataFrame =
    try spark.read.parquet(s"$dir/events.parquet")
    catch {
      case e: Exception if e.getMessage != null && e.getMessage.contains("PARQUET_TYPE_ILLEGAL") =>
        throw new IllegalStateException(
          s"events.parquet uses TIMESTAMP(NANOS); build the session with ${nanosAsLongConf._1}=true", e)
    }

  /** Scan-pushable watermark cut for [[events]], matched to the file's
    * physical `ts` encoding. The returned predicate is a SUPERSET of
    * the exact typed cut `ts > hwm` (equal, in fact — both encodings
    * carry full µs precision) and targets a passthrough of the raw scan
    * column (`ts_ns` alias / `ts_raw`), so Catalyst collapses it
    * through the Project into the parquet scan's PushedFilters.
    */
  def eventsWatermarkPredicate(spark: SparkSession, dir: String): java.sql.Timestamp => org.apache.spark.sql.Column = {
    rawEvents(spark, dir).schema("ts").dataType match {
      case LongType =>
        h => col("ts_ns") > lit(tsNanos(h))
      case TimestampNTZType =>
        // NTZ literal: same UTC wall clock as the epoch-based watermark.
        h => col("ts_raw") > lit(h.toInstant.atOffset(java.time.ZoneOffset.UTC).toLocalDateTime)
      case _ =>
        h => col("ts_raw") > lit(h)
    }
  }

  /** Epoch nanoseconds of a timestamp (exact — Timestamp carries ns). */
  def tsNanos(t: java.sql.Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000000L + t.getNanos

  /** Register every table as a temp view (for spark.sql / CTE queries).
    * Routed through the NAMED loaders so any normalization a loader
    * gains (as events() did when the driver's ts encoding changed)
    * reaches the views too — an inline re-read would silently diverge
    * from the programmatic API.
    */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    val loaders: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "region" -> region, "nation" -> nation, "customer" -> customer,
      "supplier" -> supplier, "part" -> part, "orders" -> orders,
      "lineitem" -> lineitem, "documents" -> documents,
      "embeddings" -> embeddings, "events" -> events)
    loaders.foreach { case (name, load) =>
      load(spark, dir).createOrReplaceTempView(name)
    }
  }
}
