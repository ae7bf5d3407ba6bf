package graft.sink

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout — the storage-side answer to the shuffle.
  *
  * A join or aggregation on a table's bucket keys needs NO exchange:
  * the scan itself reports `HashPartitioning(bucketKeys, n)`, so a
  * sort-merge join of two tables bucketed the same way, and any
  * `groupBy` whose keys contain the bucket keys, run shuffle-free.
  * At 100 TB this converts the fact-to-fact join — the one join that
  * can neither broadcast nor afford a re-shuffle of both sides —
  * into a per-bucket local merge, and it amortizes: pay one bucketed
  * write, every downstream join/agg on that key rides it.
  *
  * Rules that keep the free exchange honest:
  *  - both sides must have the SAME bucket count (Spark joins b vs b;
  *    with unequal counts one side re-shuffles);
  *  - `spark.sql.sources.bucketing.enabled` stays at its default
  *    (true) and the join must not degrade to broadcast-hash on a
  *    bucketed side you wanted co-located (broadcast ignores layout);
  *  - bucket-pruning on point predicates over the bucket key is free
  *    (`spark.sql.sources.bucketing.autoBucketedScan.enabled`).
  *
  * Tables are written as EXTERNAL datasource tables (explicit `path`):
  * the metastore entry is session-scoped bookkeeping, the parquet
  * layout on disk is the durable artifact.
  */
object Bucketing {

  /** Write `df` as an external parquet table bucketed on `bucketKeys`
    * into `buckets` buckets, optionally sorted within buckets (sorted
    * buckets let the merge join skip its sort stage entirely).
    * Overwrites both the table entry and the path.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    bucketKeys: Seq[String], buckets: Int,
                    sortKeys: Seq[String] = Nil): Unit = {
    require(bucketKeys.nonEmpty, "bucketKeys must be non-empty")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .option("path", path)
      .bucketBy(buckets, bucketKeys.head, bucketKeys.tail: _*)
    val sorted = if (sortKeys.nonEmpty) w.sortBy(sortKeys.head, sortKeys.tail: _*) else w
    sorted.saveAsTable(table)
  }

  /** The bucketed table as a DataFrame (scan reports the bucket
    * partitioning — joins/aggs on the bucket keys plan shuffle-free).
    */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
