package graft.sources

import graft.util.Retry
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC warehouse surface (B1 extract / D1 load — the reference's SQL
  * Server boundary, src/etl_utils.py:58-81 and :211-253). No database
  * exists in this container, so these are exercised structurally
  * (option construction is unit-testable); the local pipelines use the
  * Parquet tables instead, which share the same DataFrame shape.
  *
  * Scale notes: `readQuery` ships the whole extraction SQL to the
  * database (full pushdown — the reference's approach, and the right
  * one when the RDBMS already indexes the join keys); `readTable` +
  * partitionColumn parallelizes the scan when the table must stream
  * out whole. batchsize matches the reference's 1000-row insert chunks.
  */
object Warehouse {

  final case class Conn(url: String, user: String, password: String, driver: String = "")

  def readOptions(conn: Conn, query: String, fetchSize: Int = 1000): Map[String, String] =
    Map(
      "url" -> conn.url, "user" -> conn.user, "password" -> conn.password,
      "query" -> query, "fetchsize" -> fetchSize.toString,
      "pushDownPredicate" -> "true") ++
      (if (conn.driver.nonEmpty) Map("driver" -> conn.driver) else Map.empty)

  def writeOptions(conn: Conn, table: String, batchSize: Int = 1000): Map[String, String] =
    Map(
      "url" -> conn.url, "user" -> conn.user, "password" -> conn.password,
      "dbtable" -> table, "batchsize" -> batchSize.toString) ++
      (if (conn.driver.nonEmpty) Map("driver" -> conn.driver) else Map.empty)

  /** B1: full-query pushdown read, with the reference's 2×300 s retry. */
  def readQuery(spark: SparkSession, conn: Conn, query: String,
                sleep: Long => Unit = Thread.sleep): DataFrame =
    Retry.dbRead(sleep) {
      spark.read.format("jdbc").options(readOptions(conn, query)).load()
    }

  /** Partition-parallel table read for large extracts. */
  def readTable(spark: SparkSession, conn: Conn, table: String,
                partitionColumn: String, lower: Long, upper: Long, numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .options(writeOptions(conn, table) - "batchsize")
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lower).option("upperBound", upper)
      .option("numPartitions", numPartitions)
      .load()

  /** D1: chunked append with the reference's 3×180 s retry. */
  def append(df: DataFrame, conn: Conn, table: String,
             sleep: Long => Unit = Thread.sleep): Unit =
    Retry.dbWrite(sleep) {
      df.write.format("jdbc").options(writeOptions(conn, table)).mode(SaveMode.Append).save()
    }
}
