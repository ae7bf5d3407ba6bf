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

  /** Exactly-once streaming load into a JDBC warehouse: a
    * `foreachBatch` body that inserts the micro-batch rows AND
    * advances a per-table batch-id progress marker inside ONE database
    * transaction — the warehouse-side twin of
    * `ManifestTable.upsertSink`. Structured Streaming re-delivers the
    * last in-flight batch after a crash; because rows and marker
    * commit or roll back together, a replayed id compares ≤ the
    * marker and is skipped whole — no dedup column, no MERGE needed.
    * The progress row is read `FOR UPDATE`, serializing concurrent
    * deliveries of the same query.
    *
    * Rows route through the driver connection (a micro-batch is
    * watermark-bounded — the same boundedness argument as every
    * single-transaction warehouse load), chunked into `batchSize`
    * `executeBatch` rounds like the reference's 1000-row inserts.
    * Corpus-scale loads belong to the staging-table + MERGE path, not
    * a streaming sink.
    */
  def exactlyOnceSink(conn: Conn, table: String,
                      progressTable: String = "GRAFT_STREAM_PROGRESS",
                      batchSize: Int = 1000): (DataFrame, Long) => Unit = { (batch, id) =>
    val schema = batch.schema
    val c = java.sql.DriverManager.getConnection(conn.url, conn.user, conn.password)
    try {
      c.setAutoCommit(false)
      ensureProgressRow(c, progressTable, table)
      val sel = c.prepareStatement(
        s"SELECT last_batch FROM $progressTable WHERE table_name = ? FOR UPDATE")
      sel.setString(1, table)
      val rs = sel.executeQuery()
      if (!rs.next())
        throw new java.sql.SQLException(
          s"progress row for $table missing from $progressTable after ensureProgressRow")
      val last = rs.getLong(1)
      rs.close(); sel.close()
      if (id > last) {
        val rows = batch.collect() // only materialize batches that will land
        val cols = schema.fieldNames
        val ins = c.prepareStatement(
          s"INSERT INTO $table (${cols.mkString(", ")}) VALUES (${cols.map(_ => "?").mkString(", ")})")
        var pending = 0
        // Nulls must be TYPED: setObject(i, null) makes drivers that
        // can't infer the parameter type (Derby, Postgres) throw on the
        // first null-bearing row — a poison-pill batch that kills the
        // stream on every replay.
        val sqlTypes = schema.fields.map(f => jdbcNullType(f.dataType))
        rows.foreach { r =>
          schema.fields.zipWithIndex.foreach { case (f, i) =>
            if (r.isNullAt(i)) ins.setNull(i + 1, sqlTypes(i)) else ins.setObject(i + 1, r.get(i))
          }
          ins.addBatch()
          pending += 1
          if (pending == batchSize) { ins.executeBatch(); pending = 0 }
        }
        if (pending > 0) ins.executeBatch()
        ins.close()
        val upd = c.prepareStatement(
          s"UPDATE $progressTable SET last_batch = ? WHERE table_name = ?")
        upd.setLong(1, id); upd.setString(2, table)
        upd.executeUpdate(); upd.close()
        c.commit()
      } else c.rollback() // replay: nothing to do, release the lock
    } catch {
      case e: Throwable => try c.rollback() catch { case _: Throwable => }; throw e
    } finally c.close()
  }

  /** java.sql.Types code for a typed NULL of the given Spark type —
    * what `PreparedStatement.setNull` needs on drivers that refuse an
    * untyped `setObject(i, null)`.
    */
  private def jdbcNullType(dt: org.apache.spark.sql.types.DataType): Int = {
    import org.apache.spark.sql.types._
    dt match {
      case StringType => java.sql.Types.VARCHAR
      case LongType => java.sql.Types.BIGINT
      case IntegerType => java.sql.Types.INTEGER
      case ShortType => java.sql.Types.SMALLINT
      case ByteType => java.sql.Types.TINYINT
      case DoubleType => java.sql.Types.DOUBLE
      case FloatType => java.sql.Types.REAL
      case BooleanType => java.sql.Types.BOOLEAN
      case DateType => java.sql.Types.DATE
      case TimestampType => java.sql.Types.TIMESTAMP
      case _: DecimalType => java.sql.Types.DECIMAL
      case BinaryType => java.sql.Types.BINARY
      case _ => java.sql.Types.OTHER
    }
  }

  /** Create the progress table/row if missing (committed separately —
    * Derby and friends auto-commit DDL anyway, and an existing
    * table/row is the normal case).
    */
  private def ensureProgressRow(c: java.sql.Connection, progressTable: String,
                                table: String): Unit = {
    val st = c.createStatement()
    try st.executeUpdate(
      s"CREATE TABLE $progressTable (table_name VARCHAR(128) PRIMARY KEY, last_batch BIGINT)")
    catch { case _: java.sql.SQLException => } // exists
    finally st.close()
    val ins = c.prepareStatement(
      s"INSERT INTO $progressTable (table_name, last_batch) VALUES (?, -1)")
    try { ins.setString(1, table); ins.executeUpdate() }
    catch { case _: java.sql.SQLException => } // row exists
    finally ins.close()
    c.commit()
  }
}
