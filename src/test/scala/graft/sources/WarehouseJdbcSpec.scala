package graft.sources

import graft.SharedSpark
import org.scalatest.funsuite.AnyFunSuite

/** Real JDBC round-trip against embedded Derby (ships with Spark) —
  * the B1 extract / D1 load surface driven end-to-end, not just
  * option-construction.
  */
class WarehouseJdbcSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private lazy val conn = Warehouse.Conn(
    url = s"jdbc:derby:/tmp/graft_derby_${ProcessHandle.current().pid()};create=true",
    user = "", password = "", driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver")

  test("JDBC append then full-query pushdown read round-trips") {
    val visits = Seq(
      (1L, "eligible", 1000.0), (2L, "not-active", 0.0), (3L, "eligible", 250.5))
      .toDF("visit_id", "class", "approval_limit")
    Warehouse.append(visits, conn, "ELIGIBILITY_DOTCARE", sleep = _ => ())

    val back = Warehouse.readQuery(spark, conn,
      """SELECT "visit_id", "class", "approval_limit" FROM ELIGIBILITY_DOTCARE
        |WHERE CAST("class" AS VARCHAR(64)) = 'eligible'""".stripMargin,
      sleep = _ => ())
    val rows = back.collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
    assert(rows == Set((1L, 1000.0), (3L, 250.5)), "pushdown query filters server-side and round-trips values")
  }

  test("exactly-once JDBC sink: rows+progress commit atomically, replays skip, failures roll back whole") {
    val c = java.sql.DriverManager.getConnection(conn.url)
    c.createStatement().executeUpdate(
      "CREATE TABLE STREAM_TGT (event_id BIGINT PRIMARY KEY, amount DOUBLE)")
    c.close()
    def count(): Long = Warehouse.readQuery(spark, conn,
      "SELECT event_id FROM STREAM_TGT", sleep = _ => ()).count()
    val sink = Warehouse.exactlyOnceSink(conn, "STREAM_TGT")
    sink(Seq((1L, 1.0), (2L, 2.0)).toDF("event_id", "amount"), 0L)
    sink(Seq((3L, 3.0)).toDF("event_id", "amount"), 1L)
    assert(count() == 3)
    // Crash-replay of both delivered batches: ids at or below the
    // marker are skipped whole — no duplicates, no PK explosion.
    sink(Seq((3L, 3.0)).toDF("event_id", "amount"), 1L)
    sink(Seq((1L, 1.0), (2L, 2.0)).toDF("event_id", "amount"), 0L)
    assert(count() == 3)
    // All-or-nothing: a batch whose second row violates the PK must
    // leave neither its first row nor the progress marker behind.
    intercept[Exception] {
      sink(Seq((4L, 4.0), (1L, 9.9)).toDF("event_id", "amount"), 2L)
    }
    assert(count() == 3, "failed batch must roll back wholesale")
    // The fixed batch REUSES id 2 (what a retried trigger does) and lands.
    sink(Seq((4L, 4.0)).toDF("event_id", "amount"), 2L)
    assert(count() == 4)
  }

  test("exactly-once sink lands null column values (typed setNull, not a poison-pill batch)") {
    val c = java.sql.DriverManager.getConnection(conn.url)
    c.createStatement().executeUpdate(
      "CREATE TABLE STREAM_NULLS (event_id BIGINT PRIMARY KEY, note VARCHAR(64), amount DOUBLE)")
    c.close()
    val sink = Warehouse.exactlyOnceSink(conn, "STREAM_NULLS")
    // Derby rejects untyped setObject(i, null) — the old code died here
    // on every replay of the same batch.
    sink(Seq(
      (1L, Some("ok"), Some(1.5)),
      (2L, None, None)).toDF("event_id", "note", "amount"), 0L)
    val back = Warehouse.readQuery(spark, conn,
      "SELECT event_id, note, amount FROM STREAM_NULLS", sleep = _ => ())
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(back == Set((1L, Some("ok"), Some(1.5)), (2L, None, None)), s"got $back")
  }

  test("JDBC append accumulates across batches (chunked load)") {
    val b1 = Seq((10L, "a", 1.0)).toDF("visit_id", "class", "approval_limit")
    val b2 = Seq((11L, "b", 2.0)).toDF("visit_id", "class", "approval_limit")
    Warehouse.append(b1, conn, "APPEND_T", sleep = _ => ())
    Warehouse.append(b2, conn, "APPEND_T", sleep = _ => ())
    val n = Warehouse.readQuery(spark, conn, """SELECT "visit_id" FROM APPEND_T""", sleep = _ => ()).count()
    assert(n == 2)
  }
}
