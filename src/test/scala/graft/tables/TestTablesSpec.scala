package graft.tables

import graft.SharedSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema-drift lock for the events loader: the physical `ts` encoding
  * of an EXTERNAL table is upstream's choice, not a contract — round 5
  * broke when the shipped file silently moved from INT64 TIMESTAMP
  * (NANOS) to timestamp[us]. This spec writes fixtures under every
  * encoding the loader claims to adapt to and asserts identical typed
  * output, so reintroducing a physical-type assumption fails here
  * before it fails in production.
  */
class TestTablesSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  // One event at 2024-03-01T12:00:00.123456Z (µs precision — the
  // common precision of both encodings), one at the epoch.
  private val t1Us = 1709294400123456L
  private val rows = Seq((1L, t1Us, 7L, "click", 2.5, """{"k":1}"""),
                         (2L, 0L, 8L, "view", 1.0, null))

  /** Write the fixture with `ts` in the given physical flavor, return
    * the dir TestTables.events can read.
    */
  private def fixture(flavor: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"events_$flavor").toString
    val base = rows.toDF("event_id", "ts_us_in", "user_id", "event_type", "value", "props")
    val df: DataFrame = flavor match {
      case "int64_nanos" => // what a TIMESTAMP(NANOS) file reads as under nanosAsLong
        base.withColumn("ts", col("ts_us_in") * lit(1000L))
      case "timestamp_us_ntz" => // pyarrow naive timestamp[us] → TIMESTAMP_NTZ scan
        base.withColumn("ts", timestamp_micros(col("ts_us_in")).cast(TimestampNTZType))
      case "timestamp_us_ltz" => // UTC-adjusted timestamp[us] → TimestampType scan
        base.withColumn("ts", timestamp_micros(col("ts_us_in")))
    }
    df.select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"), col("props"))
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    dir
  }

  private val flavors = Seq("int64_nanos", "timestamp_us_ntz", "timestamp_us_ltz")

  test("events loader yields identical typed rows under every physical ts encoding") {
    val results = flavors.map { f =>
      val ev = TestTables.events(spark, fixture(f))
      // Uniform surface regardless of encoding.
      assert(ev.schema("ts").dataType == TimestampType, s"$f: ts must normalize to TimestampType")
      assert(ev.schema("ts_us").dataType == LongType, s"$f: ts_us")
      assert(ev.schema("ts_ns").dataType == LongType, s"$f: ts_ns")
      f -> ev.select($"event_id", $"ts_us", $"ts_ns", unix_micros($"ts").as("ts_as_us"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    }
    val expected = Set((1L, t1Us, t1Us * 1000L, t1Us), (2L, 0L, 0L, 0L))
    results.foreach { case (f, got) => assert(got == expected, s"$f: $got") }
  }

  test("events loader never mutates session conf (nanosAsLong stays whatever the session set)") {
    // The flag lives at SESSION BUILD (TestTables.nanosAsLongConf); the
    // loader itself must be mutation-free — a reader that silently
    // flips a session-wide legacy flag is the round-5 regression class.
    val key = TestTables.nanosAsLongConf._1
    val saved = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "false")
      TestTables.events(spark, fixture("timestamp_us_ltz")).collect()
      assert(spark.conf.get(key) == "false", "loader flipped the session conf")
    } finally saved.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("watermark predicate matches the exact typed cut and reaches PushedFilters — every encoding") {
    val hwm = new java.sql.Timestamp(t1Us / 1000)
    hwm.setNanos(((t1Us % 1000000L) * 1000L).toInt) // exact µs watermark = event 1's ts
    flavors.foreach { f =>
      val dir = fixture(f)
      val ev = TestTables.events(spark, dir)
      val raw = TestTables.eventsWatermarkPredicate(spark, dir)
      val cut = ev.filter(raw(hwm) && $"ts" > lit(hwm))
      assert(cut.select($"event_id").as[Long].collect().toSet == Set.empty[Long],
        s"$f: nothing is strictly newer than the max event")
      val plan = cut.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters: [IsNotNull(ts), GreaterThan(ts,"),
        s"$f: raw watermark cut must reach the scan:\n$plan")

      // Strictly-before watermark admits event 1 through BOTH the raw
      // (superset) and exact predicates — no row lost at the boundary.
      val before = new java.sql.Timestamp(hwm.getTime)
      before.setNanos(hwm.getNanos - 1000) // 1 µs earlier
      val admitted = ev.filter(raw(before) && $"ts" > lit(before))
        .select($"event_id").as[Long].collect().toSet
      assert(admitted == Set(1L), s"$f: boundary row must survive the raw cut: $admitted")
    }
  }
}
