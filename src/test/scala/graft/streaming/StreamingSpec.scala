package graft.streaming

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Runs the SAME transforms that QueriesStream checks in batch mode
  * under real readStream/writeStream, and asserts stream ≡ batch.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  // Physical schema as shipped — the loader must adapt to it, the spec
  // must not assume it.
  private lazy val rawSchema =
    graft.tables.TestTables.rawEventsSchema(spark, "/root/testdata/sf0.001")

  /** Stage the events file into a streaming source dir and read it with
    * the same encoding-adaptive conversion as TestTables.events.
    */
  private def streamSource(): org.apache.spark.sql.DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"))
    graft.tables.TestTables.normalizeEvents(
      spark.readStream.schema(rawSchema).parquet(dir.toString))
  }

  test("windowed aggregation: stream with watermark equals batch") {
    val stream = EventsStream.windowedAgg(EventsStream.withWatermark(streamSource()))
    val q = stream.writeStream.format("memory").queryName("win_agg")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("win_agg")
      .select($"window_start", $"event_type", $"n_events", $"total_value")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), math.round(r.getDouble(3) * 100)))
      .toSet
    val batch = EventsStream.windowedAgg(
        graft.tables.TestTables.events(spark, "/root/testdata/sf0.001"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), math.round(r.getDouble(3) * 100)))
      .toSet
    assert(streamed == batch, s"stream/batch mismatch: ${streamed.size} vs ${batch.size} windows")
  }

  test("hopping windows: streamed overlapping aggregation equals batch") {
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(window($"ts", "10 minutes", "5 minutes").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"w.start".as("s"), $"event_type", $"n")
    val q = agg(EventsStream.withWatermark(streamSource()))
      .writeStream.format("memory").queryName("hop_agg")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val streamed = key(spark.table("hop_agg"))
    val batch = key(agg(graft.tables.TestTables.events(spark, "/root/testdata/sf0.001")))
    assert(streamed == batch, s"stream/batch mismatch: ${streamed.size} vs ${batch.size}")
  }

  test("native session_window: streamed merging windows equal the batch aggregation") {
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy($"user_id", session_window($"ts", "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n"))
      .select($"user_id", $"sw.start".as("s"), $"sw.end".as("e"), $"n")
    val q = agg(EventsStream.withWatermark(streamSource(), "1 hour"))
      .writeStream.format("memory").queryName("sess_win")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    val streamed = key(spark.table("sess_win"))
    val batch = key(agg(graft.tables.TestTables.events(spark, "/root/testdata/sf0.001")))
    assert(streamed == batch, s"stream/batch mismatch: ${streamed.size} vs ${batch.size} sessions")
  }

  test("stream-static dim join: streamed enrichment equals the batch join") {
    val dim = graft.tables.TestTables.customer(spark, "/root/testdata/sf0.001")
    def enrich(events: org.apache.spark.sql.DataFrame) =
      EventsStream.enrichWithDim(
        events.select($"event_id", $"user_id"), dim, "user_id", "c_custkey",
        Seq("c_name", "c_mktsegment"))
    val q = enrich(streamSource()).writeStream.format("memory").queryName("dim_join")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3))).toSet
    val streamed = key(spark.table("dim_join"))
    val batch = key(enrich(graft.tables.TestTables.events(spark, "/root/testdata/sf0.001")))
    assert(streamed == batch, s"stream/batch mismatch: ${streamed.size} vs ${batch.size} rows")
    // Unmatched users (dim holds 0..149 at sf0.001? customers beyond
    // range) must survive as nulls — left join, not inner.
    assert(streamed.size == spark.read.parquet("/root/testdata/sf0.001/events.parquet").count())
  }

  test("upsert sink: stream merges into partitioned table; replayed batch is idempotent") {
    val base = java.nio.file.Files.createTempDirectory("stream_upsert").toString
    val table = s"$base/table"
    val src = streamSource()
      .select($"event_id", $"user_id", $"value",
        date_format($"ts", "yyyy-MM-dd").as("day"))
    val q = EventsStream.upsertSink(src, table, "event_id", "day", s"$base/ckpt")
    q.awaitTermination(120000)
    val afterFirst = spark.read.parquet(table)
      .select($"event_id", $"value").as[(Long, Double)].collect().toMap

    val batchRows = graft.tables.TestTables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", $"value").as[(Long, Double)].collect().toMap
    assert(afterFirst == batchRows, "streamed table must equal the batch rows")

    // Simulate a replayed micro-batch: merge the same rows again
    // directly (what foreachBatch would do on recovery) — no growth.
    graft.sink.Sinks.upsertPartitioned(spark, table,
      graft.tables.TestTables.events(spark, "/root/testdata/sf0.001")
        .select($"event_id", $"user_id", $"value",
          date_format($"ts", "yyyy-MM-dd").as("day")),
      "event_id", "day")
    val afterReplay = spark.read.parquet(table)
      .select($"event_id", $"value").as[(Long, Double)].collect().toMap
    assert(afterReplay == afterFirst, "replay must converge, not duplicate")
  }

  test("trailing features: RANGE frame includes self, ties, and the exact boundary") {
    val ev = Seq(
      (1L, 10L, 0L, 1.0),          // t=0
      (2L, 10L, 1800000000L, 2.0), // exactly 30 min later — boundary INCLUDES t=0
      (3L, 10L, 1800000001L, 4.0), // 1 µs past — t=0 drops out
      (4L, 10L, 1800000001L, 8.0), // tie with event 3: shared frame
      (5L, 99L, 0L, 16.0)          // other user, isolated
    ).toDF("event_id", "user_id", "ts_us", "value")
    val out = EventsStream.trailingFeatures(ev, windowUs = 1800000000L)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getDouble(4))).toMap
    assert(out(1L) == ((1L, 1.0)))
    assert(out(2L) == ((2L, 3.0)), "boundary event sees t=0")
    assert(out(3L) == ((3L, 14.0)), "tied events share one frame (2+4+8)")
    assert(out(4L) == ((3L, 14.0)))
    assert(out(5L) == ((1L, 16.0)), "users are independent")
  }

  test("click attribution: stream-stream interval join equals the batch range join") {
    val purchases = streamSource().filter($"event_type" === "purchase").withWatermark("ts", "1 hour")
    val clicks = streamSource().filter($"event_type" === "click").withWatermark("ts", "1 hour")
    val q = EventsStream.attributionJoin(purchases, clicks)
      .writeStream.format("memory").queryName("attribution")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    val streamed = spark.table("attribution")
      .select($"purchase_id", $"click_id").as[(Long, Long)].collect().toSet

    val ev = graft.tables.TestTables.events(spark, "/root/testdata/sf0.001")
    val batch = EventsStream.attributionJoin(
        ev.filter($"event_type" === "purchase"), ev.filter($"event_type" === "click"))
      .select($"purchase_id", $"click_id").as[(Long, Long)].collect().toSet
    assert(streamed == batch,
      s"stream-stream interval join must equal batch: ${streamed.size} vs ${batch.size} pairs")
  }

  test("streaming corpus ingest: batches dedup against the persisted index; replay converges") {
    val base = java.nio.file.Files.createTempDirectory("ingest").toString
    // Scheme-qualified URIs on purpose: corpus existence must resolve
    // through the path's Hadoop filesystem. A java.io.File probe (the
    // local-only shortcut this test once tolerated) treats "file:" as
    // part of the name, never sees the corpus, and silently skips
    // dedup on every batch — exactly what would happen on HDFS/S3.
    val (docsPath, bandsPath) = (s"file:$base/docs", s"file:$base/bands")
    val srcDir = java.nio.file.Files.createTempDirectory("ingest_src")
    def deliver(name: String, rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").coalesce(1).write.parquet(s"$srcDir/$name")

    // Arrival 1: two unrelated docs — both survive (index bootstrap).
    deliver("b1", Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely unrelated corpus text about glacier formation dynamics")))
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def run(ckpt: String): Unit = {
      val src = spark.readStream.schema(docSchema)
        .option("maxFilesPerTrigger", "1").parquet(s"$srcDir/*")
      graft.datapipe.IncrementalDedup.ingestSink(src, "doc_id", "text",
        docsPath, bandsPath, ckpt, minJaccard = 0.5).awaitTermination(120000)
    }
    run(s"$base/ckpt")
    assert(spark.read.parquet(docsPath).select($"doc_id").as[Long].collect().toSet
      == Set(1L, 2L))

    // Arrival 2 (same checkpoint — the scheduled-ingest cadence): a
    // near-dup of doc 1 drops, a fresh doc survives.
    deliver("b2", Seq(
      (10L, "the quick brown fox jumps over the lazy dog tonight"),
      (11L, "fresh survey of deep sea hydrothermal vent ecosystems")))
    run(s"$base/ckpt")
    val afterTwo = spark.read.parquet(docsPath).select($"doc_id").as[Long].collect().toSet
    assert(afterTwo == Set(1L, 2L, 11L), s"near-dup must drop against the index: $afterTwo")

    // Full replay from a FRESH checkpoint (lost-checkpoint disaster):
    // every doc now matches the grown index, nothing is re-admitted.
    run(s"$base/ckpt_replayed")
    val afterReplay = spark.read.parquet(docsPath).select($"doc_id").as[Long].collect().toSet
    assert(afterReplay == afterTwo, s"replayed ingest must converge: $afterReplay")
  }

  test("overlap dedup: re-delivered poll window is exactly-once on the stream") {
    val dir = java.nio.file.Files.createTempDirectory("events_dedup")
    // The same poll window delivered twice (the reference's 30-min
    // overlap re-read) as two source files, forced into separate
    // micro-batches so the second is a true replay against state.
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("poll1.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("poll2.parquet"))
    val src = graft.tables.TestTables.normalizeEvents(
      spark.readStream.schema(rawSchema)
        .option("maxFilesPerTrigger", "1").parquet(dir.toString))
    val q = EventsStream.dedupStream(src, "event_id")
      .writeStream.format("memory").queryName("dedup_overlap")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("dedup_overlap").select($"event_id").as[Long].collect().sorted
    val batch = graft.tables.TestTables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id").distinct().as[Long].collect().sorted
    assert(streamed.length == streamed.distinct.length, "no event may be emitted twice")
    assert(streamed.toSeq == batch.toSeq, "stream must emit each event exactly once")
  }

  test("trending sketch state: final per-window top-k equals the batch sketch aggregate") {
    val windowUs = 360L * 60 * 1000000
    val src = streamSource()
      .select((expr(s"ts_us div ${windowUs}L") * windowUs).as("window_start_us"),
        $"event_type".as("term"))
      .as[EventsStream.TrendEvent]
    val q = EventsStream.trendingStream(src, k = 3, capacity = 64)
      .writeStream.format("memory").queryName("trending")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // Update mode re-emits a window's top-k every time its sketch
    // changes; the LAST emission per (window, rank) is the final state.
    val streamed = spark.table("trending")
      .withColumn("__seq", monotonically_increasing_id())
      .groupBy($"window_start_us", $"rank")
      .agg(max_by(struct($"term", $"cnt"), $"__seq").as("e"))
      .select($"window_start_us", $"rank", $"e.term", $"e.cnt")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3))).toSet
    val batch = EventsStream.trendingBatch(
        graft.tables.TestTables.events(spark, "/root/testdata/sf0.001"),
        windowMinutes = 360, k = 3, capacity = 64)
      .collect().map(r => (r.getTimestamp(0).toInstant.toEpochMilli * 1000L,
        r.getInt(1), r.getString(2), r.getLong(3))).toSet
    assert(streamed == batch,
      s"stream state must converge to the batch sketch: ${streamed.size} vs ${batch.size}")
  }

  test("stateful sessionization: closed stream sessions match batch sessions") {
    val src = streamSource().select($"user_id", $"ts_us", $"value").as[EventsStream.SessionEvent]
    val q = EventsStream.sessionizeStream(src)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("sessions")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), math.round(r.getDouble(3) * 100))).toSet

    val batchDf = EventsStream.sessionizeBatch(
      graft.tables.TestTables.events(spark, "/root/testdata/sf0.001"))
    val batch = batchDf
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), math.round(r.getDouble(3) * 100))).toSet
    val nUsers = batchDf.select($"user_id").distinct().count()

    assert(streamed.subsetOf(batch), "every closed stream session must exist in the batch result")
    assert(streamed.size >= batch.size - nUsers,
      s"stream should close all but at most one in-flight session per user (${streamed.size} vs ${batch.size} - $nUsers)")
  }

  test("sessionization state absorbs a LATE cross-batch event without re-splitting") {
    // Batch 1 delivers t=1000s; batch 2 delivers a LATE t=100s (within
    // the 30-min gap of lastUs) and an on-time t=2500s. The late merge
    // must move start down and KEEP lastUs at its max — naively
    // rewinding lastUs to 100s would split at 2500s (2400s > gap) and
    // report the wrong session_start.
    val dir = java.nio.file.Files.createTempDirectory("late_sess")
    def deliver(name: String, rows: Seq[(Long, Long, Double)]): Unit =
      rows.toDF("user_id", "ts_us", "value").coalesce(1).write.parquet(s"$dir/$name")
    deliver("b1", Seq((7L, 1000L * 1000000, 1.0)))
    deliver("b2", Seq((7L, 100L * 1000000, 2.0), (7L, 2500L * 1000000, 4.0)))
    val schema = StructType(Seq(StructField("user_id", LongType),
      StructField("ts_us", LongType), StructField("value", DoubleType)))
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*")
      .as[EventsStream.SessionEvent]
    val q = EventsStream.sessionizeStream(src)
      .writeStream.format("memory").queryName("late_sessions")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // All three events are one session (every adjacent gap ≤ 30 min
    // when processed in order), so NOTHING closes — an emitted row
    // would mean the late event split the session.
    assert(spark.table("late_sessions").isEmpty,
      s"late event must not split the session: ${spark.table("late_sessions").collect().toSeq}")
  }

  test("sessionization: an event far BEFORE the session's start becomes its own closed session") {
    // Batch 1 opens [3600s]; batch 2 delivers t=100s — more than the
    // 30-min gap below the session START, so it can't belong to it.
    // It must come out as its own closed past session (what the batch
    // twin yields for an isolated late event), leaving state intact —
    // merging it would fabricate one session spanning 100s..3600s.
    val dir = java.nio.file.Files.createTempDirectory("verylate_sess")
    def deliver(name: String, rows: Seq[(Long, Long, Double)]): Unit =
      rows.toDF("user_id", "ts_us", "value").coalesce(1).write.parquet(s"$dir/$name")
    deliver("b1", Seq((9L, 3600L * 1000000, 1.0)))
    deliver("b2", Seq((9L, 100L * 1000000, 2.0)))
    val schema = StructType(Seq(StructField("user_id", LongType),
      StructField("ts_us", LongType), StructField("value", DoubleType)))
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*")
      .as[EventsStream.SessionEvent]
    val q = EventsStream.sessionizeStream(src)
      .writeStream.format("memory").queryName("verylate_sessions")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("verylate_sessions")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got == Seq((9L, 100L * 1000000, 1)),
      s"the very-late event must close alone without touching state: $got")
  }

  test("streaming LLM enrichment: exactly-once under replay, incremental batches call only new keys") {
    val base = java.nio.file.Files.createTempDirectory("enrich_stream").toString
    val claims = graft.tables.TestTables.lineitem(spark, "/root/testdata/sf0.001")
      .filter($"l_orderkey" <= 300)
      .select($"l_orderkey".as("visit_id"), ($"l_orderkey" * 10 + $"l_linenumber").as("uid"))
      .distinct()
      .withColumn("part", ($"visit_id" % 4).cast("int"))
    val firstWave = claims.filter($"visit_id" <= 200)
    firstWave.coalesce(1).write.mode("overwrite").parquet(s"$base/src")

    def run(ckptDir: String): Unit = {
      val stream = spark.readStream.schema(claims.schema).parquet(s"$base/src")
      val q = graft.streaming.EnrichStream.predictSink(stream, s"$base/table", "uid",
        "visit_id", "uid", "part", s"$base/keys", ckptDir, () => new CountingLlmClient())
      q.awaitTermination(120000)
    }
    def tableRows(): Map[Long, String] = spark.read.parquet(s"$base/table")
      .select($"uid", $"medical_prediction").as[(Long, String)].collect().toMap

    CountingLlmClient.calls.set(0)
    run(s"$base/ckpt1")
    val callsFirst = CountingLlmClient.calls.get()
    val afterFirst = tableRows()
    assert(callsFirst > 0, "first run must reach the LLM")
    assert(afterFirst.size == firstWave.count(), "one enriched row per claim key")

    // REPLAY: a fresh streaming checkpoint re-delivers every file, but
    // the durable key store must skip all of them — zero LLM calls,
    // table byte-identical.
    run(s"$base/ckpt2")
    assert(CountingLlmClient.calls.get() == callsFirst,
      "replayed delivery must not re-call the LLM for recorded keys")
    assert(tableRows() == afterFirst, "replay must converge, not duplicate or mutate")

    // Incremental batch: add the remaining claims as a new source file;
    // only the NEW keys are called and merged in.
    claims.filter($"visit_id" > 200).coalesce(1).write.mode("append").parquet(s"$base/src")
    run(s"$base/ckpt3")
    assert(CountingLlmClient.calls.get() > callsFirst, "new keys must be enriched")
    val afterSecond = tableRows()
    assert(afterSecond.size == claims.count(), "table must now cover both waves")
    assert(afterFirst.forall { case (k, v) => afterSecond(k) == v },
      "previously enriched rows must be untouched by the incremental batch")

    // The enriched values themselves equal the deterministic mock's
    // closed form (the same contract the driver oracle states).
    afterSecond.foreach { case (uid, pred) =>
      val visit = uid / 10
      val expected = if (visit % 97 == 0) "Failed to reach LLM"
        else if (uid % 5 == 0) "Rejected" else "Approved"
      assert(pred == expected, s"uid $uid: $pred != $expected")
    }
  }
}

/** MockLlmClient with a global call counter (single-JVM local mode) —
  * the instrument that makes replay idempotence observable.
  */
class CountingLlmClient extends graft.enrich.MockLlmClient {
  override def call(payload: String): Either[String, String] = {
    CountingLlmClient.calls.incrementAndGet()
    super.call(payload)
  }
}
object CountingLlmClient {
  val calls = new java.util.concurrent.atomic.AtomicInteger(0)
}
