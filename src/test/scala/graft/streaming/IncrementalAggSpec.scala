package graft.streaming

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IncrementalAggSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private lazy val data = (1 to 300).map(i =>
    (s"k${i % 5}", i.toLong, (i % 13).toLong)).toDF("k", "seq", "v")

  private val measures = Seq(
    "n" -> ("sum", lit(1L)),
    "total" -> ("sum", col("v")),
    "lo" -> ("min", col("seq")),
    "hi" -> ("max", col("seq")))
  private val mergeSpec = Seq("n" -> "sum", "total" -> "sum", "lo" -> "min", "hi" -> "max")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("k").collect().map(_.toSeq).toSeq

  test("folding per-batch rollups equals the one-pass recompute, for any batching") {
    val full = IncrementalAgg.rollup(data, Seq("k"), measures)
    for (splits <- Seq(Seq(100), Seq(37, 201), Seq(1, 2, 3, 299))) {
      val bounds = (0L +: splits.map(_.toLong)) :+ 301L
      val batches = bounds.sliding(2).map { case Seq(a, b) =>
        IncrementalAgg.rollup(data.filter($"seq" >= a && $"seq" < b), Seq("k"), measures)
      }.toSeq
      assert(rows(IncrementalAgg.merge(batches, Seq("k"), mergeSpec)) == rows(full),
        s"merge drifted from recompute for splits $splits")
    }
  }

  test("a key present in only one batch passes through unchanged") {
    val a = IncrementalAgg.rollup(data.filter($"k" === "k1"), Seq("k"), measures)
    val b = IncrementalAgg.rollup(data.filter($"k" === "k2"), Seq("k"), measures)
    val merged = rows(IncrementalAgg.merge(Seq(a, b), Seq("k"), mergeSpec))
    assert(merged == (rows(a) ++ rows(b)).sortBy(_.head.toString))
  }

  test("maintainSink folds a real stream into the batch recompute, and replay is idempotent") {
    val src = java.nio.file.Files.createTempDirectory("iagg_src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      src.resolve("events.parquet"))
    val rawSchema = graft.tables.TestTables.rawEventsSchema(spark, "/root/testdata/sf0.001")
    val out = java.nio.file.Files.createTempDirectory("iagg_out").toString
    val keys = Seq("event_type")
    val ms = Seq(
      "n" -> ("sum", lit(1L)),
      "first_us" -> ("min", col("ts_us")),
      "last_us" -> ("max", col("ts_us")))
    def stream() = graft.tables.TestTables.normalizeEvents(
      spark.readStream.schema(rawSchema).parquet(src.toString))
    def run(checkpoint: String): Unit =
      IncrementalAgg.maintainSink(stream(), out, checkpoint, keys, ms)
        .awaitTermination(60000)

    run(java.nio.file.Files.createTempDirectory("iagg_ck1").toString)
    val expected = rows(IncrementalAgg.rollup(
      graft.tables.TestTables.events(spark, "/root/testdata/sf0.001"), keys, ms)
      .withColumnRenamed("event_type", "k"))
    def merged() = rows(IncrementalAgg.readMerged(spark, out, keys,
      Seq("n" -> "sum", "first_us" -> "min", "last_us" -> "max"))
      .withColumnRenamed("event_type", "k"))
    assert(merged() == expected)

    // Replay: a FRESH checkpoint re-delivers the same data as the same
    // batch id — the dynamic partition overwrite must absorb it.
    run(java.nio.file.Files.createTempDirectory("iagg_ck2").toString)
    assert(merged() == expected, "replayed batch must overwrite, not double-count")
  }

  test("non-mergeable measures are rejected, not silently mis-merged") {
    val e = intercept[IllegalArgumentException] {
      IncrementalAgg.merge(Seq(data), Seq("k"), Seq("n" -> "count_distinct"))
    }
    assert(e.getMessage.contains("not a mergeable measure"))
  }

  test("hll distinct measure: merged sketches equal the one-pass sketch, exactly") {
    val ms = Seq("users" -> ("hll", col("v")), "n" -> ("sum", lit(1L)))
    val onePass = IncrementalAgg.estimates(
      IncrementalAgg.rollup(data, Seq("k"), ms), Seq("users"))
    val halves = Seq(data.filter($"seq" <= 150), data.filter($"seq" > 150))
      .map(IncrementalAgg.rollup(_, Seq("k"), ms))
    val folded = IncrementalAgg.estimates(
      IncrementalAgg.merge(halves, Seq("k"), Seq("users" -> "hll", "n" -> "sum")),
      Seq("users"))
    assert(rows(folded) == rows(onePass),
      "HLL registers are maxes — the fold must be register-identical to one pass")
    // At this cardinality (13 distinct v per key) the sketch is still
    // in sparse mode: the estimate is EXACT, not just close.
    val exact = data.groupBy($"k").agg(countDistinct($"v").as("users")).orderBy("k")
      .as[(String, Long)].collect().toMap
    val est = onePass.orderBy("k").select($"k", $"users").as[(String, Long)].collect().toMap
    assert(est == exact, "sparse-mode HLL must be exact at tiny cardinality")
  }
}
