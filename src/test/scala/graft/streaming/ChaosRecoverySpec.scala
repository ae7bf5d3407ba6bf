package graft.streaming

import graft.SharedSpark
import graft.enrich.Checkpoint
import graft.sink.FaultyFs
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fault-injection for the three commit protocols SinksSpec /
  * ManifestTableSpec do not cover: the enrichment key store
  * ([[graft.enrich.Checkpoint]]), the watermark compaction swap
  * ([[Incremental.maybeCompact]]), and the rollup log's
  * `__batch`-partition sink ([[IncrementalAgg.maintainSink]]).
  * Same methodology as SinksSpec's chaos block: the faulty://
  * filesystem throws at an exact protocol rename/delete, producing the
  * on-disk state a process kill at that instant would leave; the
  * assertions are old-or-new visibility at the crash point and
  * convergence on replay. Every case asserts the fault actually fired
  * (a chaos test whose predicate never matched proves nothing).
  */
class ChaosRecoverySpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def faultyPath(tag: String): String = {
    spark.sparkContext.hadoopConfiguration.set("fs.faulty.impl", classOf[FaultyFs].getName)
    "faulty://" + java.nio.file.Files.createTempDirectory(tag).toString
  }

  // ---- enrich.Checkpoint: the processed-keys store ----

  test("chaos: first Checkpoint.record killed at job commit — store reads as empty, replay converges") {
    val store = faultyPath("chaos_ck1") + "/keys"
    val ck = new Checkpoint(spark, store, "k")
    // Only the committer's JOB-commit merge renames land directly
    // under the store (task commits stay inside _temporary) — dying
    // there is the worst spot: the store dir exists but holds no
    // committed data file.
    FaultyFs.armRename((src, dst) =>
      src.toString.contains("_temporary") && !dst.toString.contains("_temporary") &&
        dst.toString.contains("/keys"))
    try {
      intercept[Exception] { ck.record(Seq("a", "b").toDF("k"), "r1") }
      assert(FaultyFs.didFire, "the injected fault must actually have fired")
    } finally FaultyFs.disarm()
    // Crash debris (an empty or _temporary-only store) must read as
    // "nothing processed", not wedge schema inference — the caller
    // re-runs the batch and every key fires again (the documented
    // at-least-once-on-crash contract of process-then-record).
    assert(ck.processedKeys().isEmpty, "crashed first record must leave an empty key store")
    ck.record(Seq("a", "b").toDF("k"), "r1")
    assert(ck.processedKeys().as[String].collect().toSet == Set("a", "b"))
  }

  test("chaos: Checkpoint.record killed mid-commit on a LIVE store — old keys survive, replay converges") {
    val store = faultyPath("chaos_ck2") + "/keys"
    val ck = new Checkpoint(spark, store, "k")
    ck.record(Seq("a", "b").toDF("k"), "r1")
    FaultyFs.armRename((src, dst) =>
      src.toString.contains("_temporary") && !dst.toString.contains("_temporary") &&
        dst.toString.contains("/keys"))
    try {
      intercept[Exception] { ck.record(Seq("b", "c", "d").toDF("k"), "r2") }
      assert(FaultyFs.didFire, "the injected fault must actually have fired")
    } finally FaultyFs.disarm()
    // Old-or-new at the key granularity: everything recorded before
    // the crash stays visible; at most a prefix of the crashed batch
    // may have landed (append-only store — a partial job commit can
    // expose SOME part files, never corrupt old ones).
    val mid = ck.processedKeys().as[String].collect().toSet
    assert(Set("a", "b").subsetOf(mid), s"crash lost previously committed keys: $mid")
    assert(mid.subsetOf(Set("a", "b", "c", "d")), s"crash invented keys: $mid")
    // Replay converges: re-recording the same batch is idempotent
    // (processedKeys reads DISTINCT), and filterNew then drops exactly
    // the recorded keys.
    ck.record(Seq("b", "c", "d").toDF("k"), "r2")
    assert(ck.processedKeys().as[String].collect().toSet == Set("a", "b", "c", "d"))
    val fresh = ck.filterNew(Seq("a", "b", "c", "d", "e").toDF("k")).as[String].collect().toSeq
    assert(fresh == Seq("e"), s"filterNew after replay must pass only unseen keys, got $fresh")
  }

  // ---- Incremental.maybeCompact: the watermark rename-aside swap ----

  /** Drive commits until the store's file count exceeds compactAfter,
    * so the NEXT commit triggers compaction.
    */
  private def fillStore(inc: Incremental, upToSeq: Int): Unit =
    (1 to upToSeq).foreach { i =>
      inc.commit(Seq((i.toLong, new java.sql.Timestamp(1700000000000L + i * 1000L)))
        .toDF("id", "ts"))
    }

  test("chaos: watermark compaction killed between its two renames — recovery restores, no rewind") {
    val state = faultyPath("chaos_wm1")
    val inc = new Incremental(spark, state, "ts", compactAfter = 3)
    fillStore(inc, 3) // 3 appended files: at the threshold, not over it
    // The swap rename is the only one whose SOURCE is the .compacting
    // staging dir itself (the committer's renames inside it carry
    // part-file suffixes); it runs AFTER the live store moved aside —
    // the window where NO live store exists.
    FaultyFs.armRename((src, _) => src.toString.endsWith(".compacting"))
    try {
      intercept[Exception] {
        inc.commit(Seq((99L, new java.sql.Timestamp(1700000099000L))).toDF("id", "ts"))
      }
      assert(FaultyFs.didFire, "the injected fault must actually have fired")
    } finally FaultyFs.disarm()
    // The 4th append COMMITTED before compaction crashed, so the
    // recovered watermark must include it — a rewind to None (or to
    // the pre-crash max) would re-read history as "new".
    val hwm = inc.currentWatermark()
    assert(hwm.contains(new java.sql.Timestamp(1700000099000L)),
      s"recovered watermark diverged: $hwm")
    // And the healed store keeps working: later commits advance it and
    // the retried compaction completes.
    inc.commit(Seq((100L, new java.sql.Timestamp(1700000100000L))).toDF("id", "ts"))
    assert(inc.currentWatermark().contains(new java.sql.Timestamp(1700000100000L)))
  }

  test("chaos: watermark compaction killed after the swap, before aside cleanup — readers already see the snapshot") {
    val state = faultyPath("chaos_wm2")
    val inc = new Incremental(spark, state, "ts", compactAfter = 3)
    fillStore(inc, 3)
    // The aside is deleted twice per compaction (pre-swap "superseded"
    // sweep, post-swap cleanup): skip the first match to die exactly
    // AFTER the swap completed.
    FaultyFs.armDelete(_.toString.endsWith(".old"), skip = 1)
    try {
      intercept[Exception] {
        inc.commit(Seq((99L, new java.sql.Timestamp(1700000099000L))).toDF("id", "ts"))
      }
      assert(FaultyFs.didFire, "the injected fault must actually have fired")
    } finally FaultyFs.disarm()
    // The swap was the commit pivot: the live store IS the compacted
    // snapshot, no recovery step needed; the stale aside is invisible
    // to readers and swept by the next compaction's pre-swap delete.
    assert(inc.currentWatermark().contains(new java.sql.Timestamp(1700000099000L)))
    val fs = new org.apache.hadoop.fs.Path(state).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$state/hwm.parquet.old")),
      "crash must have left the stale aside (else the fault hit the wrong delete)")
    inc.commit(Seq((100L, new java.sql.Timestamp(1700000100000L))).toDF("id", "ts"))
    assert(inc.currentWatermark().contains(new java.sql.Timestamp(1700000100000L)))
  }

  // ---- IncrementalAgg.maintainSink: the __batch-partition rollup log ----

  test("chaos: rollup-log batch commit killed mid-partition-publish — checkpoint restart replays, no double count") {
    val src = java.nio.file.Files.createTempDirectory("chaos_iagg_src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      src.resolve("events.parquet"))
    val rawSchema = graft.tables.TestTables.rawEventsSchema(spark, "/root/testdata/sf0.001")
    val out = faultyPath("chaos_iagg_out") + "/rollup"
    val checkpoint = java.nio.file.Files.createTempDirectory("chaos_iagg_ck").toString
    val keys = Seq("event_type")
    val ms = Seq("n" -> ("sum", lit(1L)), "last_us" -> ("max", col("ts_us")))
    def stream() = graft.tables.TestTables.normalizeEvents(
      spark.readStream.schema(rawSchema).parquet(src.toString))
    def run(): Unit =
      IncrementalAgg.maintainSink(stream(), out, checkpoint, keys, ms).awaitTermination(60000)

    // The dynamic-partition-overwrite publish renames the staged
    // partition dir to its final `__batch=N` location — dying there
    // leaves the log without the batch (or with a partial publish),
    // and the STREAM's checkpoint still holds the batch as
    // uncommitted.
    // src is the staged copy (under .spark-staging-<txn> or the
    // committer's _temporary) — which itself CONTAINS `__batch=N`, so
    // the filter keys on the staging markers, not on the partition
    // name's absence.
    FaultyFs.armRename((src0, dst) =>
      (src0.toString.contains(".spark-staging") || src0.toString.contains("_temporary")) &&
        dst.toString.matches(".*/__batch=\\d+(/[^/]+)?") &&
        !dst.toString.contains(".spark-staging") && !dst.toString.contains("_temporary"))
    try {
      intercept[Exception] { run() }
      assert(FaultyFs.didFire, "the injected fault must actually have fired")
    } finally FaultyFs.disarm()

    // Restart from the SAME checkpoint: AvailableNow re-delivers the
    // uncommitted batch under the same batch id; the dynamic overwrite
    // replaces exactly its own partition, so the fold equals the
    // one-pass recompute — nothing lost, nothing double-counted.
    run()
    val expected = IncrementalAgg.rollup(
      graft.tables.TestTables.events(spark, "/root/testdata/sf0.001"), keys, ms)
      .orderBy("event_type").collect().map(_.toSeq).toSeq
    val merged = IncrementalAgg.readMerged(spark, out, keys, Seq("n" -> "sum", "last_us" -> "max"))
      .orderBy("event_type").collect().map(_.toSeq).toSeq
    assert(merged == expected, s"replayed rollup log diverged from recompute")
  }
}
