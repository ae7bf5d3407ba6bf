package graft.sink

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ManifestTableSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def root() = graft.util.TempDirs.scratch("graft_manifest") + "/t"

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  private def mk(ids: Range, tag: String) =
    ids.map(i => (i.toLong, tag, i * 10)).toDF("id", "tag", "v")

  test("create / append / read round-trip") {
    val r = root()
    assert(ManifestTable.create(spark, r, mk(1 to 100, "a"), "id") == 1L)
    assert(ManifestTable.append(spark, r, mk(101 to 150, "b")) == 2L)
    val got = ManifestTable.read(spark, r)
    assert(got.count() == 150)
    assert(rowsOf(got) == rowsOf(mk(1 to 100, "a").unionAll(mk(101 to 150, "b"))))
  }

  test("upsert: updates win, others survive, result matches the plain merge") {
    val r = root()
    ManifestTable.create(spark, r, mk(1 to 100, "a"), "id")
    val updates = (40 to 60).map(i => (i.toLong, "UPD", i * 100)).toDF("id", "tag", "v")
    ManifestTable.upsert(spark, r, updates)
    val expect = Sinks.upsert(mk(1 to 100, "a"), updates, "id")
    assert(rowsOf(ManifestTable.read(spark, r)) == rowsOf(expect))
  }

  test("upsert rewrites only key-range-overlapping files; disjoint files carry over by reference") {
    val r = root()
    ManifestTable.create(spark, r, mk(1 to 100, "a").repartition(1), "id")
    ManifestTable.append(spark, r, mk(1000 to 1100, "b").repartition(1))
    val before = ManifestTable.snapshot(spark, r, 2L).entries.map(_.path).toSet
    ManifestTable.upsert(spark, r, Seq((1050L, "UPD", 0)).toDF("id", "tag", "v"))
    val after = ManifestTable.snapshot(spark, r, 3L).entries.map(_.path).toSet
    val lowFiles = before.filter(after.contains) // carried over by reference
    assert(lowFiles.nonEmpty, "the 1..100 file must survive untouched")
    val lowSnap = ManifestTable.snapshot(spark, r, 3L).entries
      .filter(e => lowFiles.contains(e.path))
    assert(lowSnap.forall(_.max.exists(_ <= 100L)), "only the low-range file carries over")
  }

  test("readers see old or new snapshot, never a torn mix (manifest is the commit)") {
    val r = root()
    ManifestTable.create(spark, r, mk(1 to 50, "a"), "id")
    val v1 = ManifestTable.read(spark, r).count()
    // Simulate a crashed writer: data files land, commit rename never
    // happens. Readers must be entirely blind to them.
    val orphanDir = new org.apache.hadoop.fs.Path(r, "data/batch-orphan")
    mk(51 to 90, "crash").write.parquet(orphanDir.toString)
    assert(ManifestTable.read(spark, r).count() == v1, "orphans invisible")
    assert(ManifestTable.latestVersion(spark, r) == 1L)
  }

  test("time travel: every committed version stays readable") {
    val r = root()
    ManifestTable.create(spark, r, mk(1 to 10, "a"), "id")
    ManifestTable.upsert(spark, r, Seq((5L, "UPD", 0)).toDF("id", "tag", "v"))
    assert(ManifestTable.read(spark, r, version = 1L)
      .filter($"id" === 5).select("tag").as[String].head() == "a")
    assert(ManifestTable.read(spark, r, version = 2L)
      .filter($"id" === 5).select("tag").as[String].head() == "UPD")
  }

  test("scanKeyRange skips files by manifest min/max") {
    val r = root()
    ManifestTable.create(spark, r, mk(1 to 100, "a").repartition(1), "id")
    ManifestTable.append(spark, r, mk(1000 to 1100, "b").repartition(1))
    ManifestTable.append(spark, r, mk(5000 to 5100, "c").repartition(1))
    val total = ManifestTable.snapshot(spark, r, 3L).entries.size
    val scan = ManifestTable.scanKeyRange(spark, r, 1000L, 1100L)
    assert(scan.count() == 101)
    assert(scan.inputFiles.length < total,
      s"file skipping must drop non-overlapping files (${scan.inputFiles.length} of $total)")
    assert(ManifestTable.scanKeyRange(spark, r, 900L, 950L).count() == 0)
  }

  test("deleteKeys removes exactly the keyed rows") {
    val r = root()
    ManifestTable.create(spark, r, mk(1 to 100, "a"), "id")
    ManifestTable.deleteKeys(spark, r, Seq(10L, 20L, 999L).toDF("id"))
    val got = ManifestTable.read(spark, r)
    assert(got.count() == 98)
    assert(got.filter($"id".isin(10, 20)).count() == 0)
  }

  test("rename-as-CAS: a stale commit loses; it never clobbers the winner") {
    val r = root()
    ManifestTable.create(spark, r, mk(1 to 10, "a"), "id")
    ManifestTable.append(spark, r, mk(11 to 20, "b")) // the "winner" lands v2
    // A writer that read v1 and tries to commit against expected=1
    // must LOSE (v2 exists) and leave v2's content untouched.
    val stale = ManifestTable.snapshot(spark, r, 1L)
    assert(ManifestTable.tryCommit(spark, r, "id", stale.entries, expected = 1L).isEmpty)
    assert(ManifestTable.read(spark, r).count() == 20, "winner's snapshot intact")
    // The public path re-derives against the winner and lands v3.
    assert(ManifestTable.append(spark, r, mk(21 to 30, "c")) == 3L)
    assert(ManifestTable.read(spark, r).count() == 30)
  }

  test("vacuum removes orphans and expired versions, keeps referenced files") {
    val r = root()
    ManifestTable.create(spark, r, mk(1 to 50, "a"), "id")
    mk(900 to 910, "crash").write.parquet(new org.apache.hadoop.fs.Path(r, "data/batch-orphan").toString)
    ManifestTable.upsert(spark, r, Seq((1L, "u1", 0)).toDF("id", "tag", "v"))
    ManifestTable.upsert(spark, r, Seq((2L, "u2", 0)).toDF("id", "tag", "v"))
    val deleted = ManifestTable.vacuum(spark, r, retainVersions = 2)
    assert(deleted.exists(_.contains("batch-orphan")), "orphan batch must die")
    assert(ManifestTable.read(spark, r).count() == 50)
    assert(ManifestTable.read(spark, r, version = 2L).count() == 50, "retained version stays readable")
    intercept[Exception] { ManifestTable.read(spark, r, version = 1L).count() }
  }

  test("changes classifies insert/update/delete and drops rewritten-but-unchanged rows") {
    val r = root()
    ManifestTable.create(spark, r, mk(1 to 10, "a"), "id")
    // v2: update 3, insert 11. Unchanged keys sharing a rewritten file
    // with key 3 move files without changing — none may appear in the
    // diff (the exact-set assertion below is the proof).
    ManifestTable.upsert(spark, r,
      Seq((3L, "UPD", 333), (11L, "new", 110)).toDF("id", "tag", "v"))
    ManifestTable.deleteKeys(spark, r, Seq(7L).toDF("id"))
    val got = ManifestTable.changes(spark, r, 1L, 3L)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getString(2))).toSet
    assert(got == Set(("update", 3L, "UPD"), ("insert", 11L, "new"), ("delete", 7L, "a")))
  }

  test("changes signs over the UNION of old and new columns across schema evolution") {
    val r = root()
    ManifestTable.create(spark, r, mk(1 to 4, "a"), "id")
    // v2 upserts key 2 with identical tag/v but a NEW column carrying a
    // value: the only difference is in the added column. Old-side-only
    // signing would call it "unchanged" and drop it from the diff.
    ManifestTable.upsert(spark, r,
      Seq((2L, "a", 20, "x")).toDF("id", "tag", "v", "extra"))
    val got = ManifestTable.changes(spark, r, 1L, 2L)
    assert(got.columns.contains("extra"), s"new column must appear in CDC output: ${got.columns.toSeq}")
    val rows = got.select($"change_type", $"id", $"extra")
      .as[(String, Long, Option[String])].collect().toSet
    assert(rows.contains(("update", 2L, Some("x"))),
      s"a row changed only in the evolved column must classify as update: $rows")
    // Rewritten-but-identical survivors sharing key 2's file must not
    // leak in as phantom updates (their null extra signs null on both sides).
    assert(!rows.exists(t => t._2 != 2L && t._1 == "update"), s"phantom updates: $rows")
  }

  test("changes surfaces a column an update set to NULL (no stale coalesce fallback)") {
    val r = root()
    ManifestTable.create(spark, r, mk(1 to 4, "a"), "id")
    // Key 2's update NULLs tag while changing v: the CDC row must show
    // tag = NULL — the old per-column coalesce re-asserted "a".
    ManifestTable.upsert(spark, r,
      Seq((2L, null.asInstanceOf[String], 999)).toDF("id", "tag", "v"))
    val row = ManifestTable.changes(spark, r, 1L, 2L)
      .filter($"id" === 2L).select($"change_type", $"tag", $"v").head()
    assert(row.getString(0) == "update" && row.isNullAt(1) && row.getInt(2) == 999,
      s"the nulled column must surface as NULL: $row")
  }

  test("changes reads only files that differ between the manifests") {
    val r = root()
    ManifestTable.create(spark, r, mk(1 to 100, "a").repartition(1), "id")
    ManifestTable.append(spark, r, mk(1000 to 1100, "b").repartition(1))
    ManifestTable.upsert(spark, r, Seq((1050L, "UPD", 0)).toDF("id", "tag", "v"))
    val carried = ManifestTable.snapshot(spark, r, 1L).entries.map(_.path).toSet
      .intersect(ManifestTable.snapshot(spark, r, 3L).entries.map(_.path).toSet)
    assert(carried.nonEmpty, "the low-range file must carry over")
    val diff = ManifestTable.changes(spark, r, 1L, 3L)
    assert(!diff.inputFiles.exists(f => carried.exists(f.contains)),
      "carried-by-reference files must not be read")
    // And between two versions whose manifests share everything the
    // v2 batch brought in, the v2 file still reads (it was added).
    assert(diff.filter($"change_type" === "insert").count() == 101)
  }

  test("upsertSink: data and batch-id watermark commit atomically; replays are no-ops") {
    val r = root()
    ManifestTable.create(spark, r, mk(1 to 50, "a"), "id")
    val sink = ManifestTable.upsertSink(r)
    val b0 = Seq((10L, "s0", 1), (51L, "s0", 2)).toDF("id", "tag", "v")
    val b1 = Seq((10L, "s1", 3)).toDF("id", "tag", "v")
    sink(b0, 0L); sink(b1, 1L)
    val vAfter = ManifestTable.latestVersion(spark, r)
    assert(ManifestTable.snapshot(spark, r, vAfter).lastBatchId == 1L)
    sink(b1, 1L) // crash-replay of the last batch
    sink(b0, 0L) // older replay
    assert(ManifestTable.latestVersion(spark, r) == vAfter, "replays must not commit")
    val got = ManifestTable.read(spark, r).filter($"id".isin(10, 51))
      .select($"id", $"tag").as[(Long, String)].collect().toMap
    assert(got == Map(10L -> "s1", 51L -> "s0"))
    // An empty batch advances the watermark without touching data.
    sink(b0.filter(lit(false)), 2L)
    assert(ManifestTable.snapshot(spark, r, vAfter + 1).lastBatchId == 2L)
    assert(ManifestTable.read(spark, r).count() == 51)
  }

  test("upsertSink under a real readStream: table equals the batch-mode merge") {
    val r = root()
    val srcDir = graft.util.TempDirs.scratch("graft_mstream") + "/src"
    ManifestTable.create(spark, r, mk(1 to 30, "base"), "id")
    val updates = (20 to 40).map(i => (i.toLong, "live", i)).toDF("id", "tag", "v")
    updates.write.parquet(srcDir)
    val q = spark.readStream.schema(updates.schema).parquet(srcDir)
      .writeStream.foreachBatch(ManifestTable.upsertSink(r))
      .option("checkpointLocation", srcDir + ".ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val expect = Sinks.upsert(mk(1 to 30, "base"), updates, "id")
    assert(rowsOf(ManifestTable.read(spark, r)) == rowsOf(expect))
  }

  test("schema evolution: a column added later null-fills older files on read and survives upsert") {
    val r = root()
    ManifestTable.create(spark, r, mk(1 to 10, "a"), "id")
    val withExtra = Seq((11L, "b", 110, "x")).toDF("id", "tag", "v", "extra")
    ManifestTable.append(spark, r, withExtra)
    val got = ManifestTable.read(spark, r)
    assert(got.columns.toSet == Set("id", "tag", "v", "extra"))
    assert(got.filter($"id" === 1).select("extra").head().isNullAt(0))
    assert(got.filter($"id" === 11).select("extra").as[String].head() == "x")
    // Upsert carrying the new column rewrites old-schema survivors
    // with a null extra — no error, no row loss.
    ManifestTable.upsert(spark, r, Seq((5L, "UPD", 0, "y")).toDF("id", "tag", "v", "extra"))
    val after = ManifestTable.read(spark, r)
    assert(after.count() == 11)
    assert(after.filter($"id" === 5).select("extra").as[String].head() == "y")
  }

  test("compact folds small files into one, rows and fingerprints unchanged") {
    val r = root()
    ManifestTable.create(spark, r, mk(1 to 50, "a").repartition(4), "id")
    ManifestTable.append(spark, r, mk(51 to 60, "b").repartition(3))
    val before = ManifestTable.snapshot(spark, r, 2L)
    assert(before.entries.size >= 5, "fixture needs many small files")
    val rows = rowsOf(ManifestTable.read(spark, r))
    ManifestTable.compact(spark, r) // everything here is tiny
    val after = ManifestTable.snapshot(spark, r, 3L)
    assert(after.entries.size == 1, s"expected one compacted file, got ${after.entries.size}")
    assert(rowsOf(ManifestTable.read(spark, r)) == rows, "layout-only: rows identical")
    assert(graft.ops.Audit.fingerprintsMatch(
      ManifestTable.read(spark, r, 2L), ManifestTable.read(spark, r, 3L),
      Seq("id", "tag", "v")), "pre/post-compaction fingerprints must match")
    // Big files would carry by reference: compact again is a no-op
    // commit (single file already).
    ManifestTable.compact(spark, r)
    assert(ManifestTable.snapshot(spark, r, 4L).entries.map(_.path)
      == after.entries.map(_.path))
  }

  test("chaos: a crash AT compact's layout-only commit rename leaves readers on the OLD layout; retry converges; vacuum reaps the orphan") {
    // Compaction shares tryCommit with upsert, but its commit carries
    // DIFFERENT state: a carried-by-reference big-file set plus one
    // rewritten small-files batch — kill the rename here too, or the
    // carry-by-reference path's crash window stays untested.
    spark.sparkContext.hadoopConfiguration.set("fs.faulty.impl", classOf[FaultyFs].getName)
    val r = "faulty://" + graft.util.TempDirs.scratch("graft_chaos_compact") + "/t"
    ManifestTable.create(spark, r, mk(1 to 20000, "big").repartition(1), "id")
    ManifestTable.append(spark, r, mk(20001 to 20010, "s").repartition(2))
    val before = rowsOf(ManifestTable.read(spark, r))
    val beforePaths = ManifestTable.snapshot(spark, r, 2L).entries.map(_.path)
    // 20 KB threshold: the 20k-row file classifies big (carried by
    // reference), the 5-row files small (rewritten). Pin the premise —
    // if parquet encoding ever shrinks the fixture below the line, the
    // test must fail HERE, not in the carry-by-reference assert below.
    val minBytes = 20000L
    val ffs = new org.apache.hadoop.fs.Path(r).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lens = ManifestTable.snapshot(spark, r, 2L).entries
      .map(e => ffs.getFileStatus(new org.apache.hadoop.fs.Path(r, e.path)).getLen)
    assert(lens.count(_ >= minBytes) == 1 && lens.count(_ < minBytes) == 2,
      s"fixture premise: one big + two small files around $minBytes, got $lens")
    FaultyFs.armRename((_, dst) => dst.getName.matches("v\\d{8}\\.manifest"))
    try {
      intercept[java.io.IOException] {
        ManifestTable.compact(spark, r, minBytes = minBytes, targetPartitions = 1)
      }
      assert(FaultyFs.didFire, "the injected fault must actually have fired")
    } finally FaultyFs.disarm()
    // Between the crash and recovery: the OLD layout, exactly — same
    // version, same files, same rows; the dead attempt's rewritten
    // batch is invisible.
    assert(ManifestTable.latestVersion(spark, r) == 2L)
    assert(ManifestTable.snapshot(spark, r, 2L).entries.map(_.path) == beforePaths,
      "a crashed layout commit must not perturb the committed file set")
    assert(rowsOf(ManifestTable.read(spark, r)) == before)
    // The retried compaction converges: layout-only (rows + fingerprint
    // identical), the big file carried by REFERENCE, the small files
    // folded into one rewritten batch file.
    assert(ManifestTable.compact(spark, r, minBytes = minBytes, targetPartitions = 1) == 3L)
    val after = ManifestTable.snapshot(spark, r, 3L)
    assert(rowsOf(ManifestTable.read(spark, r)) == before, "layout-only: rows identical")
    assert(graft.ops.Audit.fingerprintsMatch(
      ManifestTable.read(spark, r, 2L), ManifestTable.read(spark, r, 3L),
      Seq("id", "tag", "v")), "pre/post-crash-retry fingerprints must match")
    val carried = beforePaths.filter(after.entries.map(_.path).contains)
    assert(carried.size == 1, s"exactly the big file must carry by reference, got $carried")
    assert(after.entries.size == 2, s"big + one compacted file, got ${after.entries.size}")
    // Vacuum reaps the crashed attempt's orphan batch (written, never
    // referenced) without touching any retained snapshot's files.
    val reaped = ManifestTable.vacuum(spark, r, retainVersions = 10)
    assert(reaped.nonEmpty, "the crashed compaction's orphan batch must be reaped")
    assert(reaped.forall(p => !after.entries.map(_.path).contains(p)),
      "vacuum must never reap files the live snapshot references")
    assert(rowsOf(ManifestTable.read(spark, r)) == before, "vacuum must not touch referenced files")
  }

  test("deleting every row yields a readable empty table; upserting into it repopulates") {
    val r = root()
    ManifestTable.create(spark, r, mk(1 to 10, "a"), "id")
    ManifestTable.deleteKeys(spark, r, (1L to 10L).toDF("id"))
    val empty = ManifestTable.read(spark, r)
    assert(empty.count() == 0)
    assert(empty.columns.toSeq == Seq("id", "tag", "v"), "schema survives emptiness")
    ManifestTable.upsert(spark, r, mk(5 to 7, "back"))
    assert(ManifestTable.read(spark, r).count() == 3)
    intercept[IllegalArgumentException] {
      ManifestTable.create(spark, root(), mk(1 to 10, "a").filter(lit(false)), "id")
    }
  }

  test("a torn manifest write (crash before rename) is invisible to readers") {
    val r = root()
    ManifestTable.create(spark, r, mk(1 to 20, "a"), "id")
    val f = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    // A writer died mid-write: a garbage .tmp in manifests/ and a
    // half-written next-version file must both be ignored — .tmp by
    // name, and only fully-renamed vNNNNNNNN.manifest names resolve.
    val tmp = new org.apache.hadoop.fs.Path(r, "manifests/.tmp-deadbeef")
    val out = f.create(tmp, true); out.write("garbage\tnot-a-manifest".getBytes); out.close()
    assert(ManifestTable.latestVersion(spark, r) == 1L)
    assert(ManifestTable.read(spark, r).count() == 20)
  }

  test("chaos: a crash AT the manifest-commit rename leaves readers on the OLD snapshot; retry converges; vacuum reaps the orphan") {
    // Real fault injection (not fabricated debris): the faulty://
    // filesystem throws at the exact commit rename, so the on-disk
    // state is what a process kill at that instant leaves — a fully
    // written batch dir plus a .tmp manifest, and NO new version file.
    spark.sparkContext.hadoopConfiguration.set("fs.faulty.impl", classOf[FaultyFs].getName)
    val r = "faulty://" + graft.util.TempDirs.scratch("graft_chaos_commit") + "/t"
    ManifestTable.create(spark, r, mk(1 to 50, "a"), "id")
    val before = rowsOf(ManifestTable.read(spark, r))
    FaultyFs.armRename((_, dst) => dst.getName.matches("v\\d{8}\\.manifest"))
    try {
      intercept[java.io.IOException] { ManifestTable.upsert(spark, r, mk(40 to 60, "b")) }
      assert(FaultyFs.didFire, "the injected fault must actually have fired")
    } finally FaultyFs.disarm()
    // Readers between the crash and any recovery: OLD snapshot, exactly.
    assert(ManifestTable.latestVersion(spark, r) == 1L)
    assert(rowsOf(ManifestTable.read(spark, r)) == before,
      "a crashed commit must be invisible — old version, no torn mix")
    // The retried MERGE converges to the same result as if no crash
    // had happened; the dead attempt's batch stays orphaned until
    // vacuum, which must remove it without touching referenced files.
    ManifestTable.upsert(spark, r, mk(40 to 60, "b"))
    val want = rowsOf(mk(1 to 39, "a").unionByName(mk(40 to 60, "b")))
    assert(rowsOf(ManifestTable.read(spark, r)) == want)
    val reaped = ManifestTable.vacuum(spark, r, retainVersions = 10)
    assert(reaped.nonEmpty, "the crashed attempt's orphan batch must be reaped")
    assert(rowsOf(ManifestTable.read(spark, r)) == want, "vacuum must not touch referenced files")
  }

  test("guard rails: non-long stats column and double create are rejected") {
    val r = root()
    intercept[IllegalArgumentException] {
      ManifestTable.create(spark, r, Seq(("x", 1L)).toDF("s", "id"), "s")
    }
    ManifestTable.create(spark, r, mk(1 to 5, "a"), "id")
    intercept[IllegalArgumentException] {
      ManifestTable.create(spark, r, mk(1 to 5, "a"), "id")
    }
  }
}
