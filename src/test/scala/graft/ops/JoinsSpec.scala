package graft.ops

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class JoinsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  // Heavy skew on purpose: 80% of probe rows share key 1.
  private lazy val probe = (1 to 500).map(i => (if (i <= 400) 1 else i % 7, i))
    .toDF("k", "v")
  private lazy val build = Seq((1, "one"), (2, "two"), (3, "three"), (9, "unmatched"))
    .toDF("k", "name")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  test("saltedJoin == plain join for inner, left, left_semi, left_anti") {
    for (jt <- Seq("inner", "left", "left_semi", "left_anti")) {
      val plain = probe.join(build, Seq("k"), jt)
      val salted = Joins.saltedJoin(probe, build, Seq("k"), saltBuckets = 8, joinType = jt)
      assert(salted.columns.toSeq == plain.columns.toSeq, s"columns for $jt")
      assert(rows(salted) == rows(plain), s"rows for $jt")
    }
  }

  test("saltedJoin rejects build-preserving join types and degenerate bucket counts") {
    intercept[IllegalArgumentException] {
      Joins.saltedJoin(probe, build, Seq("k"), 8, "right")
    }
    intercept[IllegalArgumentException] {
      Joins.saltedJoin(probe, build, Seq("k"), 8, "full")
    }
    intercept[IllegalArgumentException] {
      Joins.saltedJoin(probe, build, Seq("k"), 1)
    }
  }

  test("broadcastIfSmall rejects maxRows past Int range (the +1 cast would wrap to limit(1))") {
    val df = spark.range(5).toDF("k")
    intercept[IllegalArgumentException] { Joins.broadcastIfSmall(df, maxRows = Int.MaxValue.toLong) }
    intercept[IllegalArgumentException] { Joins.broadcastIfSmall(df, maxRows = 4294967296L) }
    intercept[IllegalArgumentException] { Joins.broadcastIfSmall(df, maxRows = -1L) }
    assert(Joins.broadcastIfSmall(df, maxRows = (Int.MaxValue - 1).toLong).count() == 5)
  }

  test("Skew.saltedJoin rejects dim-preserving join types like its Joins twin") {
    val fact = Seq((1L, "a")).toDF("k", "f")
    val dim = Seq((1L, "d")).toDF("k", "dv")
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(fact, dim, "k", fact("f"), buckets = 4, joinType = "right")
    }
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(fact, dim, "k", fact("f"), buckets = 1)
    }
  }

  test("the hot key's rows actually spread across salt buckets") {
    // Re-derive the salted probe the way saltedJoin builds it and check
    // the spreading property: the 400 rows of key 1 land in ALL 8
    // buckets with no bucket dominating (the hot key interleaves with
    // other keys in the id sequence, so the split is near- but not
    // exactly-uniform).
    val salted = probe.repartition(4)
      .withColumn("__salt", (monotonically_increasing_id() % 8).cast("int"))
    val perBucket = salted.filter($"k" === 1).groupBy($"__salt").count()
      .as[(Int, Long)].collect().toMap
    assert(perBucket.keySet.size == 8, s"only buckets ${perBucket.keySet} used")
    assert(perBucket.values.max <= 2 * perBucket.values.min,
      s"no bucket may dominate: $perBucket")
  }

  test("salted plan joins on (key, salt) and replicates the build side via explode") {
    val plan = Joins.saltedJoin(probe, build, Seq("k"), 8)
      .queryExecution.analyzed.toString
    assert(plan.contains("__salt"), "salt column must be part of the join")
    assert(plan.toLowerCase.contains("explode"), "build side must replicate via explode(sequence)")
    // The public result surface is salt-free.
    assert(!Joins.saltedJoin(probe, build, Seq("k"), 8).columns.contains("__salt"))
  }

  test("bloomPrunedJoin == plain join for inner, left, left_semi, left_anti") {
    for (jt <- Seq("inner", "left", "left_semi", "left_anti")) {
      val plain = probe.join(build, Seq("k"), jt)
      val pruned = Joins.bloomPrunedJoin(probe, build, Seq("k"), jt)
      assert(pruned.columns.toSeq == plain.columns.toSeq, s"columns for $jt")
      assert(rows(pruned) == rows(plain), s"rows for $jt")
    }
  }

  test("bloomPrunedJoin stays exact under heavy false positives (tiny sketch)") {
    // 64 bits for 500 keys: the sketch saturates and passes nearly
    // everything — the real join must still settle every row.
    for (jt <- Seq("inner", "left", "left_semi", "left_anti")) {
      val plain = probe.join(build, Seq("k"), jt)
      val pruned = Joins.bloomPrunedJoin(probe, build, Seq("k"), jt,
        expectedItems = 4, numBits = 64)
      assert(rows(pruned) == rows(plain), s"rows for $jt under saturation")
    }
  }

  test("bloomPrunedJoin handles null keys and empty sides") {
    val p = Seq((Option(1), "a"), (None, "b"), (Option(5), "c")).toDF("k", "v")
    val b = Seq((Option(1), "one"), (None, "null-key")).toDF("k", "name")
    for (jt <- Seq("inner", "left", "left_semi", "left_anti")) {
      assert(rows(Joins.bloomPrunedJoin(p, b, Seq("k"), jt))
        == rows(p.join(b, Seq("k"), jt)), s"null keys, $jt")
      val empty = b.filter(lit(false))
      assert(rows(Joins.bloomPrunedJoin(p, empty, Seq("k"), jt))
        == rows(p.join(empty, Seq("k"), jt)), s"empty build, $jt")
    }
  }

  test("bloomPrunedJoin actually prunes: non-matching probe rows drop before the join") {
    // Build keys cover only {2, 3}: of the 500 probe rows only
    // k∈{2,3} (plus bloom false positives, ~0 at this sizing) should
    // survive the pre-filter. Reconstruct the pruned probe the way the
    // operator builds it and check the count collapsed.
    val smallBuild = build.filter($"k" =!= 1 && $"k" =!= 9)
    val bf = smallBuild.agg(
      call_function("graft_bloom_agg", xxhash64($"k"), lit(1000L), lit(1L << 16))
        .as("bf")).head.getAs[Array[Byte]](0)
    val kept = probe.filter(call_function("graft_might_contain", lit(bf), xxhash64($"k"))).count()
    val trueMatches = probe.filter($"k".isin(2, 3)).count()
    assert(kept >= trueMatches, "no false negatives allowed")
    assert(kept <= trueMatches + 10, s"pruning should collapse the probe (kept=$kept)")
  }

  test("bloom pre-filter sits UNDER the join in the optimized plan (prunes before the shuffle)") {
    // A local-relation probe gets the filter constant-folded away at
    // plan time (which is itself the proof it runs pre-join); the
    // cluster-relevant shape needs a file-backed probe.
    val dir = graft.util.TempDirs.scratch("graft_bloomplan")
    probe.write.mode("overwrite").parquet(s"$dir/probe")
    val fileProbe = spark.read.parquet(s"$dir/probe")
    val plan = Joins.bloomPrunedJoin(fileProbe, build, Seq("k"), "inner")
      .queryExecution.optimizedPlan
    val joins = plan.collect { case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.nonEmpty)
    val hasBloomFilter = joins.head.left.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.condition.find(_.isInstanceOf[
          org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]).isDefined => f
    }
    assert(hasBloomFilter.nonEmpty,
      s"might_contain must filter the probe below the join:\n$plan")
  }

  test("bloomPrunedJoin rejects join types with no prunable side") {
    intercept[IllegalArgumentException] {
      Joins.bloomPrunedJoin(probe, build, Seq("k"), "full")
    }
    intercept[IllegalArgumentException] {
      Joins.bloomPrunedJoin(probe, build, Seq("k"), "right")
    }
  }
}
