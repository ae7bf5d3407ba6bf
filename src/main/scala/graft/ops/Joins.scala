package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-side planning helpers. */
object Joins {

  /** Salted equi-join: semantically IDENTICAL to
    * `probe.join(build, keys, joinType)`, but the shuffle distributes
    * each probe key over `saltBuckets` reducer partitions instead of
    * one.
    *
    * Why it exists at 100 TB: a pathological key (the null-surrogate
    * customer, the empty-referrer domain, the one hot document) puts
    * its entire row mass in ONE reducer task — the job is as slow as
    * that task, and at sufficient mass the task dies (shuffle fetch
    * OOM / disk). AQE's `OptimizeSkewedJoin` is the first answer, but
    * it only splits sort-merge partitions whose OTHER side can be
    * re-read per split, and it stands down when the join sits under a
    * required child distribution (e.g. feeding a bucketed write or a
    * co-partitioned agg) or when AQE is off. Salting is the plan-time
    * guarantee: probe rows get a deterministic round-robin salt in
    * [0, saltBuckets), the build side is replicated once per salt
    * value, and the join key becomes (keys…, salt) — per-task key mass
    * drops by saltBuckets, at the cost of a build side `saltBuckets`×
    * larger (choose a build side that is dim-sized but too big or too
    * skew-prone to broadcast).
    *
    * Only probe-preserving join types are legal: `inner`, `left`
    * (each probe row carries exactly one salt, so left rows are never
    * duplicated), `left_semi`, `left_anti`. Build-preserving types
    * (`right`, `full`) would surface the replicated build rows once
    * per salt and are rejected.
    *
    * The salt is `monotonically_increasing_id() % saltBuckets`:
    * round-robin within every input partition, so even a single
    * probe partition made entirely of ONE key spreads evenly. (A
    * hash-of-columns salt would send identical rows to the same
    * bucket — exact-duplicate skew, the common real-world case, would
    * survive it.) The salt only routes rows; the join RESULT is
    * partitioning-independent, which is what the plain-join oracle
    * checks.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
                 saltBuckets: Int, joinType: String = "inner"): DataFrame = {
    require(saltBuckets >= 2, s"saltBuckets must be >= 2, got $saltBuckets")
    val allowed = Set("inner", "left", "leftouter", "left_outer", "left_semi", "leftsemi", "left_anti", "leftanti")
    val jt = joinType.toLowerCase
    require(allowed.contains(jt),
      s"saltedJoin supports probe-preserving join types ${allowed.toSeq.sorted.mkString(", ")}; " +
        s"'$joinType' would emit replicated build rows")
    val salted = probe.withColumn("__salt",
      (monotonically_increasing_id() % saltBuckets).cast("int"))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Broadcast-hint `df` only when its MEASURED row count is provably
    * small; otherwise return it unhinted and let AQE decide at runtime.
    *
    * For gate sets (failed visits, no-diagnosis visits, duplicate ids)
    * that are usually tiny but are fractions of the data and so grow
    * without bound: a static `broadcast()` hint OOMs at large scale,
    * while no hint costs the fact side a full shuffle write before AQE
    * can convert the join back to broadcast. Counting the (already
    * materialized, cheap) gate set lifts AQE's own size test to plan
    * time: small → static broadcast, big → planner's choice.
    *
    * `maxRows` defaults to ~the rows of a narrow key column that fit
    * the 10 MB spirit of autoBroadcastJoinThreshold on large executors.
    */
  def broadcastIfSmall(df: DataFrame, maxRows: Long = 1000000L): DataFrame =
    if (df.limit((maxRows + 1).toInt).count() <= maxRows) broadcast(df) else df
}
