package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort and funnel analytics over an event log — the product-
  * analytics surface of the events table (the reference's dashboard
  * rolls up daily KPIs; retention and conversion are the next two
  * questions every such dashboard gets asked).
  */
object Cohorts {

  /** Cohort-retention counts: for each first-activity day (cohort) and
    * day offset k ≤ maxDays, how many of the cohort's users were
    * active on day cohort+k. Row (cohort_day, k, active_users);
    * k = 0 rows carry the cohort sizes.
    *
    * Shape at scale: the log collapses to DISTINCT (user, active-day)
    * FIRST — one shuffle bounded by users × active days, after which
    * nothing is event-volume-sized; cohorts come from a user-keyed
    * min; the join back is user-keyed (AQE picks the strategy); the
    * final matrix is days × maxDays tiny. Because (user, day) is
    * distinct, the matrix count IS the distinct-user count — no
    * countDistinct in the aggregate, so the rollup stays mergeable
    * (see streaming/IncrementalAgg) and the plan partial-aggregates.
    */
  def retention(events: DataFrame, userCol: String, tsCol: String, maxDays: Int): DataFrame = {
    val days = events
      .select(col(userCol).as("user"), to_date(col(tsCol)).as("day"))
      .distinct()
    val first = days.groupBy(col("user")).agg(min(col("day")).as("cohort_day"))
    days.join(first, Seq("user"))
      .withColumn("k", datediff(col("day"), col("cohort_day")))
      .filter(col("k") <= maxDays)
      .groupBy(col("cohort_day"), col("k"))
      .agg(count(lit(1)).as("active_users"))
  }

  /** Ordered conversion funnel: stage i counts users whose earliest
    * qualifying stage-i event comes strictly AFTER their stage-(i-1)
    * completion time (the order matters: a purchase before the first
    * view does not convert a view→purchase funnel). Returns one row
    * per stage: (stage_idx, stage, users).
    *
    * Shape at scale: one user-keyed min-aggregate per stage over only
    * that stage's events (filter pushes to the scan), chained by
    * user-keyed joins — never a per-user event sort, never a collect;
    * state is one timestamp per user per stage.
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String, tsUsCol: String,
             stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "need at least one stage")
    val spark = events.sparkSession
    import spark.implicits._
    // completion(i): per-user earliest stage-i time after completion(i-1).
    var completions = List.empty[(String, DataFrame)] // (stage, (user, __t))
    for ((stage, i) <- stages.zipWithIndex) {
      val evts = events.filter(col(typeCol) === stage)
        .select(col(userCol).as("user"), col(tsUsCol).as("__ts"))
      val qualified = completions.headOption match {
        case None => evts
        case Some((_, prev)) =>
          evts.join(prev, Seq("user")).filter(col("__ts") > col("__t")).drop("__t")
      }
      val done = qualified.groupBy(col("user")).agg(min(col("__ts")).as("__t"))
      completions ::= (stage, done)
    }
    completions.reverse.zipWithIndex.map { case ((stage, done), i) =>
      done.agg(count(lit(1)).as("users"))
        .select(lit(i + 1).as("stage_idx"), lit(stage).as("stage"), col("users"))
    }.reduce(_ unionByName _)
  }
}
