package graft.registry

import graft.ops.TemporalJoins
import graft.tables.TestTables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Registry: temporal join operators over the events stream — the
  * point-in-time (as-of) lookup and the interval-containment join.
  * DuckDB checks the as-of join with its NATIVE ASOF JOIN, so the
  * union+window formulation is verified against an independent
  * implementation of the semantics, not a transcription of itself.
  */
object QueriesTemporal {

  private def slimEvents(s: SparkSession, dir: String): DataFrame =
    TestTables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"), col("ts_us"))

  /** Shared probe/build preparation for the four as-of entries. The
    * clicks pre-aggregation (one row per (user, ts), max event_id) is
    * LOAD-BEARING for deterministic matches and must stay identical
    * across every variant — four verbatim copies once risked a
    * tie-break fix landing in some entries and not others.
    */
  private def asOfSides(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val e = slimEvents(s, dir)
    val purchases = e.filter(col("event_type") === "purchase").drop("event_type")
    val clicks = e.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts_us"))
      .agg(max(col("event_id")).as("click_id"))
      .withColumn("click_ts", col("ts_us"))
    (purchases, clicks)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // For each purchase, the latest click by the same user at or before
    // it (clicks pre-aggregated to one row per (user, ts) so the match
    // is deterministic).
    "q_asof_join" -> ((s, dir) => {
      val (purchases, clicks) = asOfSides(s, dir)
      TemporalJoins.asOf(purchases, clicks, "user_id", "ts_us", Seq("click_id", "click_ts"))
        .orderBy(col("event_id"))
    }),

    // The NATIVE as-of operator (custom LogicalPlan → Strategy →
    // streaming merge SparkPlan via SparkSessionExtensions): same
    // semantics and same DuckDB-native-ASOF oracle as q_asof_join,
    // but the physical plan is one exchange+sort PER SIDE and a
    // single-pass zip — no union, no window.
    "q_asof_native" -> ((s, dir) => {
      val (purchases, clicks) = asOfSides(s, dir)
      graft.plans.NativeAsOf.asOf(purchases, clicks, "user_id", "ts_us",
          Seq("click_id", "click_ts"))
        .orderBy(col("event_id"))
    }),

    // Forward as-of: the earliest click AT or AFTER each purchase —
    // the lookahead join of outcome labeling. Oracle: DuckDB native
    // ASOF with the inequality reversed.
    "q_asof_forward" -> ((s, dir) => {
      val (purchases, clicks) = asOfSides(s, dir)
      TemporalJoins.asOfDirected(purchases, clicks, "user_id", "ts_us",
          Seq("click_id", "click_ts"), "forward")
        .orderBy(col("event_id"))
    }),

    // Nearest as-of (ties to backward): closer of the two directional
    // sweeps, one exchange + two sorts. Oracle composes BOTH native
    // ASOF directions and replays the tie-break.
    "q_asof_nearest" -> ((s, dir) => {
      val (purchases, clicks) = asOfSides(s, dir)
      TemporalJoins.asOfDirected(purchases, clicks, "user_id", "ts_us",
          Seq("click_id", "click_ts"), "nearest")
        .orderBy(col("event_id"))
    }),

    // Purchases that happened inside an error-incident window (minute
    // buckets with >= 1 error, gaps of <= 15 empty minutes bridged),
    // matched via the banded interval join.
    "q_range_incident_join" -> ((s, dir) => {
      val e = slimEvents(s, dir)
      val incidents = TemporalJoins.incidentWindows(
        e.filter(col("event_type") === "error"), "ts_us",
        bucketUs = 60000000L, maxGapBuckets = 15)
      val purchases = e.filter(col("event_type") === "purchase").drop("event_type")
      TemporalJoins.bandJoin(purchases, incidents, Seq.empty, "ts_us",
          "start_us", "end_us", bandWidth = 3600000000L)
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("start_us"), col("end_us"), col("n_buckets"))
        .orderBy(col("event_id"), col("start_us"))
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q_asof_join" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, value,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |p AS (SELECT event_id, user_id, value, ts_us FROM e WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts_us, max(event_id) AS click_id, ts_us AS click_ts
        |      FROM e WHERE event_type = 'click' GROUP BY user_id, ts_us)
        |SELECT p.event_id, p.user_id, p.value, p.ts_us,
        |  c.click_id AS asof_click_id, c.click_ts AS asof_click_ts
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.ts_us <= p.ts_us
        |ORDER BY p.event_id""".stripMargin,

    "q_asof_native" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, value,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |p AS (SELECT event_id, user_id, value, ts_us FROM e WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts_us, max(event_id) AS click_id, ts_us AS click_ts
        |      FROM e WHERE event_type = 'click' GROUP BY user_id, ts_us)
        |SELECT p.event_id, p.user_id, p.value, p.ts_us,
        |  c.click_id AS asof_click_id, c.click_ts AS asof_click_ts
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.ts_us <= p.ts_us
        |ORDER BY p.event_id""".stripMargin,

    "q_asof_forward" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, value,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |p AS (SELECT event_id, user_id, value, ts_us FROM e WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts_us, max(event_id) AS click_id, ts_us AS click_ts
        |      FROM e WHERE event_type = 'click' GROUP BY user_id, ts_us)
        |SELECT p.event_id, p.user_id, p.value, p.ts_us,
        |  c.click_id AS asof_click_id, c.click_ts AS asof_click_ts
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.ts_us >= p.ts_us
        |ORDER BY p.event_id""".stripMargin,

    "q_asof_nearest" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, value,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |p AS (SELECT event_id, user_id, value, ts_us FROM e WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts_us, max(event_id) AS click_id, ts_us AS click_ts
        |      FROM e WHERE event_type = 'click' GROUP BY user_id, ts_us),
        |b AS (SELECT p.event_id, c.click_id AS b_id, c.click_ts AS b_ts
        |      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.ts_us <= p.ts_us),
        |f AS (SELECT p.event_id, c.click_id AS f_id, c.click_ts AS f_ts
        |      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.ts_us >= p.ts_us)
        |SELECT p.event_id, p.user_id, p.value, p.ts_us,
        |  CASE WHEN f.f_ts IS NULL THEN b.b_id WHEN b.b_ts IS NULL THEN f.f_id
        |       WHEN p.ts_us - b.b_ts <= f.f_ts - p.ts_us THEN b.b_id ELSE f.f_id END AS asof_click_id,
        |  CASE WHEN f.f_ts IS NULL THEN b.b_ts WHEN b.b_ts IS NULL THEN f.f_ts
        |       WHEN p.ts_us - b.b_ts <= f.f_ts - p.ts_us THEN b.b_ts ELSE f.f_ts END AS asof_click_ts
        |FROM p JOIN b ON p.event_id = b.event_id JOIN f ON p.event_id = f.event_id
        |ORDER BY p.event_id""".stripMargin,

    "q_range_incident_join" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |bkt AS (SELECT DISTINCT ts_us // 60000000 AS bkt FROM e WHERE event_type = 'error'),
        |flagged AS (
        |  SELECT bkt, CASE WHEN lag(bkt) OVER (ORDER BY bkt) IS NULL THEN 1
        |    WHEN bkt - lag(bkt) OVER (ORDER BY bkt) > 16 THEN 1 ELSE 0 END AS nb
        |  FROM bkt),
        |runs AS (SELECT bkt, sum(nb) OVER (ORDER BY bkt
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run FROM flagged),
        |incidents AS (
        |  SELECT min(bkt) * 60000000 AS start_us, (max(bkt) + 1) * 60000000 - 1 AS end_us,
        |    count(*) AS n_buckets
        |  FROM runs GROUP BY run),
        |p AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.ts_us, i.start_us, i.end_us, i.n_buckets
        |FROM p JOIN incidents i ON p.ts_us BETWEEN i.start_us AND i.end_us
        |ORDER BY p.event_id, i.start_us""".stripMargin,
  )
}
