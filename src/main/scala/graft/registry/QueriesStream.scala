package graft.registry

import graft.ops.ColumnOps
import graft.streaming.EventsStream
import graft.tables.TestTables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Registry: the streaming transforms applied in batch mode (the same
  * functions run under readStream in StreamingSpec) with DuckDB
  * oracles. Sums go through DECIMAL so accumulation order can't skew
  * the hash.
  */
object QueriesStream {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Tumbling 5-minute windowed aggregation (watermarked on a stream).
    "q_stream_windowed_agg" -> ((s, dir) =>
      EventsStream.windowedAgg(
          TestTables.events(s, dir)
            .withColumn("value", col("value").cast("decimal(18,2)")))
        .withColumn("total_value", col("total_value").cast("double"))
        .orderBy(col("window_start"), col("event_type"))),

    // Incremental rollup maintenance: the corpus splits at a MID-DAY
    // watermark (2024-01-16T12:00Z) into "already rolled up" and "new
    // poll window"; each half aggregates independently and the two
    // rollups fold via IncrementalAgg.merge — so the cut day's groups
    // genuinely merge partials, they don't just pass through. The
    // oracle aggregates ALL events in one pass: the fold must be
    // EXACT, or incremental maintenance would silently drift from a
    // recompute.
    "q_agg_incremental_merge" -> ((s, dir) => {
      import graft.streaming.IncrementalAgg
      val cutUs = 1705406400000000L // 2024-01-16T12:00:00Z
      val keys = Seq("day", "event_type")
      val measures = Seq(
        "n" -> ("sum", lit(1L)),
        "total_value" -> ("sum", col("value").cast("decimal(18,2)")),
        "first_us" -> ("min", col("ts_us")),
        "last_us" -> ("max", col("ts_us")))
      def slice(keep: org.apache.spark.sql.Column) =
        TestTables.events(s, dir).filter(keep)
          .select(to_date(col("ts")).as("day"), col("event_type"),
            col("value"), col("ts_us"))
      val prev = IncrementalAgg.rollup(slice(col("ts_us") < cutUs), keys, measures)
      val delta = IncrementalAgg.rollup(slice(col("ts_us") >= cutUs), keys, measures)
      IncrementalAgg.merge(Seq(prev, delta), keys,
          Seq("n" -> "sum", "total_value" -> "sum", "first_us" -> "min", "last_us" -> "max"))
        .withColumn("total_value", col("total_value").cast("double"))
        .orderBy(col("day"), col("event_type"))
    }),

    // Stream-static dimension enrichment: events left-join the static
    // customer dim (broadcast — the stateless streaming join shape).
    "q_stream_dim_join" -> ((s, dir) =>
      EventsStream.enrichWithDim(
          TestTables.events(s, dir).select(col("event_id"), col("user_id"), col("value")),
          TestTables.customer(s, dir), "user_id", "c_custkey",
          Seq("c_name", "c_mktsegment"))
        .orderBy(col("event_id"))),

    // Session-length distribution: events per 30-min-gap session,
    // bucketed — the product-analytics histogram behind "how long are
    // visits". Replays the native session grouping then one count-of-
    // counts aggregation.
    "q_session_lengths" -> ((s, dir) =>
      TestTables.events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("len"))
        .groupBy(col("len")).agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("len"))),

    // Hopping (sliding) windows: 10-minute windows every 5 minutes —
    // each event lands in exactly two windows. The oracle derives the
    // same membership arithmetically (the two aligned starts covering
    // each timestamp), not via Spark's window() — an independent
    // formulation of the overlap semantics.
    "q_stream_hopping_agg" -> ((s, dir) =>
      TestTables.events(s, dir)
        .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).as("tv"))
        .select(col("w.start").as("window_start"), col("event_type"),
          col("n_events"), col("tv").cast("double").as("total_value"))
        .orderBy(col("window_start"), col("event_type"))),

    // Native session windows (Spark's own session_window operator, the
    // merging-window aggregation): 30-minute gap per user. The oracle
    // derives the same sessions by the INDEPENDENT lag/cumsum
    // formulation — the two definitions must coincide exactly. NOTE
    // the boundary: session_window's end is EXCLUSIVE (an event at
    // exactly +gap starts a new session, oracle uses >=), while
    // EventsStream.sessionizeBatch keeps it (strict > split) — two
    // deliberate formulations, not interchangeable at the boundary.
    "q_stream_session_window" -> ((s, dir) =>
      TestTables.events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).as("tv"))
        .select(col("user_id"),
          col("sw.start").as("session_start"), col("sw.end").as("session_end"),
          col("n_events"), col("tv").cast("double").as("total_value"))
        .orderBy(col("user_id"), col("session_start"))),

    // 30-minute-gap sessionization, batch twin of the stateful stream.
    "q_stream_sessions" -> ((s, dir) =>
      EventsStream.sessionizeBatch(
          TestTables.events(s, dir)
            .withColumn("value", col("value").cast("decimal(18,2)")))
        .withColumn("total_value", col("total_value").cast("double"))
        .orderBy(col("user_id"), col("session_start_us"))),

    // Trailing-30-minute per-event user features (RANGE frame: one
    // shuffle + sort, no self-join).
    "q_event_features" -> ((s, dir) =>
      EventsStream.trailingFeatures(
          TestTables.events(s, dir).withColumn("value", col("value").cast("decimal(18,2)")),
          windowUs = 1800000000L)
        .withColumn("sum_trailing", col("sum_trailing").cast("double"))
        .orderBy(col("event_id"))),

    // Click attribution batch twin: purchases × same-user clicks in the
    // preceding 30 minutes (StreamingSpec runs the SAME function as a
    // watermarked stream-stream interval join and asserts equality).
    "q_stream_attribution" -> ((s, dir) => {
      val ev = TestTables.events(s, dir)
      EventsStream.attributionJoin(
          ev.filter(col("event_type") === "purchase"),
          ev.filter(col("event_type") === "click"))
        .orderBy(col("purchase_id"), col("click_id"))
    }),

    // Trending heavy hitters per 6-hour window via the SpaceSaving
    // sketch aggregate (capacity 64 >> the 5 event types, so counts
    // are exact and the oracle hash-checks). StreamingSpec runs the
    // stateful twin — the sketch as flatMapGroupsWithState state —
    // and asserts it converges to this batch result.
    "q_stream_trending" -> ((s, dir) =>
      EventsStream.trendingBatch(TestTables.events(s, dir),
          windowMinutes = 360, k = 3, capacity = 64)
        .orderBy(col("window_start"), col("rank"))),

    // Exactly-once over the reference's overlapping poll windows: the
    // current 4.5h window unioned with the previous poll's tail
    // (30-minute overlap), deduped to one copy per event. The streaming
    // twin (dropDuplicatesWithinWatermark) is exercised in StreamingSpec.
    "q_stream_dedup_overlap" -> ((s, dir) => {
      val ev = TestTables.events(s, dir)
      val hi = ev.agg(max(col("ts")).as("__hi"))
      val base = ev.join(broadcast(hi))
      def slim(df: DataFrame): DataFrame =
        df.select(col("event_id"), col("ts_us"), col("event_type"), col("value"))
      val current = base.filter(col("ts") >= ColumnOps.minutesBefore(col("__hi"), 270))
      val previous = base.filter(col("ts") >= ColumnOps.minutesBefore(col("__hi"), 510) &&
        col("ts") < ColumnOps.minutesBefore(col("__hi"), 240))
      EventsStream.dedupOverlap(Seq(slim(current), slim(previous)))
        .orderBy(col("event_id"))
    }),

    // Streaming LLM enrichment END-TO-END under the full oracle: the
    // distinct claims stage as a parquet stream source, the foreachBatch
    // sink anti-joins the durable key checkpoint, runs the batch LLM
    // fan-out, and MERGEs into the partitioned target; the table read
    // back must equal the closed-form mock answer for every claim —
    // the streaming twin of q_c4_llm_predictions. (Replay/exactly-once
    // semantics are exercised in StreamingSpec with a call-counting
    // client.) Claims are key-distinct because the MERGE key must be
    // unique; uid = orderkey*10 + linenumber is injective here
    // (linenumber < 10).
    "q_stream_llm_enrich" -> ((s, dir) => {
      val base = graft.util.TempDirs.scratch("stream_enrich")
      val claims = TestTables.lineitem(s, dir)
        .select(col("l_orderkey").as("visit_id"),
          (col("l_orderkey") * 10 + col("l_linenumber")).as("uid"))
        .distinct()
        .withColumn("part", (col("visit_id") % 8).cast("int"))
      claims.write.mode("overwrite").parquet(s"$base/src")
      val stream = s.readStream.schema(claims.schema).parquet(s"$base/src")
      val q = graft.streaming.EnrichStream.predictSink(stream, s"$base/table", "uid",
        "visit_id", "uid", "part", s"$base/keys", s"$base/ckpt",
        () => new graft.enrich.MockLlmClient())
      // Fail LOUDLY on timeout: an unchecked false return would read
      // the output table while the stream is still MERGE-ing into it —
      // a flaky partial-result hash with the query left running.
      if (!q.awaitTermination(300000)) {
        q.stop()
        throw new IllegalStateException("q_stream_llm_enrich: stream did not drain in 300s")
      }
      s.read.parquet(s"$base/table")
        .select(col("visit_id"), col("uid"), col("medical_prediction"), col("reason"))
        .orderBy(col("visit_id"), col("uid"))
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q_session_lengths" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |marked AS (
        |  SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
        |                   OR ts_us - lag(ts_us) OVER w >= 1800000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |sess AS (
        |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                                ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked),
        |lens AS (SELECT CAST(count(*) AS BIGINT) AS len FROM sess GROUP BY user_id, sid)
        |SELECT len, CAST(count(*) AS BIGINT) AS n_sessions
        |FROM lens GROUP BY len ORDER BY len""".stripMargin,

    "q_stream_hopping_agg" ->
      """WITH e AS (
        |  SELECT event_type, value, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |m AS (
        |  SELECT event_type, value,
        |    ((ts_us // 300000000) - k.k) * 300000000 AS start_us
        |  FROM e, (SELECT unnest([0, 1]) AS k) k)
        |SELECT make_timestamp(start_us) AS window_start, event_type,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM m GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,

    "q_stream_session_window" ->
      """WITH e AS (
        |  SELECT user_id, event_id, value, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |marked AS (
        |  SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
        |                   OR ts_us - lag(ts_us) OVER w >= 1800000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |sess AS (
        |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                                ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked)
        |SELECT user_id,
        |  make_timestamp(min(ts_us)) AS session_start,
        |  make_timestamp(max(ts_us) + 1800000000) AS session_end,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    "q_stream_dim_join" ->
      """SELECT e.event_id, e.user_id, e.value, c.c_name, c.c_mktsegment
        |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
        |ORDER BY e.event_id""".stripMargin,

    "q_stream_windowed_agg" ->
      """SELECT make_timestamp((epoch_us(CAST(ts AS TIMESTAMP)) // 300000000) * 300000000) AS window_start,
        |  event_type, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,

    "q_agg_incremental_merge" ->
      """SELECT CAST(ts AS DATE) AS day, event_type,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        |  min(epoch_us(CAST(ts AS TIMESTAMP))) AS first_us,
        |  max(epoch_us(CAST(ts AS TIMESTAMP))) AS last_us
        |FROM events
        |GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,

    "q_stream_sessions" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value FROM events),
        |flagged AS (
        |  SELECT user_id, ts_us, value,
        |    CASE WHEN lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) IS NULL THEN 1
        |         WHEN ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) > 1800000000 THEN 1
        |         ELSE 0 END AS new_session
        |  FROM e),
        |numbered AS (
        |  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session
        |  FROM flagged)
        |SELECT user_id, min(ts_us) AS session_start_us, CAST(count(*) AS INT) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM numbered GROUP BY user_id, session
        |ORDER BY user_id, session_start_us""".stripMargin,

    "q_event_features" ->
      """SELECT event_id, user_id, ts_us,
        |  count(*) OVER w AS n_trailing,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_trailing
        |FROM (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value FROM events) e
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
        |             RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "q_stream_attribution" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS t,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
        |  FROM events)
        |SELECT p.event_id AS purchase_id, p.user_id, p.ts_us AS purchase_ts_us,
        |  c.event_id AS click_id, c.ts_us AS click_ts_us
        |FROM e p JOIN e c
        |  ON p.event_type = 'purchase' AND c.event_type = 'click'
        | AND c.user_id = p.user_id
        | AND c.t >= p.t - INTERVAL 30 MINUTES AND c.t <= p.t
        |ORDER BY purchase_id, click_id""".stripMargin,

    "q_stream_trending" ->
      """WITH w AS (
        |  SELECT make_timestamp((epoch_us(CAST(ts AS TIMESTAMP)) // 21600000000) * 21600000000) AS window_start,
        |    event_type AS term
        |  FROM events),
        |c AS (SELECT window_start, term, count(*) AS cnt FROM w GROUP BY 1, 2),
        |r AS (SELECT window_start, term, cnt,
        |  CAST(row_number() OVER (PARTITION BY window_start ORDER BY cnt DESC, term) AS INT) AS rank
        |  FROM c)
        |SELECT window_start, rank, term, cnt FROM r WHERE rank <= 3
        |ORDER BY window_start, rank""".stripMargin,

    "q_stream_dedup_overlap" ->
      """WITH e AS (
        |  SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type, value,
        |    CAST(ts AS TIMESTAMP) AS tst
        |  FROM events),
        |hi AS (SELECT max(tst) AS h FROM e)
        |SELECT DISTINCT event_id, ts_us, event_type, value FROM e, hi
        |WHERE tst >= h - INTERVAL 270 MINUTES
        |   OR (tst >= h - INTERVAL 510 MINUTES AND tst < h - INTERVAL 240 MINUTES)
        |ORDER BY event_id""".stripMargin,

    "q_stream_llm_enrich" ->
      """WITH c AS (
        |  SELECT DISTINCT l_orderkey AS visit_id, l_orderkey * 10 + l_linenumber AS uid
        |  FROM lineitem)
        |SELECT visit_id, uid,
        |  CASE WHEN visit_id % 97 = 0 THEN 'Failed to reach LLM'
        |       WHEN uid % 5 = 0 THEN 'Rejected'
        |       ELSE 'Approved' END AS medical_prediction,
        |  CASE WHEN visit_id % 97 <> 0 AND uid % 5 = 0
        |       THEN 'service ' || CAST(uid AS VARCHAR) || ' is a duplicate order'
        |       END AS reason
        |FROM c ORDER BY visit_id, uid""".stripMargin,
  )
}
