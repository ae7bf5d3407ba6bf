package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CUSUM drift detection — the live form of
  * [[graft.ops.Anomaly.cusumByGroup]] (its batch twin, whose
  * q_ts_cusum_by_type oracle pins the semantics): each closed
  * per-group period (a day of event volume, a clinic's daily claim
  * count) advances Page's recursion s ← max(0, s + (n − k)) and emits
  * the running statistic plus the alarm verdict as it happens,
  * instead of re-scanning history every morning.
  *
  * State is O(1) per group — (last period, running s) — so a million
  * monitored segments hold a million tiny rows of state, nothing
  * history-sized. Input contract, stated loudly: the stream must be
  * the ORDERED closed-period stream per group — exactly what a
  * watermark-closed windowed aggregation (or
  * [[IncrementalAgg.maintainSink]]'s rollup log) emits. Within a
  * micro-batch rows sort by period; a period arriving AT or BEFORE
  * the group's last processed period across batches is a broken
  * upstream (CUSUM is order-sensitive — silently folding it would
  * corrupt every later verdict) and fails the query rather than
  * drifting.
  */
object DriftStream {

  final case class DriftPoint(group: String, period_idx: Long, n: Long)
  final case class DriftOut(group: String, period_idx: Long, n: Long,
                            cusum: Long, alarm: Boolean)
  final case class DriftState(lastPeriod: Long, s: Long)

  def cusumStream(points: Dataset[DriftPoint], k: Long, h: Long): Dataset[DriftOut] = {
    import points.sparkSession.implicits._
    points
      .groupByKey(_.group)
      .flatMapGroupsWithState[DriftState, DriftOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (g: String, rows: Iterator[DriftPoint], state: GroupState[DriftState]) =>
          val sorted = rows.toSeq.sortBy(_.period_idx)
          var st = state.getOption.getOrElse(DriftState(Long.MinValue, 0L))
          val out = Seq.newBuilder[DriftOut]
          sorted.foreach { p =>
            if (p.period_idx <= st.lastPeriod)
              throw new IllegalStateException(
                s"cusumStream: period ${p.period_idx} for group '$g' arrived at or " +
                  s"before the last processed period ${st.lastPeriod} — the input " +
                  "must be an ordered closed-period stream (watermark-closed " +
                  "aggregates); folding it silently would corrupt every later verdict")
            val s2 = math.max(0L, st.s + (p.n - k))
            st = DriftState(p.period_idx, s2)
            out += DriftOut(g, p.period_idx, p.n, s2, s2 > h)
          }
          state.update(st)
          out.result().iterator
      }
  }
}
