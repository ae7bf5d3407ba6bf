package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD-2 (slowly-changing-dimension) apply: fold a batch of keyed,
  * timestamped attribute updates into a validity-interval history
  * table — the write side of point-in-time enrichment, whose read side
  * is TemporalJoins.asOf. The reference's warehouse MERGE keeps only
  * current values (type 1); this is the upgrade a feature-store /
  * training-data warehouse actually wants: joins as of any date stay
  * reproducible after dimension changes.
  *
  * Contract: `current` carries (key, validFrom, validTo, payload...)
  * with exactly one open row (validTo IS NULL) per key at most;
  * `updates` carries (key, ts, payload...), unique per (key, ts).
  * Closed history rows are immutable and pass through untouched; the
  * open rows and the updates merge into a version chain per key —
  * consecutive versions with identical payload collapse (a re-stated
  * value is not a change), each version closes at the next version's
  * start, and the last stays open.
  *
  * Late updates — ts EARLIER than the key's history frontier (the
  * open row's valid_from, or for a fully-closed key the last closed
  * valid_to) — are caller errors (they would produce versions
  * overlapping the immutable closed history) and are DROPPED. An
  * update whose ts EQUALS the open row's valid_from deterministically
  * SUPERSEDES the open value (a same-instant restatement); the
  * zero-width version that would leave behind is filtered out.
  * Rewriting closed history belongs to a backfill rebuild, not an
  * incremental apply.
  *
  * Scale shape: history passes through with NO shuffle; the frontier
  * guard routes only the closed-boundary rows of keys PRESENT IN THIS
  * BATCH (semi-join pruned) through the same key exchange the version
  * windows use — open slice + update batch + pruned boundary markers
  * shuffle once on the key, and all window passes share that single
  * exchange.
  */
object Scd2 {

  def applyChanges(current: DataFrame, updates: DataFrame, key: String,
                   tsCol: String, payload: Seq[String],
                   validFrom: String = "valid_from",
                   validTo: String = "valid_to"): DataFrame = {
    require(payload.nonEmpty,
      "applyChanges needs at least one payload column — bare key validity has no change signal")
    val outCols = (col(key) +: payload.map(col)) ++ Seq(col(validFrom), col(validTo))
    val hist = current.filter(col(validTo).isNotNull).select(outCols: _*)
    val open = current.filter(col(validTo).isNull)
      .select(col(key) +: col(validFrom).as(tsCol) +: payload.map(col): _*)
      .withColumn("__open", lit(1))
    // Closed-boundary markers (__open = 2) for keys present in this
    // batch: the frontier of a FULLY-CLOSED key is its last valid_to —
    // the old open-row-only guard admitted updates INSIDE such keys'
    // closed intervals, creating overlapping validity. Semi-join
    // pruned, so only touched keys' boundary rows ride the exchange.
    val markers = current.filter(col(validTo).isNotNull)
      .join(updates.select(col(key)), Seq(key), "left_semi")
      .select(col(key) +: col(validTo).as(tsCol) +: payload.map(col): _*)
      .withColumn("__open", lit(2))
    val all = open.unionByName(
        updates.select(col(key) +: col(tsCol) +: payload.map(col): _*)
          .withColumn("__open", lit(0)))
      .unionByName(markers)
    // Late-update guard (see contract): the frontier is the max of the
    // open row's valid_from and any closed boundary, computed in the
    // same key exchange the version windows use below.
    val wAll = Window.partitionBy(col(key))
    val vers = all
      .withColumn("__frontier", max(when(col("__open") >= 1, col(tsCol))).over(wAll))
      .filter(col("__open") =!= 2 &&
        (col("__open") === 1 || col("__frontier").isNull || col(tsCol) >= col("__frontier")))
      .drop("__frontier")

    // Deterministic tiebreak at equal ts: the open row sorts FIRST so
    // a same-instant update supersedes it — ordering by ts alone let
    // the tie break arbitrarily per run, an impossibility in an
    // oracle-exact engine.
    val w = Window.partitionBy(col(key)).orderBy(col(tsCol), col("__open").desc)
    // A version is real if it's the key's first, or any payload field
    // null-safely differs from the previous version (per-field <=> so
    // the oracle's IS DISTINCT FROM transcribes exactly).
    val changed = payload.map(c => !(col(c) <=> lag(col(c), 1).over(w))).reduce(_ || _)
    vers
      .withColumn("__rn", row_number().over(w))
      .withColumn("__chg", changed)
      .filter(col("__rn") === 1 || col("__chg"))
      .withColumn(validFrom, col(tsCol))
      .withColumn(validTo, lead(col(tsCol), 1).over(w))
      .drop("__open")
      // A superseded same-instant open row is a zero-width version —
      // [t, t) matches no as-of instant; drop it rather than pollute
      // the history.
      .filter(col(validTo).isNull || col(validFrom) < col(validTo))
      .select(outCols: _*)
      .unionByName(hist)
  }
}
