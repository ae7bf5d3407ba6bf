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
  * Late updates — ts EARLIER than the key's open valid_from — are
  * caller errors (they would produce versions overlapping the
  * immutable closed history, which ends exactly at the open row's
  * valid_from) and are DROPPED, guarded inside the same key exchange
  * the version windows use. Rewriting closed history belongs to a
  * backfill rebuild, not an incremental apply.
  *
  * Scale shape: history passes through with NO shuffle; only the open
  * slice + the update batch (per key: one open row + this batch's
  * updates, NOT the key's full history) shuffle once on the key, and
  * the three window passes (rank, change flag, close date) all share
  * that one exchange.
  */
object Scd2 {

  def applyChanges(current: DataFrame, updates: DataFrame, key: String,
                   tsCol: String, payload: Seq[String],
                   validFrom: String = "valid_from",
                   validTo: String = "valid_to"): DataFrame = {
    val outCols = (col(key) +: payload.map(col)) ++ Seq(col(validFrom), col(validTo))
    val hist = current.filter(col(validTo).isNotNull).select(outCols: _*)
    val open = current.filter(col(validTo).isNull)
      .select(col(key) +: col(validFrom).as(tsCol) +: payload.map(col): _*)
      .withColumn("__open", lit(1))
    val all = open.unionByName(
      updates.select(col(key) +: col(tsCol) +: payload.map(col): _*)
        .withColumn("__open", lit(0)))
    // Late-update guard (see contract): drop updates older than the
    // key's open valid_from. The unbounded max shares the key exchange
    // with the version windows below — no extra shuffle.
    val wAll = Window.partitionBy(col(key))
    val vers = all
      .withColumn("__open_from", max(when(col("__open") === 1, col(tsCol))).over(wAll))
      .filter(col("__open_from").isNull || col(tsCol) >= col("__open_from"))
      .drop("__open", "__open_from")

    val w = Window.partitionBy(col(key)).orderBy(col(tsCol))
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
      .select(outCols: _*)
      .unionByName(hist)
  }
}
