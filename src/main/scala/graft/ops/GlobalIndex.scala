package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Global sequence numbers — the scalable form of
  * `row_number() OVER (ORDER BY …)`, which Spark plans as a
  * SINGLE-partition window: the whole dataset funnels through one
  * task, the one shape guaranteed to fall over at 100 TB.
  *
  * Here instead: range-repartition on the order columns (each
  * partition owns a contiguous key range), sort within partitions,
  * materialize ONCE so the sampled range boundaries are frozen, then
  * `zipWithIndex` — a per-partition count job plus offset-shifted
  * local indexes, all partitions busy, no global funnel. The order
  * must be TOTAL (include a tiebreaker key) for the index to be
  * deterministic; ties would get a stable-but-arbitrary order.
  *
  * This is the serving-order primitive of a training pipeline (epoch
  * sequence ids, curriculum positions) and the one RDD use in the
  * engine — `zipWithIndex` IS the per-partition imperative logic the
  * Dataset API has no declarative form of.
  */
object GlobalIndex {

  def withGlobalIndex(df: DataFrame, orderCols: Seq[Column],
                      outCol: String = "global_idx",
                      numPartitions: Int = 0): DataFrame = {
    val ranged =
      if (numPartitions > 0) df.repartitionByRange(numPartitions, orderCols: _*)
      else df.repartitionByRange(orderCols: _*)
    val sorted = graft.util.Materialize.once(
      ranged.sortWithinPartitions(orderCols: _*))
    val schema = sorted.schema.add(outCol, LongType, nullable = false)
    val indexed = sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    sorted.sparkSession.createDataFrame(indexed, schema)
  }

  /** Running (prefix) sum over a TOTAL order — the scalable form of
    * `sum(x) OVER (ORDER BY …)`, whose global window is the same
    * single-partition funnel as global row_number. Same recipe:
    * range-repartition + sort + materialize once, then TWO bounded
    * passes — per-partition totals (one row per partition to the
    * driver, broadcast back as offsets) and an offset-shifted local
    * prefix scan. The summed column must be LongType (the engine's
    * exact-integer verdict rule) and the order total for determinism.
    */
  def withRunningTotal(df: DataFrame, orderCols: Seq[Column], valueCol: String,
                      outCol: String = "running_total",
                      numPartitions: Int = 0): DataFrame = {
    val ranged =
      if (numPartitions > 0) df.repartitionByRange(numPartitions, orderCols: _*)
      else df.repartitionByRange(orderCols: _*)
    val sorted = graft.util.Materialize.once(
      ranged.sortWithinPartitions(orderCols: _*))
    val valIdx = sorted.schema.fieldIndex(valueCol)
    require(sorted.schema(valIdx).dataType == LongType,
      s"withRunningTotal requires LongType $valueCol")
    val partSums = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L; it.foreach(r => s = Math.addExact(s, r.getLong(valIdx)))
      Iterator((pid, s))
    }.collect().toMap
    val offsets = (0 until sorted.rdd.getNumPartitions)
      .scanLeft(0L)((acc, pid) => Math.addExact(acc, partSums.getOrElse(pid, 0L)))
    val schema = sorted.schema.add(outCol, LongType, nullable = false)
    val withTotals = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var run = offsets(pid)
      it.map { r =>
        run = Math.addExact(run, r.getLong(valIdx))
        Row.fromSeq(r.toSeq :+ run)
      }
    }
    sorted.sparkSession.createDataFrame(withTotals, schema)
  }

  /** Running (prefix) MAX over a TOTAL order — same two-pass recipe as
    * [[withRunningTotal]] (per-partition maxes to the driver, prefix-
    * combined offsets broadcast back, offset-seeded local scans), for
    * `max(x) OVER (ORDER BY …)` shapes that must not funnel through
    * one task. `inclusive = false` gives the EXCLUSIVE prefix (max of
    * strictly preceding rows; NULL when none exist — the dominance
    * test of [[Skyline]]). NULL values are skipped, matching SQL MAX.
    */
  def withRunningMax(df: DataFrame, orderCols: Seq[Column], valueCol: String,
                     outCol: String = "running_max",
                     numPartitions: Int = 0,
                     inclusive: Boolean = true): DataFrame = {
    val ranged =
      if (numPartitions > 0) df.repartitionByRange(numPartitions, orderCols: _*)
      else df.repartitionByRange(orderCols: _*)
    val sorted = graft.util.Materialize.once(
      ranged.sortWithinPartitions(orderCols: _*))
    val valIdx = sorted.schema.fieldIndex(valueCol)
    require(sorted.schema(valIdx).dataType == LongType,
      s"withRunningMax requires LongType $valueCol")
    val partMaxes = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var m = Option.empty[Long]
      it.foreach { r =>
        if (!r.isNullAt(valIdx))
          m = Some(m.fold(r.getLong(valIdx))(math.max(_, r.getLong(valIdx))))
      }
      Iterator((pid, m))
    }.collect().toMap
    val offsets: IndexedSeq[Option[Long]] =
      (0 until sorted.rdd.getNumPartitions).scanLeft(Option.empty[Long]) { (acc, pid) =>
        (acc.toSeq ++ partMaxes.getOrElse(pid, None).toSeq)
          .reduceOption((a: Long, b: Long) => math.max(a, b))
      }.toIndexedSeq
    val schema = sorted.schema.add(outCol, LongType, nullable = true)
    val withMaxes = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var run = offsets(pid)
      it.map { r =>
        val pre = run
        if (!r.isNullAt(valIdx))
          run = Some(run.fold(r.getLong(valIdx))(math.max(_, r.getLong(valIdx))))
        Row.fromSeq(r.toSeq :+ (if (inclusive) run.orNull else pre.orNull))
      }
    }
    sorted.sparkSession.createDataFrame(withMaxes, schema)
  }
}
