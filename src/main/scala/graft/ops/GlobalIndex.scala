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
}
