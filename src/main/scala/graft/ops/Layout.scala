package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — multi-dimensional clustering
  * for scan pruning.
  *
  * A table range-sorted on one column prunes parquet row groups only
  * for predicates on that column; a second dimension scans everything.
  * Interleaving the bits of k quantized dimensions into one z-value
  * and range-clustering on IT gives every dimension locality at once:
  * each output file/row-group covers a small axis-aligned box of the
  * key space, so its parquet min/max stats reject predicates on ANY
  * of the z-ordered columns. At 100 TB this is the difference between
  * "point query on (merchant, day) reads one file" and "reads the
  * table" — the same mechanism behind Delta's OPTIMIZE ZORDER BY,
  * built here from plain Catalyst integer expressions (codegen'd,
  * whole-stage friendly).
  *
  * The inputs to [[zValue]] must already be quantized to non-negative
  * ints below 2^bits — layout keys are buckets (a hash, a percentile
  * bin, days-since-epoch), not raw values; quantization is the
  * caller's statement of how fine the pruning grid is.
  */
object Layout {

  /** The Morton code of `cols`: bit i of column j lands at position
    * `i * k + j`. Pure long arithmetic (shift/and/or as disjoint-bit
    * addition), exactly reproducible on any engine.
    */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    val k = cols.size
    require(k >= 2, "z-ordering one column is just sorting it")
    require(bits >= 1 && bits * k <= 63, s"bits*cols must fit a long, got $bits*$k")
    val terms = for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * k + j)
    terms.reduce(_ + _) // bit positions are disjoint: + is OR, and stays associative for codegen
  }

  /** Cluster `df` by the z-value of `cols` into `numPartitions`
    * range partitions, sorted within each — the write-side layout
    * step. Each output partition covers a compact z-range, i.e. a
    * small box in every dimension, which is exactly what parquet
    * min/max pruning needs. One range shuffle, scale-invariant.
    */
  def clusterByZ(df: DataFrame, cols: Seq[Column], bits: Int,
                 numPartitions: Int): DataFrame = {
    val z = zValue(cols, bits)
    df.withColumn("__z", z)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
