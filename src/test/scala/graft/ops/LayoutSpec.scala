package graft.ops

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  /** Reference Morton code, written the boring way. */
  private def morton(xs: Seq[Long], bits: Int): Long = {
    var z = 0L
    for (i <- 0 until bits; (x, j) <- xs.zipWithIndex)
      z |= ((x >> i) & 1L) << (i * xs.size + j)
    z
  }

  test("zValue matches the reference interleave for 2 and 3 dimensions") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong, rnd.nextInt(16).toLong))
    val df = rows.toDF("x", "y", "w")
    val got2 = df.select(Layout.zValue(Seq($"x", $"y"), 10).as("z")).as[Long].collect()
    assert(got2.toSeq == rows.map(r => morton(Seq(r._1, r._2), 10)))
    val got3 = df.select(Layout.zValue(Seq($"x", $"y", $"w"), 4).as("z")).as[Long].collect()
    assert(got3.toSeq == rows.map(r => morton(Seq(r._1 & 15, r._2 & 15, r._3), 4)))
  }

  test("clusterByZ partitions cover small boxes in EVERY dimension") {
    // One point per cell of a 32x32 grid; 16 range partitions of the
    // z-curve should each cover a compact box (~8x8 when aligned),
    // never a full-width stripe the way a single-column sort would.
    val grid = (for (x <- 0 until 32; y <- 0 until 32) yield (x.toLong, y.toLong)).toDF("x", "y")
    val clustered = Layout.clusterByZ(grid.repartition(8), Seq($"x", $"y"), bits = 5, numPartitions = 16)
    val spans = clustered
      .mapPartitions { it =>
        val pts = it.map(r => (r.getLong(0), r.getLong(1))).toSeq
        if (pts.isEmpty) Iterator.empty
        else Iterator((pts.map(_._1).max - pts.map(_._1).min,
                       pts.map(_._2).max - pts.map(_._2).min))
      }.collect()
    assert(spans.nonEmpty)
    for ((sx, sy) <- spans) {
      assert(sx <= 16, s"x-span $sx is a stripe, not a box")
      assert(sy <= 16, s"y-span $sy is a stripe, not a box")
    }
    // A single-column sort CANNOT do this: sorting by x alone makes
    // every partition span the full y range.
    val sortedByX = grid.repartitionByRange(16, $"x")
    val ySpans = sortedByX.mapPartitions { it =>
      val ys = it.map(_.getLong(1)).toSeq
      if (ys.isEmpty) Iterator.empty else Iterator(ys.max - ys.min)
    }.collect()
    assert(ySpans.forall(_ == 31), "baseline: x-sort leaves y unclustered")
  }

  test("zValue rejects shapes that cannot interleave into a long") {
    intercept[IllegalArgumentException] { Layout.zValue(Seq($"x"), 10) }
    intercept[IllegalArgumentException] { Layout.zValue(Seq($"x", $"y"), 32) }
    intercept[IllegalArgumentException] { Layout.zValue(Seq($"x", $"y"), 0) }
  }
}
