package graft.datapipe

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphRankSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val S = 1000000000000L

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)], iters: Int = 10) =
    GraphRank.pageRank(nodes.toDF("v"), "v", edges.toDF("s", "d"), "s", "d", iters)
      .orderBy("node").as[(Long, Long)].collect().toSeq

  test("a 2-cycle stays symmetric and conserves mass up to floor loss") {
    val out = run(Seq(0L, 1L), Seq((0L, 1L), (1L, 0L)))
    assert(out.map(_._2).distinct.size == 1, s"symmetric graph must rank equally: $out")
    val total = out.map(_._2).sum
    assert(total <= S && total > (S * 95) / 100, s"mass off grid: $total")
  }

  test("the hub of a star out-ranks the leaves, which out-rank nothing-pointed-at nodes") {
    // 1..4 all point at 0; 0 points at 1; 5 is isolated (teleport
    // only). The 0<->1 cycle oscillates with period 2 and contracts
    // at 0.7225 per round, so rank order needs the fixed point, not an
    // early phase: run enough iterations to be within one grid unit.
    val out = run(Seq(0L, 1L, 2L, 3L, 4L, 5L),
      Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L), (0L, 1L)), iters = 40).toMap
    assert(out(0L) > out(1L), "hub must out-rank its one in-link leaf")
    assert(out(1L) > out(2L), "a leaf with an in-link out-ranks teleport-only")
    assert(Seq(2L, 3L, 4L).map(out).distinct.size == 1, "equivalent leaves rank equally")
    assert(out(5L) == out(2L), "no in-links means teleport mass, wherever you sit")
  }

  test("scores are partitioning-invariant (exact integer grid, no IEEE accumulation)") {
    val nodes = (0L until 64L).toSeq
    val edges = nodes.flatMap(i => Seq((i, (i * 7 + 3) % 64), (i, (i * 5 + 11) % 64)))
    val a = run(nodes, edges)
    val b = GraphRank.pageRank(
        nodes.toDF("v").repartition(13), "v",
        edges.toDF("s", "d").repartition(7), "s", "d", 10)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(a == b)
  }
}
