package graft.datapipe

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph centrality for corpus curation — the ranking signal
  * behind "keep the well-linked pages" in web-scale pretraining
  * pipelines (CommonCrawl-derived corpora weight documents by
  * host-graph centrality; PageRank is Brin & Page 1998).
  *
  * Integer-quantized PageRank: scores live on a `scale`-denominated
  * long grid, damping is the rational 85/100, and every step is long
  * multiply + floor division + long SUM — no IEEE accumulation
  * anywhere, so any engine (and any partitioning) computes the
  * identical score vector, which is what lets a value-level oracle
  * hash-compare a 10-iteration fixed point. Floor loss per node per
  * iteration is < 1 grid unit — at scale = 1e12 that is noise far
  * below ranking granularity.
  *
  * Shape at scale: the standard message-passing iteration — join
  * scores to edges on src, floor-divide by out-degree, sum by dst,
  * add teleport — each iteration one join + one aggregation on the
  * node key. Scores exit each iteration hash-partitioned by node, so
  * the next join reuses that partitioning; the EDGE side is the one
  * to pin: persist it partitioned/bucketed by src (sink/Bucketing)
  * and every iteration's join is exchange-free on the big side.
  * Bounded iterations (the fixed point is a ranking, not an exact
  * eigenvector), no collect, no per-node driver state.
  */
object GraphRank {

  /** `iters` rounds of damped message passing over `edges`
    * (multigraph: parallel edges each carry a message). Nodes without
    * in-links converge to the teleport mass; dangling SOURCES simply
    * emit nothing (their mass evaporates rather than redistributing —
    * documented, mirrored by the oracle). Returns (node, r).
    */
  def pageRank(nodes: DataFrame, nodeCol: String,
               edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    require(scale >= 1000000L && scale <= 10000000000000L,
      s"scale must keep r*85 inside a long with headroom, got $scale")
    val n = nodes.agg(count(lit(1)).as("__n"))
    val deg = edges.groupBy(col(srcCol).as("node")).agg(count(lit(1)).as("__deg"))
    val base = nodes.select(col(nodeCol).as("node")).crossJoin(broadcast(n))
    var scores = base.select(col("node"), expr(s"$scale div __n").as("r"))
    for (_ <- 1 to iters) {
      val contrib = scores
        .join(edges.select(col(srcCol).as("node"), col(dstCol).as("__dst")), Seq("node"))
        .join(deg, Seq("node"))
        .select(col("__dst").as("node"), expr("(r * 85) div (100 * __deg)").as("__c"))
      val sums = contrib.groupBy(col("node")).agg(sum(col("__c")).as("__s"))
      scores = base.join(sums, Seq("node"), "left")
        .select(col("node"),
          (expr(s"(15 * $scale) div (100 * __n)") + coalesce(col("__s"), lit(0L))).as("r"))
    }
    scores
  }
}
