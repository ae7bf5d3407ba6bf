package graft.datapipe

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-fusion for hybrid retrieval — combining a lexical ranking
  * (BM25) with a vector ranking (ANN cosine) is the standard shape for
  * RAG corpus curation and contamination forensics, and neither list
  * alone is a good final answer.
  *
  * Uses Reciprocal Rank Fusion (Cormack et al., SIGIR 2009): each
  * system contributes `1 / (kConst + rank)` for every (query, doc) it
  * ranked; documents surfaced by several systems accumulate. RRF needs
  * no score calibration between systems — only ranks — which is what
  * makes it robust when the input scores live on unrelated scales
  * (BM25 quantized longs vs cosine doubles).
  */
object Retrieval {

  /** Fuse `rankings` (each with columns `q_id`, `doc`, `rank`; rank
    * 1-based) into a top-`k`-per-query result
    * (q_id, rank, doc, score, n_systems).
    *
    * Bit-reproducibility: the contribution is `floor(1e9 / (kConst +
    * rank))` — one IEEE division of exactly-representable doubles, so
    * every engine computes the identical long. The fused score is then
    * an integer SUM — order-independent across partitionings — making
    * the result exactly hashable by a value-level oracle (same
    * quantize-then-sum discipline as `Keywords.bm25TopK`).
    *
    * Shape at scale: no new corpus-sized work — inputs are already
    * top-k rankings, so the union holds at most Σ systems·k rows per
    * query; one groupBy on (q_id, doc) and a per-query window. The
    * expensive parts (the rankings) stay in their own operators where
    * their scale contracts live.
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, kConst: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    val contribs = rankings.map(_.select(col("q_id"), col("doc"),
      floor(lit(1000000000.0) / (lit(kConst.toDouble) + col("rank").cast("double"))).as("c")))
    val fused = contribs.reduce(_ unionByName _)
      .groupBy(col("q_id"), col("doc"))
      .agg(sum(col("c")).as("score"), count(lit(1)).as("n_systems"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("doc"))
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("doc"), col("score"), col("n_systems"))
  }
}
