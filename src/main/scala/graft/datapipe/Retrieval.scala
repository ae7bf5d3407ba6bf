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

  /** Exact phrase search via a positional inverted index — the
    * retrieval primitive BM25's bag-of-words scoring cannot express
    * (and the standard forensic tool for "which documents contain this
    * exact sentence"). A doc matches a phrase at `start` iff every
    * phrase term j appears at doc position start + j: each posting
    * joins the (broadcast) phrase-term list on the term, candidates
    * group on the implied start, and a group reaching |phrase| rows is
    * a conjunctive full match. Per group each j can appear only once
    * (its position is determined by start + j), so the count test is
    * exact even when the phrase repeats a term.
    *
    * Shape at scale: one postings explode of the corpus (linear),
    * joined against a broadcast phrase-term table — the corpus is
    * never self-joined, and only positions whose TERM matches some
    * phrase term survive the join, so candidate volume is governed by
    * the phrases' document frequency exactly like the BM25 candidate
    * join. Returns (p_id, doc, n_hits) with n_hits the number of
    * distinct match starts (overlapping matches each count).
    */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
                   phrases: DataFrame, pIdCol: String, phraseCol: String): DataFrame = {
    val post = docs.select(col(idCol).as("doc"),
      posexplode(TextAnalysis.words(col(textCol))).as(Seq("pos", "term")))
    val pterms = phrases
      .select(col(pIdCol).as("p_id"), TextAnalysis.words(col(phraseCol)).as("pws"))
      .filter(size(col("pws")) > 0)
      .select(col("p_id"), size(col("pws")).as("plen"),
        posexplode(col("pws")).as(Seq("j", "pterm")))
    post.join(broadcast(pterms), col("term") === col("pterm"))
      .select(col("p_id"), col("doc"), (col("pos") - col("j")).as("start"), col("plen"))
      .filter(col("start") >= 0)
      .groupBy(col("p_id"), col("doc"), col("start"), col("plen"))
      .agg(count(lit(1)).as("n_terms"))
      .filter(col("n_terms") === col("plen"))
      .groupBy(col("p_id"), col("doc")).agg(count(lit(1)).as("n_hits"))
  }
}
