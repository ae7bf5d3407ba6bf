package graft.datapipe

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic negative sampling — building the (anchor, negative)
  * pairs of a contrastive-training set (embedding models, rerankers)
  * at corpus scale.
  *
  * Draws are WITH replacement from the md5 hash stream
  * `h(salt|anchor|j) mod N` (the engine's portable-randomness rule:
  * any engine replays the same picks), then candidates that would
  * poison training are excluded — the anchor itself and any EXACT
  * duplicate of it (same text fingerprint) — and the first `k`
  * surviving draws win, in draw order. Oversampling covers the
  * exclusions; with dup rates far under 50% the miss probability is
  * negligible and verifiable (a short anchor row count is visible).
  *
  * Scale shape: one broadcast 1-row count, a narrow k·oversample
  * explode, and ONE id-keyed equi-join against the corpus — no random
  * shuffles, no per-anchor corpus scan. Requires dense ids 0..N-1
  * (the usual layout after [[graft.ops.GlobalIndex]]).
  */
object NegativeSampling {

  def sample(docs: DataFrame, idCol: String, textCol: String,
             k: Int, salt: String, oversample: Int = 2): DataFrame = {
    val n = docs.agg(count(lit(1)).as("__n"))
    val anchors = docs.select(col(idCol).as("anchor"), md5(col(textCol)).as("a_fp"))
    val corpus = docs.select(col(idCol).as("neg_id"), md5(col(textCol)).as("n_fp"))
    val cands = anchors.crossJoin(broadcast(n))
      .select(col("anchor"), col("a_fp"), col("__n"),
        explode(sequence(lit(0), lit(k * oversample - 1))).as("j"))
      .withColumn("cand",
        conv(substring(md5(concat_ws("|", lit(salt), col("anchor"), col("j"))), 1, 8), 16, 10)
          .cast("bigint") % col("__n"))
    cands.join(corpus, col("cand") === col("neg_id"))
      .filter(col("neg_id") =!= col("anchor") && col("n_fp") =!= col("a_fp"))
      .withColumn("neg_rank", row_number().over(
        Window.partitionBy(col("anchor")).orderBy(col("j"))))
      .filter(col("neg_rank") <= k)
      .select(col("anchor"), col("neg_rank"), col("j"), col("neg_id"))
  }
}
