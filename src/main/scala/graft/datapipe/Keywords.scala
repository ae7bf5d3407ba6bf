package graft.datapipe

import graft.ops.Joins
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-document TF-IDF keyword extraction — the corpus-analysis op
  * behind topic tagging and quality triage of a training corpus.
  *
  * Scoring uses the log-free idf surrogate `(N + 1) / (df + 1)`
  * (monotone in the classic log-idf): a single IEEE division keeps
  * the score bit-reproducible on any engine, where `ln` differs in
  * the last ulp across libm implementations and would break
  * value-level oracles. Document ranking within a fixed term set is
  * identical; cross-term trade-offs weight rarity linearly instead of
  * logarithmically — acceptable for keyword extraction, documented
  * for anything downstream that assumes BM25-ish damping.
  *
  * Shape at scale: one (doc, term) aggregation, a vocabulary-sized
  * document-frequency table (evidence-gated broadcast — vocabularies
  * are sublinear in corpus size but not provably bounded), and one
  * per-doc window for the top-k. No collect, no cartesian.
  */
object Keywords {

  /** Top-`k` terms per document: (doc, rank, term, tf, df, score).
    * Ties break by term for full determinism; documents with no words
    * produce no rows.
    */
  def topTfIdf(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val words = docs.select(col(idCol).as("doc"),
      explode(TextAnalysis.words(col(textCol))).as("term"))
    val tf = words.groupBy(col("doc"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.select(count(lit(1)).as("n_docs"))
    val scored = tf
      .join(Joins.broadcastIfSmall(df), Seq("term"))
      .join(broadcast(n))
      .withColumn("score",
        col("tf").cast("double") * ((col("n_docs").cast("double") + lit(1.0))
          / (col("df").cast("double") + lit(1.0))))
    val w = Window.partitionBy(col("doc")).orderBy(col("score").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc"), col("rank"), col("term"), col("tf"), col("df"), col("score"))
  }
}
