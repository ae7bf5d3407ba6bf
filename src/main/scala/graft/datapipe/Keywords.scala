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
    // tf feeds both the df rollup and the final join — materialize so
    // the corpus is scanned and aggregated once, not twice.
    val tf = graft.util.Materialize.once(
      words.groupBy(col("doc"), col("term")).agg(count(lit(1)).as("tf")))
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

  /** Corpus-level collocations: bigrams ranked by lift —
    * `count(ab) · total_unigrams / (count(a) · count(b))`, the log-free
    * PMI surrogate (same monotonicity, one IEEE division — engine-
    * exact like `topTfIdf`'s idf). `minCount` drops noise bigrams
    * before the join, so the scored set stays vocabulary²-bounded in
    * theory but minCount-pruned in practice. Output: top `k` by lift.
    */
  def collocations(docs: DataFrame, textCol: String, k: Int, minCount: Long = 5L): DataFrame = {
    // The unigram table feeds both word joins and the total — without
    // materialization the corpus would be re-aggregated three times.
    val uni = graft.util.Materialize.once(
      docs.select(explode(TextAnalysis.words(col(textCol))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c")))
    val total = uni.agg(sum(col("c")).as("n_uni"))
    val bi = docs.select(explode(TextAnalysis.shingles(col(textCol), 2)).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
      // A <2-word doc collapses to a whole-doc "bigram" that may not
      // have exactly two words; a real bigram splits into exactly 2.
      .withColumn("__parts", split(col("bigram"), " "))
      .filter(size(col("__parts")) === 2)
      .select(col("bigram"), element_at(col("__parts"), 1).as("wa"),
        element_at(col("__parts"), 2).as("wb"), col("c_ab"))
    bi.join(Joins.broadcastIfSmall(uni.select(col("w").as("wa"), col("c").as("c_a"))), Seq("wa"))
      .join(Joins.broadcastIfSmall(uni.select(col("w").as("wb"), col("c").as("c_b"))), Seq("wb"))
      .join(broadcast(total))
      .withColumn("lift",
        (col("c_ab").cast("double") * col("n_uni").cast("double"))
          / (col("c_a").cast("double") * col("c_b").cast("double")))
      .orderBy(col("lift").desc, col("bigram"))
      .limit(k)
      .select(col("bigram"), col("c_ab"), col("c_a"), col("c_b"), col("lift"))
  }
}
