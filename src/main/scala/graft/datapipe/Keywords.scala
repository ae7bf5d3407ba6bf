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

  /** BM25 top-`k` retrieval: for each query, the `k` best documents
    * under BM25 with k1 = 6/5 and b = 3/4, using the same log-free idf
    * surrogate `(N + 1) / (df + 1)` as `topTfIdf` (reference
    * retrieval-style ranking the reference's corpus tooling lacks —
    * this is a beyond-reference training-data op: "which corpus docs
    * answer this eval question" is the retrieval half of contamination
    * forensics and RAG curation).
    *
    * Bit-reproducibility: with k1 = 6/5, b = 3/4 and avgdl = L/N, the
    * tf-saturation factor reduces to the all-integer rational
    * `22·tf·L / (10·tf·L + 3·L + 9·dl·N)`, so each term's score is ONE
    * IEEE division of two fixed-parenthesization double products —
    * engine-exact, no `ln` (libm-dependent) anywhere. The per-term
    * score is then quantized to `floor(1e6 · score)` longs, making the
    * cross-term SUM an integer sum — order-independent across
    * engines/partitionings — so the final score is exactly hashable by
    * a value-level oracle. Quantization error is bounded by
    * |queryTerms| · 1e-6, irrelevant at ranking granularity.
    *
    * Shape at scale: the corpus is aggregated ONCE into a postings
    * table (doc, term, tf) and never cross-joined — candidates come
    * from an inverted-index join of postings against the (small,
    * evidence-gated broadcast) distinct query-term set, so only docs
    * sharing a term with some query are ever scored. The df and
    * length tables join vocabulary- and doc-keyed; the dl join is the
    * one corpus-keyed shuffle and AQE converts it to broadcast when
    * the candidate slice is small. No collect; top-k is a per-query
    * window over the already-reduced (query, doc) score table.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: DataFrame, qIdCol: String, qTextCol: String,
               k: Int): DataFrame = {
    val words = docs.select(col(idCol).as("doc"),
      explode(TextAnalysis.words(col(textCol))).as("term"))
    // The postings table feeds df, dl, the corpus-length stat, and the
    // candidate join — materialize so the corpus is aggregated once.
    val tf = graft.util.Materialize.once(
      words.groupBy(col("doc"), col("term")).agg(count(lit(1)).as("tf")))
    val dl = tf.groupBy(col("doc")).agg(sum(col("tf")).as("dl"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.select(count(lit(1)).as("n_docs"))
    val l = tf.select(coalesce(sum(col("tf")), lit(0L)).as("l_total"))
    // Distinct query terms: a repeated word contributes once (the
    // classic set-of-terms BM25; documented, matched by the oracle).
    val qterms = queries.select(col(qIdCol).as("q_id"),
      explode(array_distinct(TextAnalysis.words(col(qTextCol)))).as("term"))
    val cand = tf
      .join(Joins.broadcastIfSmall(qterms), Seq("term"))
      .join(Joins.broadcastIfSmall(dfreq), Seq("term"))
      .join(dl, Seq("doc"))
      .join(broadcast(n))
      .join(broadcast(l))
    val nD = col("n_docs").cast("double")
    val lD = col("l_total").cast("double")
    val tfD = col("tf").cast("double")
    val dfD = col("df").cast("double")
    val dlD = col("dl").cast("double")
    // Parenthesization is part of the contract: the DuckDB oracle
    // mirrors it token for token so the IEEE results are identical.
    val num = ((nD + lit(1.0)) * lit(22.0)) * (tfD * lD)
    val den = (dfD + lit(1.0)) *
      (((lit(10.0) * tfD) * lD) + ((lit(3.0) * lD) + ((lit(9.0) * dlD) * nD)))
    val scored = cand
      .withColumn("c", floor((num / den) * lit(1000000.0)))
      .groupBy(col("q_id"), col("doc"))
      .agg(sum(col("c")).as("score"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("doc"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("doc"), col("score"))
  }
}
