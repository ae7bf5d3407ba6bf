package graft.datapipe

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
  * document-frequency table (AQE-planned join — vocabularies are
  * sublinear in corpus size but not provably bounded), and one
  * per-doc window for the top-k. No collect, no cartesian.
  *
  * The multi-consumer postings table (`tf` here and in [[bm25TopK]])
  * is deliberately left as PLAIN LINEAGE, not checkpointed: every
  * consumer's plan contains the identical partial-aggregate Exchange,
  * so Spark's exchange reuse materializes the corpus scan + partial
  * aggregation ONCE (one shuffle write, N reads). An eager
  * `localCheckpoint` would add a synchronous job barrier AND pin a
  * corpus-scaled block copy in executor storage — at 100 TB that is
  * a second corpus resident in the cluster, and executor loss turns
  * fail-stop. Exchange reuse gets scan-once for free from shuffle
  * files that must be written anyway. (Checkpointing remains correct
  * for SIDE-EFFECTING stages — see [[graft.util.Materialize]] — but
  * postings are pure.) Corpus-derived join sides (df tables) carry no
  * static broadcast gate either: a `count()` gate on plain lineage
  * would re-run the corpus aggregation just to measure it; AQE already
  * sees the exact shuffle size at runtime and converts to broadcast
  * when small. The query set is the one static broadcast: it is the
  * ad-hoc side, small by contract (a retrieval call's queries, not a
  * data-scaling table).
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
    // df(term) = docs containing the term = rows per term in the
    // already-distinct (doc, term) postings — a COUNT window over the
    // term partition, not a groupBy-then-self-join. One lineage: the
    // corpus is scanned, exploded, and aggregated exactly once (a df
    // self-join recomputes all three — column pruning gives the df
    // branch a narrower partial aggregate, so exchange reuse can't
    // deduplicate it).
    val withDf = tf.withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
    val n = docs.select(count(lit(1)).as("n_docs"))
    val scored = withDf
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
    // The unigram table feeds the two word joins; both consumers keep
    // the full (w, c) row, so their partial-aggregate exchanges are
    // identical and exchange reuse scans the corpus once for both.
    val uni = docs.select(explode(TextAnalysis.words(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    // The unigram total needs no postings at all: one narrow
    // no-explode corpus pass (sum of per-doc word counts ≡ sum of c).
    val total = docs.agg(
      coalesce(sum(size(TextAnalysis.words(col(textCol))).cast("long")), lit(0L)).as("n_uni"))
    val bi = docs.select(explode(TextAnalysis.shingles(col(textCol), 2)).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
      // A <2-word doc collapses to a whole-doc "bigram" that may not
      // have exactly two words; a real bigram splits into exactly 2.
      .withColumn("__parts", split(col("bigram"), " "))
      .filter(size(col("__parts")) === 2)
      .select(col("bigram"), element_at(col("__parts"), 1).as("wa"),
        element_at(col("__parts"), 2).as("wb"), col("c_ab"))
    bi.join(uni.select(col("w").as("wa"), col("c").as("c_a")), Seq("wa"))
      .join(uni.select(col("w").as("wb"), col("c").as("c_b")), Seq("wb"))
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
    * Shape at scale — the inverted-index discipline, applied BEFORE
    * aggregation: postings are filtered against the (broadcast)
    * query-term set as they are exploded, so the ONLY (doc, term)
    * shuffle that ever happens is candidate-sized — the full-corpus
    * postings shuffle that a materialize-then-filter formulation pays
    * is gone entirely. df(term) then comes from a COUNT window over
    * the candidate postings' term partition (for a query term, every
    * doc containing it survives the filter, so the window count IS the
    * corpus df — no second corpus aggregation, no join). Per-doc
    * length and the corpus totals never need postings at all:
    * `dl = size(words(text))` is a narrow no-shuffle scan and
    * (n_docs, l_total) is one single-row aggregate broadcast to every
    * candidate. Net: one candidate-bounded shuffle plus two narrow
    * corpus scans, no checkpoint barrier, no corpus-sized block copy,
    * no collect; top-k is a per-query window over the already-reduced
    * (query, doc) score table.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: DataFrame, qIdCol: String, qTextCol: String,
               k: Int): DataFrame = {
    val ws = TextAnalysis.words(col(textCol))
    // Corpus totals in one narrow pass — no explode, one row out.
    // (sum ignores the null `size` of a null-text doc, matching the
    // postings formulation where such docs simply contribute none.)
    val stats = docs.agg(count(lit(1)).as("n_docs"),
      coalesce(sum(size(ws).cast("long")), lit(0L)).as("l_total"))
    // Distinct query terms: a repeated word contributes once (the
    // classic set-of-terms BM25; documented, matched by the oracle).
    // The query set is small by contract (the ad-hoc side of a
    // retrieval call), so both its joins broadcast statically.
    val qterms = queries.select(col(qIdCol).as("q_id"),
      explode(array_distinct(TextAnalysis.words(col(qTextCol)))).as("term"))
    val qtermSet = qterms.select(col("term")).distinct()
    // r12 OPT (guide §2.3): the per-doc length rides WITH the postings
    // (resolved by max() in the tf aggregate — dl is functionally
    // determined by doc) instead of a separate corpus scan + join.
    // That drops one full corpus read AND one full re-tokenization
    // pass (the old dl frame re-split every text to size it) plus its
    // broadcast-build job. The token array is bound to a projected
    // attribute first so size() and explode() share ONE words() split
    // (Catalyst does not CSE across the Project/Generate boundary).
    val tokenized = docs.select(col(idCol).as("doc"), ws.as("__ws"))
    val candPostings = tokenized
      .select(col("doc"), size(col("__ws")).cast("long").as("dl"),
        explode(col("__ws")).as("term"))
      .join(broadcast(qtermSet), Seq("term"))
    // One candidate shuffle, shared by the tf aggregate AND the df
    // window: hash partitioning on `term` satisfies the (doc, term)
    // clustered distribution (subset of the group keys), so neither
    // adds its own exchange. Skew bound: a partition holds the
    // postings of its query terms — candidate-sized by construction.
    val tf = candPostings.repartition(col("term"))
      .groupBy(col("doc"), col("term")).agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    val withDf = tf.withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
    val cand = withDf
      .join(broadcast(qterms), Seq("term"))
      .join(broadcast(stats))
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
