package graft.datapipe

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
  * web-scale through semantic deduplication"): cluster the embedding
  * space with a coarse k-means, then deduplicate WITHIN each cluster
  * by cosine similarity — semantically-redundant documents whose
  * text-level fingerprints never collide (paraphrases, translations,
  * re-renderings) land in the same cell and get merged there. The
  * clustering is what makes the quadratic cosine check tractable: at
  * 100 TB the corpus never self-joins globally, only cell-by-cell,
  * and `maxCell` bounds the worst cell exactly like the LSH-family
  * caps ([[Similarity.cosineDedupPairs]]).
  *
  * Composition, not new machinery: cells come from [[Ivf.train]] /
  * [[Ivf.assign]] (the same coarse quantizer the ANN path uses — one
  * clustering can serve both), pair verification is the codegen'd
  * cosine kernel. Keep rule is the repo's greedy convention: a doc is
  * dropped iff it cosine-pairs with a smaller-id doc in its cell;
  * survivors are the ids that never appear on the dropped side.
  */
object SemDedup {

  /** Intra-cell cosine-verified pairs (doc_a < doc_b, cosine ≥
    * `minCosine`). Cells up to `maxCell` emit all candidate pairs;
    * an oversized cell emits only the star against its minimum id —
    * linear, not quadratic, in the hot cell, still cosine-verified,
    * so the cap can under-merge but never emits a false pair. The
    * self-join runs on the slim (doc, cell) projection; vectors join
    * back only for verification.
    *
    * The DEFAULT is star-capped (`maxCell = 256`: worst-cell pair
    * term ≤ 256²/2 ≈ 33k, linear beyond) — on a duplicate-heavy
    * corpus the uncapped within-cell term is quadratic, the one
    * scale-killer class this engine bans by default. Pass
    * `maxCell = Int.MaxValue` explicitly to opt into the exhaustive
    * worst-case form.
    */
  def pairs(corpus: DataFrame, idCol: String, vecCol: String, centroids: DataFrame,
            minCosine: Double, maxCell: Int = 256): DataFrame = {
    val vecs = corpus.select(col(idCol).as("doc"), Similarity.asDouble(col(vecCol)).as("vec"))
    // Materialized: feeds the sizing aggregate and both join sides —
    // otherwise the broadcast-argmin assignment runs three times.
    val assigned = graft.util.Materialize.once(
      Ivf.assign(vecs.select(col("doc").as("id"), col("vec")), centroids)
        .select(col("id").as("doc"), col("cell")))
    val cand =
      if (maxCell == Int.MaxValue) {
        assigned.as("a").join(assigned.as("b"),
            col("a.cell") === col("b.cell") && col("a.doc") < col("b.doc"))
          .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      } else {
        val sized = assigned.join(
          assigned.groupBy(col("cell"))
            .agg(count(lit(1)).as("__n"), min(col("doc")).as("__keep")),
          Seq("cell"))
        val small = sized.filter(col("__n") <= maxCell).select(col("doc"), col("cell"))
        val allPairs = small.as("a").join(small.as("b"),
            col("a.cell") === col("b.cell") && col("a.doc") < col("b.doc"))
          .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
        val starPairs = sized.filter(col("__n") > maxCell && col("doc") =!= col("__keep"))
          .select(col("__keep").as("doc_a"), col("doc").as("doc_b"))
        allPairs.unionByName(starPairs)
      }
    cand
      .join(vecs.select(col("doc").as("doc_a"), col("vec").as("va")), Seq("doc_a"))
      .join(vecs.select(col("doc").as("doc_b"), col("vec").as("vb")), Seq("doc_b"))
      .withColumn("cosine", Similarity.cosine(col("va"), col("vb")))
      .filter(col("cosine") >= minCosine)
      .select(col("doc_a"), col("doc_b"), col("cosine"))
  }

  /** Survivors with per-survivor drop accounting: (id, n_dropped).
    * Each dropped doc's minimum paired partner may ITSELF be dropped —
    * cosine at the threshold is not transitive (pairs (1,2) and (2,3)
    * without (1,3)) — so attribution follows the min-partner chain to
    * its surviving root. Every hop strictly decreases the id (pairs
    * are doc_a < doc_b), so the chain terminates at a doc with no
    * smaller partner, i.e. a true survivor; pointer doubling resolves
    * it in O(log longest-chain) passes over the DROPS table (never the
    * corpus). `sum(n_dropped)` therefore equals the total number of
    * docs removed. Training is delegated to [[Ivf.train]] on the
    * corpus itself — pass `centroids` via [[pairs]] directly to reuse
    * an existing quantizer.
    */
  def dedupReport(corpus: DataFrame, idCol: String, vecCol: String,
                  k: Int, iters: Int = 2, minCosine: Double = 0.9,
                  maxCell: Int = 256): DataFrame = {
    val centroids = Ivf.train(corpus, idCol, vecCol, k, iters)
    val p = pairs(corpus, idCol, vecCol, centroids, minCosine, maxCell)
    val direct = graft.util.Materialize.once(
      p.groupBy(col("doc_b")).agg(min(col("doc_a")).as("ptr")))
    // Pointer doubling: re-point every chain entry at its pointer's
    // pointer until no pointer is itself a dropped doc. Chain length
    // halves each pass; each pass is one self-join of the drops table.
    var chain = direct
    var unresolved = true
    while (unresolved) {
      val hopped = graft.util.Materialize.once(
        chain.as("c")
          .join(chain.select(col("doc_b").as("ptr"), col("ptr").as("next")).as("n"),
            Seq("ptr"), "left")
          .select(col("doc_b"), coalesce(col("next"), col("ptr")).as("ptr"),
            col("next").isNotNull.as("__moved")))
      unresolved = !hopped.filter(col("__moved")).isEmpty
      chain = hopped.select(col("doc_b"), col("ptr"))
    }
    val dropCounts = chain.groupBy(col("ptr").as("survivor"))
      .agg(count(lit(1)).as("n_dropped"))
    corpus.select(col(idCol).as("id"))
      .join(chain.select(col("doc_b").as("id")), Seq("id"), "left_anti")
      .join(dropCounts.withColumnRenamed("survivor", "id"), Seq("id"), "left")
      .select(col("id"), coalesce(col("n_dropped"), lit(0L)).as("n_dropped"))
  }
}
