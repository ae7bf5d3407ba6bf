package graft.datapipe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`).
  *
  *  - Brute force: broadcast the (small) query set against the
  *    partitioned corpus, per-partition scoring, window top-k. The
  *    corpus is never collected and never self-crossJoined — at 100 TB
  *    this is the classic "broadcast queries, scan corpus once" shape.
  *  - LSH: random-hyperplane signatures (deterministic, seeded via
  *    xxhash64) bucket the corpus; queries probe only their bucket.
  *    Recall trades off with `numPlanes`; verified in tests against
  *    brute force.
  */
object Similarity {

  /** Cast a float vector to double (exact) for deterministic math. */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** In-order dot product — identical sequence of IEEE ops on any
    * engine, so results are bit-reproducible.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** HOF formulation — the reference semantics the custom expression is
    * verified against (bit-identical accumulation order).
    */
  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Hot-path cosine: the codegen'd fused-loop Catalyst expression
    * (graft.functions.CosineSimilarity, mounted by GraftExtensions).
    */
  def cosine(a: Column, b: Column): Column = graft.functions.CosineSimilarity.of(a, b)

  /** Exact top-k cosine neighbors for each query vector. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
                     k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), asDouble(col(vecCol)).as("q_vec"))
    val c = corpus.select(col(idCol).as("n_id"), asDouble(col(vecCol)).as("n_vec"))
    val scored = c.join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("cosine", cosine(col("q_vec"), col("n_vec")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("n_id"))
    scored.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k)
      .select(col("q_id"), col("n_id"), col("cosine"), col("__rn").as("rank"))
  }

  /** Sign-bit signature of a vector under `numPlanes` hyperplanes
    * seeded from `table` (independent plane sets per table).
    * Codegen'd fused kernel (graft.functions.LshSignature): one pass
    * over the vector computes every plane, where the HOF form paid a
    * lambda fold per plane — the per-row hot loop of corpus-scale
    * dedup/ANN. Planes are a deterministic function of (table, plane,
    * dim); no RNG state, same plane set on every executor.
    */
  def lshSignature(vec: Column, numPlanes: Int, table: Int = 0): Column =
    graft.functions.LshSignature.of(vec, numPlanes, table)

  /** (table, bucket) rows for a vector under multi-table LSH — the
    * standard OR-amplification: a candidate pair only needs to collide
    * in ONE table, so recall stays high while each table's buckets stay
    * small.
    */
  def lshBuckets(vec: Column, planesPerTable: Int, tables: Int): Column =
    array((0 until tables).map(t =>
      struct(lit(t).as("table"), lshSignature(vec, planesPerTable, t).as("bucket"))): _*)

  /** LSH ANN: queries probe only corpus vectors sharing a (table,
    * bucket) in at least one table; exact cosine within candidates,
    * top-k per query.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
              k: Int, planesPerTable: Int = 4, tables: Int = 8): DataFrame = {
    def withBuckets(df: DataFrame, id: String, vec: String) =
      df.select(col(idCol).as(id), asDouble(col(vecCol)).as(vec))
        .withColumn("tb", explode(lshBuckets(col(vec), planesPerTable, tables)))
        .select(col(id), col(vec), col("tb.table").as("table"), col("tb.bucket").as("bucket"))
    val q = withBuckets(queries, "q_id", "q_vec")
    val c = withBuckets(corpus, "n_id", "n_vec")
    val cand = c.join(broadcast(q), Seq("table", "bucket"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("q_vec"), col("n_id"), col("n_vec"))
      .dropDuplicates("q_id", "n_id")
    val scored = cand.withColumn("cosine", cosine(col("q_vec"), col("n_vec")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("n_id"))
    scored.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k)
      .select(col("q_id"), col("n_id"), col("cosine"), col("__rn").as("rank"))
  }

  /** Embedding-cosine near-duplicate pairs (the fifth dedup variant):
    * multi-table LSH buckets, cosine ≥ threshold verified inside
    * buckets. High-cosine pairs collide with near-certainty, so few
    * tables suffice for dedup.
    *
    * `maxBucket` bounds the quadratic term exactly like
    * Dedup.minhashPairs: buckets up to the cap emit all candidate
    * pairs; oversized buckets — real embedding corpora cluster hard
    * (template pages, near-empty docs, repeated headers all embed to
    * the same point) — emit only the STAR against the bucket minimum
    * (|bucket|−1 pairs, still cosine-verified), so one hot bucket costs
    * linear, not quadratic, work. Candidate pairs are bounded at
    * buckets × maxBucket² overall. Within an oversized bucket the
    * members collide in EVERY table with the min only if genuinely
    * aligned — the cosine verification still gates each star pair, so
    * the cap can under-merge (documented) but never emits a false pair.
    *
    * The candidate self-join runs on the slim (doc, table, bucket)
    * projection only — vectors join back just for verification, so the
    * wide embedding column never rides through the pair explosion.
    */
  def cosineDedupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                       minCosine: Double, planesPerTable: Int = 6, tables: Int = 4,
                       maxBucket: Int = Int.MaxValue): DataFrame = {
    val vecs = corpus.select(col(idCol).as("doc"), asDouble(col(vecCol)).as("vec"))
    // Materialized: the bucket table feeds the sizing aggregate and
    // both sides of the candidate self-join; unmaterialized, the
    // tables × planes signature kernel (the expensive part) runs thrice.
    val b = graft.util.Materialize.once(
      vecs.withColumn("tb", explode(lshBuckets(col("vec"), planesPerTable, tables)))
        .select(col("doc"), col("tb.table").as("table"), col("tb.bucket").as("bucket")))
    val cand =
      if (maxBucket == Int.MaxValue) {
        b.as("a")
          .join(b.as("b"),
            col("a.table") === col("b.table") && col("a.bucket") === col("b.bucket") &&
              col("a.doc") < col("b.doc"))
          .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b")).distinct()
      } else {
        val sized = b.join(
          b.groupBy(col("table"), col("bucket"))
            .agg(count(lit(1)).as("__n"), min(col("doc")).as("__keep")),
          Seq("table", "bucket"))
        val small = sized.filter(col("__n") <= maxBucket)
          .select(col("doc"), col("table"), col("bucket"))
        val allPairs = small.as("a")
          .join(small.as("b"),
            col("a.table") === col("b.table") && col("a.bucket") === col("b.bucket") &&
              col("a.doc") < col("b.doc"))
          .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
        val starPairs = sized.filter(col("__n") > maxBucket && col("doc") =!= col("__keep"))
          .select(col("__keep").as("doc_a"), col("doc").as("doc_b"))
        // A pair can surface all-pairs in one table and star in another
        // — distinct over the union, not per branch.
        allPairs.unionByName(starPairs).distinct()
      }
    cand
      .join(vecs.select(col("doc").as("doc_a"), col("vec").as("va")), Seq("doc_a"))
      .join(vecs.select(col("doc").as("doc_b"), col("vec").as("vb")), Seq("doc_b"))
      .withColumn("cosine", cosine(col("va"), col("vb")))
      .filter(col("cosine") >= minCosine)
      .select(col("doc_a"), col("doc_b"), col("cosine"))
  }
}
