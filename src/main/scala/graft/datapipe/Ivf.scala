package graft.datapipe

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN — the scale path beyond hyperplane LSH:
  * k-means-style coarse quantizer partitions the corpus into `k`
  * cells; a query scores only the `nprobe` nearest cells. At 100 TB
  * the corpus is written partitioned by cell, so a probe is partition
  * pruning + a small scan, not a full pass.
  *
  * Training is Lloyd iterations expressed relationally: assignment is
  * a broadcast-centroid argmin (min_by), update is an element-wise
  * average via posexplode + groupBy(cell, dim). Deterministic: init
  * takes the first k vectors by id, ties in argmin break on cell id.
  */
object Ivf {

  private def asD(c: org.apache.spark.sql.Column) = Similarity.asDouble(c)

  /** Train centroids: (cell, centroid: array<double>). */
  def train(corpus: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int = 2): DataFrame = {
    val vecs = corpus.select(col(idCol).as("id"), asD(col(vecCol)).as("vec"))
    // partitionBy(lit(0)): the window input is limit(k) rows — bounded
    // by construction — and the explicit constant partition key records
    // that in the plan (and silences WindowExec's unbounded-input
    // warning in bench logs).
    var centroids = vecs.orderBy(col("id")).limit(k)
      .withColumn("cell", row_number().over(Window.partitionBy(lit(0)).orderBy(col("id"))) - 1)
      .select(col("cell"), col("vec").as("centroid"))
    for (_ <- 1 to iters) {
      val assigned = assign(vecs, centroids)
      // Materialize the k-row centroid table each iteration — the
      // standard iterative-algorithm checkpoint: otherwise iteration
      // i's plan nests every previous iteration's, and both analysis
      // time and the broadcast subtree grow with iters.
      centroids = graft.util.Materialize.once(assigned
        .select(col("cell"), posexplode(col("vec")).as(Seq("dim", "x")))
        .groupBy(col("cell"), col("dim")).agg(avg(col("x")).as("m"))
        .groupBy(col("cell"))
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))), s => s.getField("m")).as("centroid")))
    }
    centroids
  }

  /** Assign each vector to its nearest centroid (broadcast argmin). */
  def assign(vecs: DataFrame, centroids: DataFrame): DataFrame = {
    val scored = vecs.crossJoin(broadcast(centroids))
      .withColumn("cos", Similarity.cosine(col("vec"), col("centroid")))
    scored.groupBy(col("id"), col("vec"))
      .agg(max_by(col("cell"), struct(col("cos"), -col("cell"))).as("cell"))
  }

  /** The 100-TB layout: the corpus written partitioned by cell, so a
    * probe is PARTITION PRUNING + a small scan instead of a full pass.
    */
  def writeCellPartitioned(corpus: DataFrame, centroids: DataFrame,
                           idCol: String, vecCol: String, path: String): Unit = {
    val vecs = corpus.select(col(idCol).as("id"), asD(col(vecCol)).as("vec"))
    assign(vecs, centroids).write.partitionBy("cell").mode("overwrite").parquet(path)
  }

  /** Incremental index maintenance: assign a NEW batch against the
    * FIXED centroids and append it into the cell-partitioned layout —
    * per-batch cost follows the batch, never the corpus, and the
    * layout after ANY sequence of ingests is row-identical to a full
    * rebuild with the same centroids (assignment is a pure function
    * of (vector, centroids); spec-proven). Probes pick the additions
    * up immediately: partition pruning works on directory values, not
    * file age. Centroid drift is a retrain + full re-layout decision,
    * deliberately out of band (standard IVF practice); the small
    * files each ingest appends are `Sinks.compactPartitions`
    * maintenance.
    */
  def ingestBatch(batch: DataFrame, centroids: DataFrame,
                  idCol: String, vecCol: String, path: String): Unit = {
    val vecs = batch.select(col(idCol).as("id"), asD(col(vecCol)).as("vec"))
    assign(vecs, centroids).write.partitionBy("cell").mode("append").parquet(path)
  }

  /** ANN top-k against a cell-partitioned corpus: the probed cell set
    * (≤ k centroids, a genuinely driver-sized list) becomes an isin
    * filter that prunes the scan to the probed partitions only.
    */
  def topKPruned(spark: SparkSession, queries: DataFrame, corpusPath: String,
                 centroids: DataFrame, idCol: String, vecCol: String,
                 k: Int, nprobe: Int = 2): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), asD(col(vecCol)).as("q_vec"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("cos", Similarity.cosine(col("q_vec"), col("centroid")))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("cell"))))
      .filter(col("__rn") <= nprobe)
      .select(col("q_id"), col("q_vec"), col("cell"))
    // Bounded by the number of centroids, not the corpus — safe collect.
    val cells = probes.select(col("cell")).distinct().collect().map(_.get(0))
    val corpus = spark.read.parquet(corpusPath)
      .filter(col("cell").isin(cells.toIndexedSeq: _*))
      .select(col("id").as("n_id"), col("vec").as("n_vec"), col("cell"))
    val scored = probes.join(corpus, Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cosine", Similarity.cosine(col("q_vec"), col("n_vec")))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("n_id"))))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("cosine"), col("rank"))
  }

  /** ANN top-k: probe the `nprobe` nearest cells per query, exact
    * cosine within the probed cells.
    */
  def topK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
           idCol: String, vecCol: String, k: Int, nprobe: Int = 2): DataFrame = {
    val vecs = corpus.select(col(idCol).as("id"), asD(col(vecCol)).as("vec"))
    val assigned = assign(vecs, centroids)
      .select(col("id").as("n_id"), col("vec").as("n_vec"), col("cell"))
    val q = queries.select(col(idCol).as("q_id"), asD(col(vecCol)).as("q_vec"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("cos", Similarity.cosine(col("q_vec"), col("centroid")))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("cell"))))
      .filter(col("__rn") <= nprobe)
      .select(col("q_id"), col("q_vec"), col("cell"))
    val scored = probes.join(assigned, Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("cosine", Similarity.cosine(col("q_vec"), col("n_vec")))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("n_id"))))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("cosine"), col("rank"))
  }
}
