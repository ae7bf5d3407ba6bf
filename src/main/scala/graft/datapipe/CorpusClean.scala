package graft.datapipe

import graft.ops.ColumnOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The flagship training-data preparation composition: language gate →
  * quality gate → exact dedup → MinHash near-dup removal. This is the
  * pipeline a pretraining-data team runs over a crawled corpus; every
  * stage is one of the engine's primitives, so the whole thing stays
  * three shuffles (fingerprint group, token group, band self-join) —
  * nothing quadratic, nothing collected.
  *
  * Two near-dup survivor rules:
  *  - [[clean]] — greedy: for each verified pair (a < b) drop b. One
  *    pass, no iteration; transitive chains keep their lowest-id
  *    member per EDGE, not per component.
  *  - [[cleanCC]] — connected components: the standard
  *    pretraining-pipeline rule. Each component of the verified-pair
  *    graph keeps exactly its minimum id ([[ConnectedComponents]],
  *    bounded-iteration label propagation with path halving).
  */
object CorpusClean {

  /** Shared front half: language gate → quality gate → exact dedup.
    * Materialized: the near-dup stage consumes it twice (band table +
    * verify sizes) and the final anti-join a third time — without
    * this, the lang/quality scoring and fingerprint window re-run per
    * consumer. The blocks spill to disk at scale (MEMORY_AND_DISK);
    * 3× recompute of per-token work costs more than the storage.
    */
  private def gatedExactKept(docs: DataFrame, idCol: String, textCol: String,
                             minQuality: Double): DataFrame = {
    val scored = docs
      .withColumn("lang_detected", TextAnalysis.langId(col(textCol)))
      .withColumn("quality", TextAnalysis.qualityScore(col(textCol)))
    val gated = scored
      .filter(col("lang_detected") =!= "und")
      .filter(col("quality") >= minQuality)
    graft.util.Materialize.once(ColumnOps.dedupKeepFirst(
      gated.withColumn("__fp", TextAnalysis.fingerprint(col(textCol))),
      keys = Seq("__fp"), order = Seq(col(idCol)))
      .drop("__fp"))
  }

  def clean(docs: DataFrame, idCol: String, textCol: String,
            minQuality: Double, minJaccard: Double, portableHash: Boolean = false,
            maxBucket: Int = 100): DataFrame = {
    val exactKept = gatedExactKept(docs, idCol, textCol, minQuality)
    // Near-dup removal: greedy drop of the higher id of each verified
    // pair; oversized buckets collapse to their minimum directly.
    val drop = Dedup.minhashDropSet(exactKept, idCol, textCol, minJaccard,
      maxBucket = maxBucket, portable = portableHash)
      .withColumnRenamed("doc", idCol)
    exactKept.join(drop, Seq(idCol), "left_anti")
  }

  /** Transitive-closure variant: drop every non-minimum member of each
    * connected component of the verified near-dup graph (chain a–b–c
    * keeps only a, even when a and c are not themselves a verified
    * pair). Oversized buckets still collapse to their minimum directly.
    */
  def cleanCC(docs: DataFrame, idCol: String, textCol: String,
              minQuality: Double, minJaccard: Double, portableHash: Boolean = false,
              maxBucket: Int = 100, maxIters: Int = 50): DataFrame = {
    val exactKept = gatedExactKept(docs, idCol, textCol, minQuality)
    val (edges, bigDrops) = Dedup.minhashVerifiedEdges(exactKept, idCol, textCol,
      minJaccard, maxBucket, portable = portableHash)
    val ccDrops = ConnectedComponents.components(edges, maxIters)
      .filter(col("node") =!= col("component"))
      .select(col("node").as("doc"))
    val drop = ccDrops.unionByName(bigDrops).distinct().withColumnRenamed("doc", idCol)
    exactKept.join(drop, Seq(idCol), "left_anti")
  }
}
