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
  * Near-dup removal is the standard greedy survivor rule: for each
  * verified pair (a < b) drop b — not full connected components, which
  * would need an iterative join (documented trade-off; transitive
  * chains keep their lowest-id member per edge, not per component).
  */
object CorpusClean {

  def clean(docs: DataFrame, idCol: String, textCol: String,
            minQuality: Double, minJaccard: Double, portableHash: Boolean = false,
            maxBucket: Int = 100): DataFrame = {
    val scored = docs
      .withColumn("lang_detected", TextAnalysis.langId(col(textCol)))
      .withColumn("quality", TextAnalysis.qualityScore(col(textCol)))
    val gated = scored
      .filter(col("lang_detected") =!= "und")
      .filter(col("quality") >= minQuality)

    // Exact dedup: keep the lowest id per canonical fingerprint.
    // Materialized: the near-dup stage consumes it twice (band table +
    // verify sizes) and the final anti-join a third time — without
    // this, the lang/quality scoring and fingerprint window re-run per
    // consumer. The blocks spill to disk at scale (MEMORY_AND_DISK);
    // 3× recompute of per-token work costs more than the storage.
    val exactKept = graft.util.Materialize.once(ColumnOps.dedupKeepFirst(
      gated.withColumn("__fp", TextAnalysis.fingerprint(col(textCol))),
      keys = Seq("__fp"), order = Seq(col(idCol)))
      .drop("__fp"))

    // Near-dup removal: greedy drop of the higher id of each verified
    // pair; oversized buckets collapse to their minimum directly.
    val drop = Dedup.minhashDropSet(exactKept, idCol, textCol, minJaccard,
      maxBucket = maxBucket, portable = portableHash)
      .withColumnRenamed("doc", idCol)
    exactKept.join(drop, Seq(idCol), "left_anti")
  }
}
