package graft.enrich

import graft.parse.LlmJsonRepair
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-visit LLM fan-out (C4 predictions / C5 justifications,
  * reference src/predictions.py:201-290 and src/resubmission.py:76-151).
  *
  * The reference iterates visits in a Python loop; here the grouping is
  * one shuffle (`groupBy(visit).agg(collect_list(struct(...)))`) and the
  * LLM stage is a bounded-parallelism mapPartitions over the *visit*
  * rows — call volume = visit count, not service count. Results come
  * back as a JSON map, are repaired (LlmJsonRepair), exploded to
  * (uid, reason) pairs, and left-joined to the claims.
  *
  * Scale notes: per-visit group size is skewed (30+ services on some
  * visits) — AQE skew handling applies on the groupBy; the prompt
  * payload sorts service uids so the call is deterministic regardless
  * of row order.
  */
object LlmFanout {

  /** Auto-reject gate (B18): visits with any null diagnosis skip the
    * LLM entirely (src/predictions.py:210-217).
    */
  def noDiagnosisVisits(claims: DataFrame, visitCol: String, dxCol: String): DataFrame =
    claims.groupBy(col(visitCol))
      .agg(max(col(dxCol).isNull.cast("int")).as("__no_dx"))
      .filter(col("__no_dx") === 1)
      .select(col(visitCol))

  /** Run predictions: claims must carry (visitCol, uidCol). Returns the
    * claims with `medical_prediction` and `reason` columns appended.
    */
  def predict(claims: DataFrame, visitCol: String, uidCol: String,
              makeClient: () => ServiceClient,
              cfg: EnrichOperator.Config = EnrichOperator.Config(),
              metrics: Option[EnrichOperator.Metrics] = None): DataFrame = {
    // One row per visit with a deterministic, order-independent payload.
    val perVisit = claims
      .groupBy(col(visitCol))
      .agg(array_join(array_sort(collect_list(col(uidCol).cast("string"))), ",").as("__uids"))
      .withColumn("__payload", concat_ws("|", col(visitCol).cast("string"), col("__uids")))

    val called = EnrichOperator.enrich(perVisit, "__payload", makeClient, cfg, metrics)
    val retried = EnrichOperator.withRetryPass(called, "__payload", makeClient, cfg)

    // Repair + explode the {"Rejected": {uid: reason}} map on executors.
    val outSchema = StructType(Seq(
      StructField("__visit", StringType),
      StructField("__uid", StringType),
      StructField("__reason", StringType),
      StructField("__failed", IntegerType)))
    val enc = Encoders.row(outSchema)
    val vIdx = retried.schema.fieldIndex(visitCol)
    val stIdx = retried.schema.fieldIndex("status")
    val respIdx = retried.schema.fieldIndex("response")
    val exploded = retried.mapPartitions { rows =>
      rows.flatMap { r =>
        val visit = Option(r.get(vIdx)).map(_.toString).orNull
        if (r.getString(stIdx) != "ok")
          Iterator(Row(visit, null, null, 1))
        else {
          val rejected = LlmJsonRepair.repair(r.getString(respIdx), "Rejected")
          if (rejected.isEmpty) Iterator(Row(visit, null, null, 0))
          else rejected.iterator.map { case (uid, reason) => Row(visit, uid, reason, 0) }
        }
      }
    }(enc)

    val failedVisits = exploded.filter(col("__failed") === 1).select(col("__visit")).distinct()
    val rejections = exploded.filter(col("__uid").isNotNull)
      .select(col("__uid"), col("__reason"))

    claims
      .join(broadcast(failedVisits), claims(visitCol).cast("string") === col("__visit"), "left")
      .join(rejections, claims(uidCol).cast("string") === col("__uid"), "left")
      .withColumn("medical_prediction",
        when(col("__visit").isNotNull, "Failed to reach LLM")
          .when(col("__reason").isNotNull, "Rejected")
          .otherwise("Approved"))
      .withColumn("reason", col("__reason"))
      .drop("__visit", "__uid", "__reason")
  }
}
