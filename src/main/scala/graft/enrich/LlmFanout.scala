package graft.enrich

import graft.parse.LlmJsonRepair
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-visit LLM fan-out (C4 predictions / C5 justifications,
  * reference src/predictions.py:201-290 and src/resubmission.py:76-151).
  *
  * The reference iterates visits in a Python loop; here the grouping is
  * one shuffle (`groupBy(visit).agg(collect_list(...))`) and the LLM
  * stage is a bounded-parallelism mapPartitions over the *visit* rows —
  * call volume = visit count, not service count. Results come back as a
  * JSON map, are repaired (LlmJsonRepair), exploded to (uid, text)
  * pairs, and left-joined to the claims.
  *
  * Scale notes: per-visit group size is skewed (30+ services on some
  * visits) — AQE skew handling applies on the groupBy; the prompt
  * payload sorts service uids so the call is deterministic regardless
  * of row order. Failed-visit sets join back broadcast only on
  * measured evidence (Joins.broadcastIfSmall) — usually tiny, but they
  * grow with the corpus, so the hint is never static.
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

  /** Core fan-out: one LLM call per visit (with retry pass), responses
    * repaired and exploded to rows (__visit, __uid, __text, __failed).
    */
  private def callPerVisit(claims: DataFrame, visitCol: String, uidCol: String, field: String,
                           makeClient: () => ServiceClient, cfg: EnrichOperator.Config,
                           metrics: Option[EnrichOperator.Metrics]): DataFrame = {
    val perVisit = claims
      .groupBy(col(visitCol))
      .agg(array_join(array_sort(collect_list(col(uidCol).cast("string"))), ",").as("__uids"))
      .withColumn("__payload", concat_ws("|", col(visitCol).cast("string"), col("__uids")))

    val called = EnrichOperator.enrich(perVisit, "__payload", makeClient, cfg, metrics)
    val retried = EnrichOperator.withRetryPass(called, "__payload", makeClient, cfg,
      metrics = metrics)

    val outSchema = StructType(Seq(
      StructField("__visit", StringType),
      StructField("__uid", StringType),
      StructField("__text", StringType),
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
          val entries = LlmJsonRepair.repair(r.getString(respIdx), field)
          if (entries.isEmpty) Iterator(Row(visit, null, null, 0))
          else entries.iterator.map { case (uid, text) => Row(visit, uid, text, 0) }
        }
      }
    }(enc)
    // Consumed twice downstream (failed-visit set + per-uid texts) —
    // materialize so the LLM stage runs exactly once and its blocks
    // are auto-freed once the query's result is dropped.
    graft.util.Materialize.stage(exploded)
  }

  /** C4: predictions. Appends `medical_prediction`
    * ("Approved"/"Rejected"/"Failed to reach LLM") and `reason`.
    */
  def predict(claims: DataFrame, visitCol: String, uidCol: String,
              makeClient: () => ServiceClient,
              cfg: EnrichOperator.Config = EnrichOperator.Config(),
              metrics: Option[EnrichOperator.Metrics] = None): DataFrame = {
    val exploded = callPerVisit(claims, visitCol, uidCol, "Rejected", makeClient, cfg, metrics)
    val failedVisits = graft.util.Materialize.stage(
      exploded.filter(col("__failed") === 1).select(col("__visit")).distinct())
    // Cast the (small) response side back to the claims' key type —
    // casting the fact side per row would both cost and break any
    // pre-existing partitioning on the key.
    val rejections = exploded.filter(col("__uid").isNotNull)
      .select(col("__uid").try_cast(claims.schema(uidCol).dataType.sql).as("__uid"), col("__text"))
    // failedVisits scales with the corpus (≈1/97 of visits): hint it
    // broadcast only on measured evidence (it derives from the
    // checkpointed explode, so the count is cheap).
    claims
      .join(graft.ops.Joins.broadcastIfSmall(failedVisits),
        claims(visitCol).cast("string") === col("__visit"), "left")
      .join(rejections, claims(uidCol) === col("__uid"), "left")
      .withColumn("medical_prediction",
        when(col("__visit").isNotNull, "Failed to reach LLM")
          .when(col("__text").isNotNull, "Rejected")
          .otherwise("Approved"))
      .withColumn("reason", col("__text"))
      .drop("__visit", "__uid", "__text")
  }

  /** C5: justifications. Appends `justification` (terminal-failure
    * marker for visits the LLM never answered).
    */
  def justify(claims: DataFrame, visitCol: String, uidCol: String,
              makeClient: () => ServiceClient,
              cfg: EnrichOperator.Config = EnrichOperator.Config(),
              metrics: Option[EnrichOperator.Metrics] = None): DataFrame = {
    val exploded = callPerVisit(claims, visitCol, uidCol, "Justifications", makeClient, cfg, metrics)
    val failedVisits = graft.util.Materialize.stage(
      exploded.filter(col("__failed") === 1).select(col("__visit")).distinct())
    val texts = exploded.filter(col("__uid").isNotNull)
      .select(col("__uid").try_cast(claims.schema(uidCol).dataType.sql).as("__uid"), col("__text"))
    claims
      .join(graft.ops.Joins.broadcastIfSmall(failedVisits),
        claims(visitCol).cast("string") === col("__visit"), "left")
      .join(texts, claims(uidCol) === col("__uid"), "left")
      .withColumn("justification",
        when(col("__visit").isNotNull, "Failed to reach LLM").otherwise(col("__text")))
      .drop("__visit", "__uid", "__text")
  }
}
