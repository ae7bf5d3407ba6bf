package graft.model

import java.sql.{Date, Timestamp}
import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.types.StructType

/** Typed core records (SURVEY.md §1.3: "Dataset[T] case classes are
  * worth it for the three core records"). The case classes double as
  * the documented stable schemas — `schemaOf[T]` derives the StructType
  * used for explicit-schema reads, so the type and the schema cannot
  * drift apart.
  */
object Model {

  /** Visit extraction record (sql/eligibility_enhanced.sql:5-60 shape,
    * trimmed to the load-bearing columns).
    */
  final case class Visit(
      visit_id: Long,
      patient_id: Long,
      start_date: Date,
      patient_name: String,
      gender: String,
      marital_char: String,
      nationality: String,
      iqama_no: Option[Long],
      payer_license: Long)

  /** Claim item / service record (sql/resubmission.sql:26-52 shape). */
  final case class ClaimItem(
      visit_id: Long,
      visit_service_id: Long,
      seq_no: Int,
      service_name: String,
      reason_code: String,
      justification_type: String,
      status: String,
      reason: String)

  /** Eligibility result record (dags/eligibilty_etl.py:231-241 shape).
    * The load table's `class` column maps to `eligibility_class` here —
    * `class` is not a legal encoder field name; rename on write with
    * .withColumnRenamed("eligibility_class", "class").
    */
  final case class EligibilityResult(
      visit_id: Long,
      outcome: String,
      note: Option[String],
      eligibility_class: Option[String],
      approval_limit: Option[Double],
      copay_maximum: Option[Double],
      insertion_date: String)

  def schemaOf[T: Encoder]: StructType = implicitly[Encoder[T]].schema

  implicit lazy val visitEncoder: Encoder[Visit] = Encoders.product[Visit]
  implicit lazy val claimItemEncoder: Encoder[ClaimItem] = Encoders.product[ClaimItem]
  implicit lazy val eligibilityResultEncoder: Encoder[EligibilityResult] = Encoders.product[EligibilityResult]

  /** Typed view of the resubmission extraction — compile-time column
    * safety from here on (`ds.filter(_.status == "R")` etc.).
    */
  def claimItems(spark: SparkSession, dir: String): Dataset[ClaimItem] =
    graft.relational.ResubmissionExtract.full(spark, dir)
      .selectExpr("visit_id", "visit_service_id", "CAST(seq_no AS INT) AS seq_no",
        "service_name", "reason_code", "justification_type", "status", "reason")
      .as[ClaimItem]
}
