package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression — the
  * canonicalization step in front of exact/near dedup and fingerprint
  * hashing: "café" typed as e+COMBINING ACUTE and as the precomposed
  * é must hash identically or dedup silently misses pairs.
  *
  * Spark has no built-in normalizer; this wraps `java.text.Normalizer`
  * (ICU-conformant NFC per UAX #15, so any conformant engine — e.g.
  * DuckDB's utf8proc `nfc_normalize` — produces byte-identical output)
  * in a codegen'd unary kernel. Pure per-row function: no shuffle, and
  * the common already-NFC fast path is a single `isNormalized` scan.
  */
@ExpressionDescription(
  usage = "nfc_normalize(str) - Unicode canonical composition (NFC) of str.")
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects string, got ${t.sql}")
  }
  override def dataType: DataType = StringType

  override def nullSafeEval(s: Any): Any =
    NfcNormalize.normalize(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => {
      val cls = NfcNormalize.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"$cls.normalize($s)"
    })

  override protected def withNewChildInternal(c: Expression): NfcNormalize = copy(child = c)
}

object NfcNormalize {
  val fnName = "nfc_normalize"

  /** Kernel shared by eval and generated code. `isNormalized` first:
    * for the dominant already-composed case it avoids both the String
    * round-trip allocation and the composition pass.
    */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Column-API entry point; requires GraftExtensions on the session. */
  def of(str: Column): Column = call_function(fnName, str)
}
