package graft.parse

import com.fasterxml.jackson.core.{JsonFactory, JsonToken}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Recursive any-depth JSON key search — the one scalar operation in the
  * reference that no built-in covers (src/eligibility.py:547-575
  * `find_keys("allowedMoney")`, used for Tawuniya money extraction).
  *
  * `json_find_numbers(json, key, subfield)` returns the numeric value of
  * `<key>.<subfield>` for every occurrence of `key` at any depth, in
  * document order. Implemented as a native Catalyst expression over
  * Jackson's streaming parser: single pass, no DOM, no UDF
  * serialization overhead; CodegenFallback is fine because the per-call
  * cost is dominated by the JSON scan itself.
  */
@ExpressionDescription(
  usage = "json_find_numbers(json, key, subfield) - numeric `key.subfield` values at any depth, in document order.")
case class JsonFindNumbers(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  // Checked input types make a wrong-typed call fail AT ANALYSIS with
  // a readable message, instead of a ClassCastException (interpreted)
  // or an opaque janino error (codegen) executor-side mid-job.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (children.forall(_.dataType == StringType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, string, string), got " +
          children.map(_.dataType.sql).mkString(", "))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(json: Any, key: Any, sub: Any): Any =
    JsonFindNumbers.findNumbers(
      json.asInstanceOf[UTF8String], key.asInstanceOf[UTF8String], sub.asInstanceOf[UTF8String])

  /** Generated code stays inside the whole-stage-codegen span: a single
    * static call into the streaming scanner, with the standard
    * null-propagation wrapper from nullSafeCodeGen — no per-row
    * reflective eval, no codegen fallback boundary.
    */
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (json, key, sub) => {
      val cls = JsonFindNumbers.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |${ev.value} = $cls.findNumbers($json, $key, $sub);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): JsonFindNumbers =
    copy(first = f, second = s, third = t)
}

object JsonFindNumbers {
  val fnName = "json_find_numbers"

  // JsonFactory is thread-safe and designed to be shared: per-call
  // construction would also discard its field-name canonicalization
  // cache on the per-row hot path.
  private val factory = new JsonFactory()

  /** Single-pass streaming scan (shared by eval and generated code).
    * Returns null on malformed JSON — errors are values (SURVEY §7.5.5).
    *
    * A boolean stack tracks, per open container, whether it is a match
    * scope (an OBJECT that was the value of a `target` field). A number
    * is collected when its name is `subfield` and the IMMEDIATELY
    * enclosing container is a match scope — so a `target` object nested
    * inside another `target` object opens its own scope and both
    * occurrences are found, like the reference's recursive find_keys
    * (a depth counter alone skipped the inner one).
    */
  def findNumbers(json: UTF8String, key: UTF8String, sub: UTF8String): ArrayData = {
    val target = key.toString
    val subfield = sub.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[Double]
    try {
      val parser = factory.createParser(json.toString)
      val scopes = scala.collection.mutable.ArrayBuffer.empty[Boolean]
      var fieldName: String = null
      var tok = parser.nextToken()
      while (tok != null) {
        tok match {
          case JsonToken.FIELD_NAME =>
            fieldName = parser.currentName()
          case JsonToken.START_OBJECT =>
            scopes += (fieldName == target)
            fieldName = null
          case JsonToken.START_ARRAY =>
            scopes += false
            fieldName = null
          case JsonToken.END_OBJECT | JsonToken.END_ARRAY =>
            if (scopes.nonEmpty) scopes.remove(scopes.length - 1)
            fieldName = null
          case JsonToken.VALUE_NUMBER_INT | JsonToken.VALUE_NUMBER_FLOAT =>
            if (scopes.nonEmpty && scopes.last && fieldName == subfield)
              out += parser.getDoubleValue
            fieldName = null
          case _ =>
            fieldName = null
        }
        tok = parser.nextToken()
      }
      parser.close()
      new GenericArrayData(out.toArray)
    } catch {
      case _: Exception => null
    }
  }

  /** Column-API entry point; requires GraftExtensions on the session
    * (spark.sql.extensions=graft.GraftExtensions) so the function is in
    * the registry — the public-API way to mount a custom expression.
    */
  def of(json: Column, key: String, subfield: String): Column =
    call_function(fnName, json, lit(key), lit(subfield))
}
