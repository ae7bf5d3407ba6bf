package graft.parse

import com.fasterxml.jackson.core.{JsonFactory, JsonToken}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, TernaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
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
  extends TernaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(json: Any, key: Any, sub: Any): Any = {
    val target = key.asInstanceOf[UTF8String].toString
    val subfield = sub.asInstanceOf[UTF8String].toString
    val out = scala.collection.mutable.ArrayBuffer.empty[Double]
    try {
      val parser = new JsonFactory().createParser(json.asInstanceOf[UTF8String].toString)
      // Depth of nesting inside a matched `target` object; 0 = not inside.
      var insideTarget = 0
      var fieldName: String = null
      var tok = parser.nextToken()
      while (tok != null) {
        tok match {
          case JsonToken.FIELD_NAME =>
            fieldName = parser.currentName()
          case JsonToken.START_OBJECT | JsonToken.START_ARRAY =>
            if (insideTarget > 0) insideTarget += 1
            else if (tok == JsonToken.START_OBJECT && fieldName == target) insideTarget = 1
            fieldName = null
          case JsonToken.END_OBJECT | JsonToken.END_ARRAY =>
            if (insideTarget > 0) insideTarget -= 1
            fieldName = null
          case JsonToken.VALUE_NUMBER_INT | JsonToken.VALUE_NUMBER_FLOAT =>
            if (insideTarget == 1 && fieldName == subfield) out += parser.getDoubleValue
            fieldName = null
          case _ =>
            fieldName = null
        }
        tok = parser.nextToken()
      }
      parser.close()
      new GenericArrayData(out.toArray)
    } catch {
      // Malformed JSON is a value, not a failure (SURVEY §7.5.5).
      case _: Exception => null
    }
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): JsonFindNumbers =
    copy(first = f, second = s, third = t)
}

object JsonFindNumbers {
  val fnName = "json_find_numbers"

  /** Column-API entry point; requires GraftExtensions on the session
    * (spark.sql.extensions=graft.GraftExtensions) so the function is in
    * the registry — the public-API way to mount a custom expression.
    */
  def of(json: Column, key: String, subfield: String): Column =
    call_function(fnName, json, lit(key), lit(subfield))
}
