package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a word array as a native Catalyst expression.
  *
  * The HOF formulation materialized a 64-element vote array PER WORD
  * (zip_with over array_repeat) and folded it per document — a heavy
  * allocation chain on the per-document hot loop of sketch-based
  * dedup. This kernel keeps 64 int votes in a local array and makes
  * one pass over the words inside whole-stage codegen.
  *
  * Word hashing is FNV-1a 64 over the UTF-8 bytes with a splitmix64
  * finalizer — deterministic, executor-independent. The bit 63 is
  * masked out so the sketch stays non-negative (same convention as
  * the HOF form). Hash family differs from the HOF form; SimHash only
  * needs internal consistency.
  */
@ExpressionDescription(
  usage = "simhash64(words) - 63-bit SimHash sketch of a word array.")
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<string>, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(words: Any): Any =
    SimHash64.sketch(words.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, words => {
      val cls = SimHash64.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |${ev.value} = $cls.sketch($words);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

object SimHash64 {
  val fnName = "simhash64"

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64 over UTF-8 bytes, finalized with splitmix64. */
  def wordHash(w: UTF8String): Long = {
    val bytes = w.getBytes
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= bytes(i) & 0xFFL
      h *= 0x100000001B3L
      i += 1
    }
    mix(h)
  }

  /** Fused sketch kernel (shared by eval and generated code). */
  def sketch(words: ArrayData): Long = {
    val n = words.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) {
        val h = wordHash(words.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 63) { // bit 63 stays 0: non-negative sketch
      if (votes(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  /** Column-API entry point; requires GraftExtensions on the session. */
  def of(words: Column): Column = call_function(fnName, words)
}
