package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Random-hyperplane LSH signature as a native Catalyst expression:
  * `lsh_signature(vec, numPlanes, table)` returns the sign-bit long of
  * `numPlanes` pseudo-random hyperplane projections.
  *
  * The HOF formulation folded one aggregate(zip_with(...)) PER PLANE —
  * numPlanes lambda-frame folds per row. This kernel computes every
  * plane in one fused pass over the vector inside whole-stage codegen.
  * On a corpus-scale dedup/ANN job the signature is computed for every
  * document and every query — this is the per-row hot loop.
  *
  * Plane components are a deterministic function of (table, plane,
  * dim) via a splitmix64-style mix mapped into (-1, 1): no RNG state,
  * identical planes on every executor and every run. Bucket values
  * differ from the old HOF formulation (different hash family), which
  * is fine — LSH needs internal consistency, not a particular hash.
  */
@ExpressionDescription(
  usage = "lsh_signature(vec, numPlanes, table) - sign-bit signature of `vec` under seeded hyperplanes.")
case class LshSignature(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _), IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<double>, int, int), got ${a.sql}, ${b.sql}, ${c.sql}")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(vec: Any, planes: Any, table: Any): Any =
    LshSignature.signature(
      vec.asInstanceOf[ArrayData], planes.asInstanceOf[Int], table.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vec, planes, table) => {
      val cls = LshSignature.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |${ev.value} = $cls.signature($vec, $planes, $table);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): LshSignature =
    copy(first = f, second = s, third = t)
}

object LshSignature {
  val fnName = "lsh_signature"

  /** splitmix64 finalizer — a well-mixed deterministic int→long hash. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Hyperplane component for (table, plane, dim) in (-1, 1). */
  def component(table: Int, plane: Int, dim: Int): Double =
    mix(table.toLong * 0x100000001L + plane.toLong * 0x10001L + dim.toLong).toDouble /
      Long.MaxValue.toDouble

  /** Fused signature kernel (shared by eval and generated code). */
  def signature(vec: ArrayData, numPlanes: Int, table: Int): Long = {
    // The signature is one long: planes past 64 would wrap `1L << i`
    // (JVM shifts are mod 64) and silently OR plane 64+'s vote into
    // plane 0's bit — correlated buckets with no error. Checked in the
    // kernel so both eval and generated code reject, literal or not.
    if (numPlanes < 1 || numPlanes > 64)
      throw new IllegalArgumentException(
        s"lsh_signature: numPlanes must be in [1, 64], got $numPlanes")
    val n = vec.numElements()
    var sig = 0L
    var i = 0
    while (i < numPlanes) {
      var d = 0.0
      var j = 0
      while (j < n) {
        if (!vec.isNullAt(j)) d += vec.getDouble(j) * component(table, i, j)
        j += 1
      }
      if (d >= 0) sig |= 1L << i
      i += 1
    }
    sig
  }

  /** Column-API entry point; requires GraftExtensions on the session. */
  def of(vec: Column, numPlanes: Int, table: Int): Column =
    call_function(fnName, vec, lit(numPlanes), lit(table))
}
