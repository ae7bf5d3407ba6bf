package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Cosine similarity over two double vectors as a native Catalyst
  * expression. The HOF formulation (`aggregate(zip_with(...))`) is
  * correct but allocates a lambda frame per element and sits outside
  * the tight loop the JIT can vectorize; on the ANN hot path (every
  * candidate pair scores one cosine) a fused single-pass loop is the
  * difference between scanning a 100 TB corpus at memory bandwidth and
  * at interpreter speed.
  *
  * Bit-compatible with the HOF version: dot and the two norms
  * accumulate left-to-right exactly like the `aggregate` folds, so
  * results hash-match the DuckDB oracle either way. Null/shape
  * semantics also match: null input, length mismatch, or a null
  * element → null (zip_with pads the shorter side with null, which
  * nulls the fold).
  */
@ExpressionDescription(
  usage = "cosine_sim(a, b) - cosine similarity of two double vectors; null on shape mismatch.")
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall {
      case e => e.dataType match {
        case ArrayType(DoubleType, _) => true
        case _ => false
      }
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<double> inputs, got ${left.dataType.sql}, ${right.dataType.sql}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSimilarity.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = CosineSimilarity.getClass.getName.stripSuffix("$") + "$.MODULE$"
      val tmp = ctx.freshName("cos")
      s"""
         |java.lang.Double $tmp = $cls.cosine($a, $b);
         |${ev.isNull} = $tmp == null;
         |${ev.value} = ${ev.isNull} ? 0.0 : $tmp.doubleValue();
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
}

object CosineSimilarity {
  val fnName = "cosine_sim"

  /** Single fused pass (shared by eval and generated code). */
  def cosine(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Column-API entry point; requires GraftExtensions on the session. */
  def of(a: Column, b: Column): Column = call_function(fnName, a, b)
}
