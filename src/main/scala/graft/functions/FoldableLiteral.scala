package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure
import org.apache.spark.sql.catalyst.expressions.Expression

import scala.util.{Failure, Success, Try}

/** Analysis-time evaluation of foldable literal arguments with eval
  * errors as NAMED TypeCheckFailures — originated in DictMatch, now the
  * SINGLE home of the contract (DictMatch itself delegates here), shared
  * by every expression that compiles a literal argument into its
  * runtime state. Foldable does not mean
  * eval-safe: an ANSI-mode error inside the literal (overflowing
  * arithmetic, bad cast) would otherwise escape the ANALYZER as a raw
  * runtime exception, and a NULL int literal silently unboxes to 0 —
  * turning "invalid argument" into either a crash with no expression
  * name attached or a misleading bounds message.
  */
private[functions] object FoldableLiteral {

  /** Evaluate an IntegerType literal argument: Right(value) or a named
    * failure for eval errors, NULLs, and non-int results.
    */
  def int(prettyName: String, argName: String, e: Expression): Either[TypeCheckFailure, Int] =
    Try(e.eval(InternalRow.empty)) match {
      case Failure(ex) => Left(TypeCheckFailure(
        s"$prettyName: $argName literal failed to evaluate: ${ex.getMessage}"))
      case Success(null) => Left(TypeCheckFailure(
        s"$prettyName: $argName must not be a NULL literal"))
      case Success(v: Int) => Right(v)
      case Success(other) => Left(TypeCheckFailure(
        s"$prettyName: $argName literal evaluated to unexpected ${other.getClass.getName}"))
    }

  /** Evaluate a StringType literal argument (NULL rejected). */
  def string(prettyName: String, argName: String, e: Expression): Either[TypeCheckFailure, Unit] =
    Try(e.eval(InternalRow.empty)) match {
      case Failure(ex) => Left(TypeCheckFailure(
        s"$prettyName: $argName literal failed to evaluate: ${ex.getMessage}"))
      case Success(null) => Left(TypeCheckFailure(
        s"$prettyName: $argName must not be a NULL literal"))
      case Success(_) => Right(())
    }

  /** Evaluate an ArrayType(StringType) literal argument; rejects a NULL
    * array and NULL elements (containsNull=true passes the type match,
    * so the shape check alone does not cover this).
    */
  def stringArray(prettyName: String, argName: String, e: Expression): Either[TypeCheckFailure, Unit] =
    Try(e.eval(InternalRow.empty)) match {
      case Failure(ex) => Left(TypeCheckFailure(
        s"$prettyName: $argName literal failed to evaluate: ${ex.getMessage}"))
      case Success(null) => Left(TypeCheckFailure(
        s"$prettyName: $argName must not be a NULL literal"))
      case Success(arr: org.apache.spark.sql.catalyst.util.ArrayData) =>
        val nulls = (0 until arr.numElements()).filter(arr.isNullAt)
        if (nulls.nonEmpty) Left(TypeCheckFailure(
          s"$prettyName: NULL $argName elements are not allowed (at index ${nulls.head})"))
        else Right(())
      case Success(other) => Left(TypeCheckFailure(
        s"$prettyName: $argName literal evaluated to unexpected ${other.getClass.getName}"))
    }
}
