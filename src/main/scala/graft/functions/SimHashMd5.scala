package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The PORTABLE-hash twin of [[SimHash64]]: word hash = the first 8
  * md5 bytes (== first 16 hex chars, big-endian), so any engine can
  * recompute the full sketch — the same portability move as the
  * minhash md5 family, closing the one sketch the xxhash64/FNV
  * kernels couldn't oracle. Bit convention matches SimHash64: votes
  * on bits 0..62 of the word hash, bit 63 masked so the sketch stays
  * non-negative (which also keeps the SQL replay in plain BIGINT).
  * Production path stays [[SimHash64]] (no md5 cost); this twin is
  * the verification surface.
  */
@ExpressionDescription(
  usage = "simhash_md5(words) - 63-bit SimHash sketch with md5-prefix word hashes.")
case class SimHashMd5(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<string>, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(words: Any): Any =
    SimHashMd5.sketch(words.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, words => {
      val cls = SimHashMd5.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.sketch($words);"
    })

  override protected def withNewChildInternal(c: Expression): SimHashMd5 = copy(child = c)
}

object SimHashMd5 {
  val fnName = "simhash_md5"

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 8 md5 bytes of the word's UTF-8, big-endian — numerically
    * identical to parsing the first 16 hex chars of `md5(w)`.
    */
  def wordHash(w: UTF8String): Long = {
    val d = digest.get()
    d.reset()
    val bytes = d.digest(w.getBytes)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (bytes(i) & 0xFFL); i += 1 }
    h
  }

  /** Same vote kernel as SimHash64, md5 word hashes. */
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
    while (b < 63) {
      if (votes(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  /** Column-API entry point; requires GraftExtensions on the session. */
  def of(words: Column): Column = call_function(fnName, words)
}
