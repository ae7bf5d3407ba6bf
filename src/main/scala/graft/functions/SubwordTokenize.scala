package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit, typedlit}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match (WordPiece MaxMatch) subword tokenization as a
  * native Catalyst expression — the tokenize step of a pretraining
  * pipeline, run where the data lives instead of in a driver loop.
  *
  * `subword_tokenize(words, vocab, unk)` maps an `array<string>` of
  * words to the flattened `array<string>` of subword pieces. The vocab
  * uses the WordPiece convention: a piece starting `##` may only match
  * at a non-initial position (with the `##` stripped); any other piece
  * only word-initially. At each position the LONGEST matching piece
  * wins; if no piece matches, the whole word collapses to `unk`
  * (MaxMatch never backtracks). Empty and null words contribute
  * nothing.
  *
  * Scale shape: `vocab` must be foldable — it is compiled ONCE into a
  * per-length hash table that ships inside the serialized expression
  * (a real vocab is ~30k pieces, far below broadcast thresholds), so
  * the per-row cost is pure probing inside whole-stage codegen: no
  * join, no shuffle, no UDF serialization of the vocab per batch.
  */
@ExpressionDescription(
  usage = "subword_tokenize(words, vocab, unk) - greedy longest-match subword pieces of a word array.")
case class SubwordTokenize(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _), StringType) =>
        if (!second.foldable)
          TypeCheckResult.TypeCheckFailure(s"$prettyName: vocab must be a literal (foldable) array")
        else if (!third.foldable)
          TypeCheckResult.TypeCheckFailure(s"$prettyName: unk must be a literal (foldable) string")
        else
          // Foldable ≠ eval-safe: surface eval errors / NULLs in the
          // vocab or unk literal as named analysis failures instead of
          // an NPE inside the Matcher builder on an executor.
          (FoldableLiteral.stringArray(prettyName, "vocab", second),
            FoldableLiteral.string(prettyName, "unk", third)) match {
            case (Left(f), _) => f
            case (_, Left(f)) => f
            case _ => TypeCheckResult.TypeCheckSuccess
          }
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<string>, array<string>, string), got (${a.sql}, ${b.sql}, ${c.sql})")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = first.nullable

  /** Compiled once per (deserialized) expression instance; vocab and
    * unk are foldable so eval(null-row) is legal here.
    */
  @transient private lazy val matcher: SubwordTokenize.Matcher = {
    val vocabArr = second.eval(InternalRow.empty).asInstanceOf[ArrayData]
    val unk = third.eval(InternalRow.empty).asInstanceOf[UTF8String]
    val pieces = new Array[String](vocabArr.numElements())
    var i = 0
    while (i < pieces.length) { pieces(i) = vocabArr.getUTF8String(i).toString; i += 1 }
    new SubwordTokenize.Matcher(pieces, unk.toString)
  }

  override def nullSafeEval(words: Any, vocab: Any, unk: Any): Any =
    matcher.tokenizeAll(words.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (words, _, _) => {
      val m = ctx.addReferenceObj("subwordMatcher", matcher, classOf[SubwordTokenize.Matcher].getName)
      s"${ev.value} = $m.tokenizeAll($words);"
    })

  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): SubwordTokenize =
    copy(first = f, second = s, third = t)
}

object SubwordTokenize {
  val fnName = "subword_tokenize"

  /** Column-API entry point; requires GraftExtensions on the session. */
  def of(words: Column, vocab: Seq[String], unk: String = "[UNK]"): Column =
    call_function(fnName, words, typedlit(vocab), lit(unk))

  /** The compiled vocab. Word-initial and continuation pieces live in
    * separate tables keyed by their MATCHED text (continuations with
    * the `##` stripped) and map to the emitted piece as a prebuilt
    * UTF8String, so the hot loop allocates nothing per probe hit.
    */
  final class Matcher(vocab: Array[String], unk: String) extends Serializable {
    private val startTable = new java.util.HashMap[String, UTF8String]()
    private val contTable = new java.util.HashMap[String, UTF8String]()
    private var maxStart = 0
    private var maxCont = 0
    vocab.foreach { p =>
      if (p.startsWith("##")) {
        val stem = p.substring(2)
        if (stem.nonEmpty) {
          contTable.put(stem, UTF8String.fromString(p))
          if (stem.length > maxCont) maxCont = stem.length
        }
      } else if (p.nonEmpty) {
        startTable.put(p, UTF8String.fromString(p))
        if (p.length > maxStart) maxStart = p.length
      }
    }
    private val unkPiece = UTF8String.fromString(unk)

    /** Greedy MaxMatch of one word into `out`; on a dead end the word's
      * partial pieces are rolled back and `unk` stands for the word.
      */
    private def tokenizeWord(word: String, out: java.util.ArrayList[AnyRef]): Unit = {
      val mark = out.size()
      val len = word.length
      var pos = 0
      while (pos < len) {
        val table = if (pos == 0) startTable else contTable
        var l = math.min(if (pos == 0) maxStart else maxCont, len - pos)
        var hit: UTF8String = null
        while (l >= 1 && hit == null) {
          hit = table.get(word.substring(pos, pos + l))
          if (hit == null) l -= 1
        }
        if (hit == null) {
          while (out.size() > mark) out.remove(out.size() - 1)
          out.add(unkPiece)
          return
        }
        out.add(hit)
        pos += l
      }
    }

    /** Kernel shared by eval and generated code. */
    def tokenizeAll(words: ArrayData): ArrayData = {
      val n = words.numElements()
      val out = new java.util.ArrayList[AnyRef](n * 2)
      var i = 0
      while (i < n) {
        if (!words.isNullAt(i)) {
          val w = words.getUTF8String(i)
          if (w.numBytes() > 0) tokenizeWord(w.toString, out)
        }
        i += 1
      }
      new GenericArrayData(out.toArray)
    }
  }
}
