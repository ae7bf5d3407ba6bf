package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, typedlit}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern literal matching as ONE pass per row — the blocklist /
  * terminology scan of corpus curation (C4 and Gopher both gate
  * documents on word lists; a claims pipeline scans narratives for
  * flagged terms). The naive form is k `LIKE '%term%'` predicates —
  * k scans of every byte; this is the textbook Aho–Corasick automaton
  * (Aho & Corasick 1975): the dictionary compiles ONCE into a
  * goto/fail trie that ships inside the serialized expression, and
  * each row is a single forward walk — cost independent of dictionary
  * size, inside whole-stage codegen, no join, no UDF.
  *
  * `dict_match(text, patterns)` returns the DISTINCT patterns that
  * occur as (case-sensitive) substrings, sorted — deterministic output
  * any engine replays with k `contains()` probes (the oracle's form:
  * the automaton must agree with the obvious quadratic scan).
  */
@ExpressionDescription(
  usage = "dict_match(text, patterns) - sorted distinct dictionary patterns occurring in text.")
case class DictMatch(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) =>
        if (!right.foldable)
          TypeCheckResult.TypeCheckFailure(s"$prettyName: patterns must be a literal (foldable) array")
        else
          // Foldable → evaluable at analysis time: reject a NULL array,
          // NULL elements, and eval errors HERE with a named failure —
          // the shared FoldableLiteral ladder (this expression is where
          // the contract originated; the helper is now the single home
          // so the check cannot drift between its users).
          FoldableLiteral.stringArray(prettyName, "patterns", right)
            .fold(identity, _ => TypeCheckResult.TypeCheckSuccess)
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (string, array<string>), got (${a.sql}, ${b.sql})")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = left.nullable

  @transient private lazy val automaton: DictMatch.Automaton = {
    val arr = right.eval(InternalRow.empty).asInstanceOf[ArrayData]
    val patterns = new Array[String](arr.numElements())
    var i = 0
    while (i < patterns.length) {
      val u = arr.getUTF8String(i)
      // Defense in depth: checkInputDataTypes already rejects NULL
      // elements with a named analysis error; keep the runtime path loud
      // too rather than NPE-ing in UTF8String.toString.
      require(u != null, s"dict_match: pattern element $i is NULL — NULL patterns are not allowed")
      patterns(i) = u.toString
      i += 1
    }
    new DictMatch.Automaton(patterns)
  }

  override def nullSafeEval(text: Any, patterns: Any): Any =
    automaton.matchesOf(text.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (text, _) => {
      val a = ctx.addReferenceObj("dictAutomaton", automaton, classOf[DictMatch.Automaton].getName)
      s"${ev.value} = $a.matchesOf($text);"
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DictMatch =
    copy(left = l, right = r)
}

object DictMatch {
  val fnName = "dict_match"

  /** Column-API entry point; requires GraftExtensions on the session. */
  def of(text: Column, patterns: Seq[String]): Column =
    call_function(fnName, text, typedlit(patterns))

  /** Aho–Corasick goto/fail automaton over chars. Nodes are flat
    * arrays; transitions live in per-node hash maps (dictionaries are
    * thousands of short terms — the automaton is kilobytes). Empty
    * patterns are rejected at build (an empty needle "occurs"
    * everywhere and only poisons the verdict).
    */
  final class Automaton(patterns: Array[String]) extends Serializable {
    require(patterns.forall(_.nonEmpty), "dict_match: empty patterns are not allowed")
    // Deduplicated, sorted pattern table: output indexes are stable.
    private val pats: Array[UTF8String] =
      patterns.distinct.sorted.map(UTF8String.fromString)
    private val patStrs: Array[String] = pats.map(_.toString)

    private val children = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Char, Int]())
    private val fail = scala.collection.mutable.ArrayBuffer(0)
    // Pattern indexes ending at each node (via goto OR dictionary links).
    private val outs = scala.collection.mutable.ArrayBuffer[List[Int]](Nil)

    patStrs.zipWithIndex.foreach { case (p, pi) =>
      var node = 0
      p.foreach { ch =>
        node = if (children(node).containsKey(ch)) children(node).get(ch) else {
          children += new java.util.HashMap[Char, Int]()
          fail += 0
          outs += Nil
          val id = children.length - 1
          children(node).put(ch, id)
          id
        }
      }
      outs(node) = pi :: outs(node)
    }
    // BFS fail links; merge output sets so one walk reports suffix hits.
    locally {
      val queue = new java.util.ArrayDeque[Int]()
      children(0).values().forEach { c => fail(c) = 0; queue.add(c) }
      while (!queue.isEmpty) {
        val u = queue.poll()
        children(u).entrySet().forEach { e =>
          val (ch, v) = (e.getKey, e.getValue)
          var f = fail(u)
          while (f != 0 && !children(f).containsKey(ch)) f = fail(f)
          fail(v) = if (children(f).containsKey(ch) && children(f).get(ch) != v)
            children(f).get(ch) else 0
          outs(v) = outs(v) ++ outs(fail(v))
          queue.add(v)
        }
      }
    }
    private val childArr = children.toArray
    private val failArr = fail.toArray
    private val outArr: Array[Array[Int]] = outs.map(_.distinct.sorted.toArray).toArray

    /** One forward walk; returns the sorted distinct matched patterns. */
    def matchesOf(text: UTF8String): ArrayData = {
      val s = text.toString
      val seen = new Array[Boolean](pats.length)
      var nSeen = 0
      var node = 0
      var i = 0
      val n = s.length
      while (i < n && nSeen < pats.length) {
        val ch = s.charAt(i)
        while (node != 0 && !childArr(node).containsKey(ch)) node = failArr(node)
        if (childArr(node).containsKey(ch)) node = childArr(node).get(ch)
        val hits = outArr(node)
        var j = 0
        while (j < hits.length) {
          if (!seen(hits(j))) { seen(hits(j)) = true; nSeen += 1 }
          j += 1
        }
        i += 1
      }
      val out = new Array[AnyRef](nSeen)
      var k = 0
      var p = 0
      while (p < pats.length) {
        if (seen(p)) { out(k) = pats(p); k += 1 }
        p += 1
      }
      new GenericArrayData(out)
    }
  }
}
