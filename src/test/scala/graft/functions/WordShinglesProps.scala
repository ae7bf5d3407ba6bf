package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** Property tests for the shingle kernel against a straight-line Scala
  * reference (pure JVM — the same static method generated code calls).
  */
object WordShinglesProps extends Properties("WordShingles") {

  private val word = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private val wordsGen = Gen.listOf(word)
  private val nGen = Gen.chooseNum(2, 6)

  private def kernel(words: List[String], n: Int): Seq[String] = {
    val in = new GenericArrayData(words.map(UTF8String.fromString).toArray[Any])
    val out = WordShingles.make(in, n)
    (0 until out.numElements()).map(i => out.getUTF8String(i).toString)
  }

  /** The spec: sliding windows, short inputs collapse to one shingle. */
  private def reference(words: List[String], n: Int): Seq[String] =
    if (words.length < n) Seq(words.mkString(" "))
    else words.sliding(n).map(_.mkString(" ")).toSeq

  property("kernel equals the sliding-window reference") =
    Prop.forAll(wordsGen, nGen) { (ws, n) => kernel(ws, n) == reference(ws, n) }

  property("n < 1 is rejected (n=0 would emit all-empty shingles — silent false dedup)") =
    Prop.forAll(wordsGen, Gen.chooseNum(-3, 0)) { (ws, n) =>
      Prop.throws(classOf[IllegalArgumentException])(kernel(ws, n))
    }

  property("shingle count is max(len - n + 1, 1)") =
    Prop.forAll(wordsGen, nGen) { (ws, n) =>
      kernel(ws, n).length == math.max(ws.length - n + 1, 1)
    }

  property("every shingle except a collapsed one has exactly n words") =
    Prop.forAll(Gen.nonEmptyListOf(word), nGen) { (ws, n) =>
      ws.length < n || kernel(ws, n).forall(_.split(' ').length == n)
    }
}
