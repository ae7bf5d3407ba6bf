package graft.ops

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EncodingsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("dictionaryEncode assigns lexicographic codes and excludes NULL from the vocab") {
    val df = Seq(Some("b"), Some("a"), Some("c"), None, Some("a"))
      .toDF("cat").withColumn("id", monotonically_increasing_id())
    val (encoded, vocab) = Encodings.dictionaryEncode(df, "cat", "code")
    val v = vocab.as[(String, Long)].collect().toMap
    assert(v == Map("a" -> 0L, "b" -> 1L, "c" -> 2L),
      s"NULL must not shift real categories' codes: $v")
    val nullCodes = encoded.filter($"cat".isNull).select($"code")
      .as[Option[Long]].collect().toSeq
    assert(nullCodes == Seq(None), "NULL category surfaces as a null code")
    assert(encoded.count() == 5, "encode keeps every input row")
  }

  test("targetEncodeLoo excludes each row's own target from its code") {
    val df = Seq(("x", 1L), ("x", 0L), ("x", 1L), ("y", 1L))
      .toDF("cat", "t")
    val out = Encodings.targetEncodeLoo(df, "cat", "t", priorNum = 1L, priorDen = 2L)
      .select($"cat", $"t", $"code_num", $"code_den")
      .as[(String, Long, Long, Long)].collect().toSet
    // cat x: sum=2, n=3 → row t=1: (2-1+1, 3-1+2)=(2,4); row t=0: (3,4)
    assert(out.contains(("x", 1L, 2L, 4L)) && out.contains(("x", 0L, 3L, 4L)))
    // cat y: sum=1, n=1 → (1-1+1, 0+2)=(1,2): pure prior, no self-leak
    assert(out.contains(("y", 1L, 1L, 2L)))
  }

  test("targetEncodeLoo keeps null-category rows as their own group") {
    // groupBy produces a null-category stats row, but a plain
    // equi-join can never match it — these rows used to vanish.
    val df = Seq((Some("x"), 1L), (None, 1L), (None, 0L))
      .toDF("cat", "t")
    val out = Encodings.targetEncodeLoo(df, "cat", "t", priorNum = 1L, priorDen = 2L)
      .select($"cat", $"t", $"code_num", $"code_den")
      .as[(Option[String], Long, Long, Long)].collect().toSet
    assert(out.size == 3, s"no row may vanish: $out")
    // null group: sum=1, n=2 → t=1: (1-1+1, 2-1+2)=(1,3); t=0: (2,3)
    assert(out.contains((None, 1L, 1L, 3L)), s"got $out")
    assert(out.contains((None, 0L, 2L, 3L)), s"got $out")
  }
}
