package graft.datapipe

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VocabSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("tokens lowercases, splits on non-alpha, and drops empties") {
    val df = Seq("Hello, World!  42 foo-bar").toDF("text")
    val out = df.select(Vocab.tokens($"text").as("t")).as[Seq[String]].head()
    assert(out == Seq("hello", "world", "foo", "bar"))
  }

  test("topVocab ranks by frequency then lexicographically") {
    val docs = Seq("b b b a a c", "a z z").toDF("text")
    val v = Vocab.topVocab(docs, $"text", n = 3).as[(String, Long)].collect().toSeq
    // a:3, b:3, z:2, c:1 -> top-3 is a, b (tie broken a<b), z
    assert(v == Seq(("a", 3L), ("b", 3L), ("z", 2L)))
  }

  test("oovStats counts duplicated OOV tokens per occurrence") {
    val docs = Seq((1L, "a b a q q"), (2L, "a a a")).toDF("id", "text")
    val vocab = Seq("a", "b").toDF("token")
    val out = Vocab.oovStats(docs, $"id", $"text", vocab)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out == Map(1L -> ((5L, 2L)), 2L -> ((3L, 0L))))
  }

  test("induced vocab covers its own corpus exactly when n >= distinct tokens") {
    val docs = Seq("x y z", "y z w").toDF("text").withColumn("id", lit(1L))
    val vocab = Vocab.topVocab(docs, $"text", n = 10)
    val oov = Vocab.oovStats(docs, $"id", $"text", vocab)
      .agg(sum($"n_oov")).as[Long].head()
    assert(oov == 0L)
  }
}
