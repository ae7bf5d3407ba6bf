package graft.functions

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DictMatchSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def run(text: String, dict: Seq[String]): Seq[String] =
    Seq(Tuple1(text)).toDF("t")
      .select(DictMatch.of(col("t"), dict).as("m"))
      .as[Seq[String]].head()

  test("suffix-link hits: a pattern ending inside another is reported") {
    // "she" contains "he"; "hers" shares a prefix path with "he".
    assert(run("ushers", Seq("he", "she", "his", "hers")) == Seq("he", "hers", "she"))
  }

  test("overlapping and nested occurrences each report once, sorted") {
    assert(run("lorem lorem", Seq("lo", "lorem", "rem", "em lo")) ==
      Seq("em lo", "lo", "lorem", "rem"))
    assert(run("aaaa", Seq("a", "aa", "aaa", "b")) == Seq("a", "aa", "aaa"))
  }

  test("no match, empty text, and duplicate dictionary entries") {
    assert(run("xyz", Seq("abc", "def")).isEmpty)
    assert(run("", Seq("abc")).isEmpty)
    assert(run("abcabc", Seq("abc", "abc")) == Seq("abc"))
  }

  test("matches the k-probe contains() definition on corpus text") {
    val dict = Seq("the", "and", "data", "lo", "lorem", "or", "ipsum dolor")
    val docs = graft.tables.TestTables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), lower(coalesce(col("text"), lit(""))).as("t"))
    val auto = docs.select(col("doc_id"), DictMatch.of(col("t"), dict).as("m"))
      .as[(Long, Seq[String])].collect().toMap
    val probe = docs.as[(Long, String)].collect().map { case (id, t) =>
      id -> dict.distinct.sorted.filter(t.contains)
    }.toMap
    assert(auto == probe)
  }

  test("empty patterns are rejected at build") {
    val e = intercept[Exception] { run("x", Seq("a", "")) }
    assert(e.getMessage.contains("empty patterns") ||
      Option(e.getCause).exists(_.getMessage.contains("empty patterns")))
  }

  test("NULL pattern elements and a NULL patterns literal are rejected with a named error") {
    // Analysis-time rejection: containsNull arrays pass the type match,
    // so without the explicit check this would NPE in the Automaton
    // builder on an executor.
    val e1 = intercept[Exception] {
      spark.sql("SELECT dict_match('tail', array('a', CAST(NULL AS STRING)))").collect()
    }
    assert(e1.getMessage.contains("NULL pattern") ||
      Option(e1.getCause).exists(_.getMessage.contains("NULL pattern")), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("SELECT dict_match('tail', CAST(NULL AS ARRAY<STRING>))").collect()
    }
    assert(e2.getMessage.contains("NULL literal") ||
      Option(e2.getCause).exists(_.getMessage.contains("NULL literal")), e2.getMessage)
  }

  test("runs inside whole-stage codegen (no fallback)") {
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      assert(run("the data", Seq("the", "data")) == Seq("data", "the"))
    } finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }
}
