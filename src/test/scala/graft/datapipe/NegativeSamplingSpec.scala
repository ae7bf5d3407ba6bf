package graft.datapipe

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class NegativeSamplingSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val docs = (0L until 20L).map(i => (i, if (i == 7) "text 3" else s"text $i"))

  test("every anchor gets exactly k negatives with dense ranks") {
    val out = NegativeSampling.sample(docs.toDF("id", "text"), "id", "text", k = 3, salt = "s")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(3)))
    out.groupBy(_._1).foreach { case (_, rows) =>
      rows.map(_._2).sorted.toSeq shouldBe Seq(1, 2, 3)
    }
    out.length shouldBe 20 * 3
  }

  test("negatives never include self or an exact-dup twin") {
    // docs 3 and 7 share text: neither may draw the other or itself.
    val out = NegativeSampling.sample(docs.toDF("id", "text"), "id", "text", k = 5, salt = "s")
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    out.foreach { case (a, n) => assert(a != n) }
    out.filter(_._1 == 3L).map(_._2) should not contain 7L
    out.filter(_._1 == 7L).map(_._2) should not contain 3L
  }

  test("draws are deterministic in the salt") {
    val df = docs.toDF("id", "text")
    val a = NegativeSampling.sample(df, "id", "text", 3, "s").collect().toSeq
    val b = NegativeSampling.sample(df, "id", "text", 3, "s").collect().toSeq
    val c = NegativeSampling.sample(df, "id", "text", 3, "other").collect().toSeq
    a shouldBe b
    a should not be c
  }
}
