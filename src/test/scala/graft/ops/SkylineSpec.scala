package graft.ops

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class SkylineSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("hand case: dominated points drop, frontier ties all survive") {
    val pts = Seq(
      (1L, 9L, "a"), // frontier (max d2)
      (5L, 5L, "b"), // frontier
      (5L, 5L, "c"), // exact tie of b — must survive too
      (9L, 1L, "d"), // frontier (max d1)
      (4L, 5L, "e"), // dominated by b (5,5)
      (5L, 4L, "f"), // dominated by b
      (1L, 1L, "g")  // dominated by everything
    ).toDF("d1", "d2", "tag")
    val got = Skyline.frontier2d(pts, "d1", "d2")
      .select("tag").as[String].collect().sorted
    got.toSeq shouldBe Seq("a", "b", "c", "d")
  }

  test("matches the quadratic dominance definition on irregular data across partitions") {
    val rows = (0 until 300).map { i =>
      ((i * 37 % 50).toLong, (i * 53 % 41).toLong, i.toLong)
    }
    val got = Skyline.frontier2d(rows.toDF("d1", "d2", "id").repartition(7), "d1", "d2")
      .select("id").as[Long].collect().toSet
    val brute = rows.filter { case (x, y, _) =>
      !rows.exists { case (x2, y2, _) =>
        x2 >= x && y2 >= y && (x2 > x || y2 > y)
      }
    }.map(_._3).toSet
    got shouldBe brute
  }

  test("single point and all-equal sets are their own frontier") {
    Skyline.frontier2d(Seq((3L, 4L)).toDF("d1", "d2"), "d1", "d2")
      .count() shouldBe 1L
    Skyline.frontier2d(Seq((2L, 2L), (2L, 2L), (2L, 2L)).toDF("d1", "d2"), "d1", "d2")
      .count() shouldBe 3L
  }

  test("per-group frontier equals the global frontier run per group") {
    val rows = (0 until 200).map { i =>
      (s"g${i % 3}", (i * 37 % 20).toLong, (i * 53 % 17).toLong, i.toLong)
    }
    val got = Skyline.frontier2dByGroup(
        rows.toDF("g", "d1", "d2", "id").repartition(5), "g", "d1", "d2")
      .select("id").as[Long].collect().toSet
    val expect = rows.groupBy(_._1).values.flatMap { grp =>
      grp.filter { case (_, x, y, _) =>
        !grp.exists { case (_, x2, y2, _) => x2 >= x && y2 >= y && (x2 > x || y2 > y) }
      }.map(_._4)
    }.toSet
    got shouldBe expect
  }

  test("NULL dimensions fail loud") {
    val withNull = spark.sql("SELECT 1L AS d1, CAST(NULL AS BIGINT) AS d2")
    val e = intercept[Exception] {
      Skyline.frontier2d(withNull, "d1", "d2").collect()
    }
    e.getMessage should include("NULL d2")
  }
}
