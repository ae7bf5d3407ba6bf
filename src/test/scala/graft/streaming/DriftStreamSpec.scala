package graft.streaming

import graft.SharedSpark
import graft.streaming.DriftStream.{DriftOut, DriftPoint}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

class DriftStreamSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val k = 9L
  private val h = 10L

  private def mkPoints(groups: Seq[String], periods: Range): Seq[DriftPoint] =
    for (g <- groups; p <- periods)
      yield DriftPoint(g, p.toLong, (p * 37 % 19 + g.hashCode.abs % 5).toLong)

  private def runStream(dir: String, ckpt: String, out: String): Unit = {
    val src = spark.readStream
      .schema("group STRING, period_idx BIGINT, n BIGINT")
      .parquet(dir).as[DriftPoint]
    // Parquet sink, not memory: the memory sink cannot RESUME from a
    // checkpoint, and state carry-over across runs is the point here.
    val q = DriftStream.cusumStream(src, k, h)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
  }

  test("streaming cusum across RESUMED runs equals the batch grouped cusum") {
    val base = java.nio.file.Files.createTempDirectory("drift").toString
    val dir = s"$base/in"; val ckpt = s"$base/ckpt"; val out = s"$base/out"
    val groups = Seq("click", "view", "err")
    val first = mkPoints(groups, 0 until 12)
    val second = mkPoints(groups, 12 until 25)
    // First run processes periods 0-11; the second (same checkpoint)
    // sees only the NEW file — state must carry s across runs.
    first.toDS().repartition(1).write.mode("append").parquet(dir)
    runStream(dir, ckpt, out)
    second.toDS().repartition(1).write.mode("append").parquet(dir)
    runStream(dir, ckpt, out)
    val streamed = spark.read.parquet(out).as[DriftOut].collect()
      .map(o => (o.group, o.period_idx) -> (o.cusum, o.alarm)).toMap
    val batch = graft.ops.Anomaly.cusumByGroup(
        (first ++ second).toDF("g", "t", "v"), "g", "t", "v", k, h)
      .select($"g", $"t", $"cusum", $"alarm")
      .as[(String, Long, Long, Boolean)].collect()
      .map { case (g, t, c, a) => (g, t) -> (c, a) }.toMap
    assert(streamed.size == groups.size * 25)
    assert(streamed == batch,
      "stream (with a state-carrying resume) must equal the batch grouped cusum")
  }

  test("an out-of-order period fails the query loudly instead of corrupting the statistic") {
    val base = java.nio.file.Files.createTempDirectory("drift_ooo").toString
    val dir = s"$base/in"; val ckpt = s"$base/ckpt"; val out = s"$base/out"
    Seq(DriftPoint("g", 5L, 10L), DriftPoint("g", 6L, 10L))
      .toDS().repartition(1).write.mode("append").parquet(dir)
    runStream(dir, ckpt, out)
    // A later file replays period 5 — at or before the processed 6.
    Seq(DriftPoint("g", 5L, 99L)).toDS().repartition(1).write.mode("append").parquet(dir)
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runStream(dir, ckpt, out)
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("ordered closed-period stream")),
      s"expected the loud order contract, got: ${messages(ex)}")
  }
}
