package graft.pipeline

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.concurrent.Eventually.{eventually, interval, timeout}
import org.scalatest.time.{Millis, Seconds, Span}

class ObserveSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("observations ride the action's own pass and reconcile stage counts") {
    val c = Observe.attach(spark)
    try {
      val input = Observe.stage(
        (1 to 100).map(i => (i.toLong, i % 7)).toDF("id", "grp"), "obs_input",
        Seq(sum(when($"grp" === 0, 1L).otherwise(0L)).as("grp0")))
      val kept = Observe.stage(input.filter($"grp" =!= 0), "obs_kept")
      val gated = Observe.stage(input.filter($"grp" === 0), "obs_gated")
      // One action per branch; each collects its own lineage's observations.
      assert(kept.count() == 86)
      assert(gated.count() == 14)
      // Listener-bus delivery is async.
      eventually(timeout(Span(10, Seconds)), interval(Span(50, Millis))) {
        assert(c.metrics("obs_kept").map(_("rows")) == Some(86L))
        assert(c.metrics("obs_gated").map(_("rows")) == Some(14L))
        assert(c.metrics("obs_input").map(_("grp0")) == Some(14L))
        assert(Observe.reconciles(c, "obs_input", "obs_kept", "obs_gated"))
      }
    } finally spark.listenerManager.unregister(c)
  }
}
