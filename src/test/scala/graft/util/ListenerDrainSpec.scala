package graft.util

import graft.SharedSpark
import org.scalatest.funsuite.AnyFunSuite

class ListenerDrainSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("the reflective waitUntilEmpty path works against this Spark version (no silent sleep fallback)") {
    // The profiler's attribution correctness rests on the drain really
    // draining — a false return means it silently degraded to the racy
    // fixed sleep, which is exactly the bug it replaced. Run a job
    // first so there are events in flight.
    spark.range(0, 1000).count()
    assert(ListenerDrain.drain(spark),
      "LiveListenerBus.waitUntilEmpty(long) no longer reachable reflectively — update ListenerDrain")
  }
}
