package graft.util

import graft.SharedSpark
import org.scalatest.funsuite.AnyFunSuite

class ListenerDrainSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("the reflective waitUntilEmpty path works against this Spark version (no silent sleep fallback)") {
    // The profiler's attribution correctness rests on the drain really
    // draining — anything but Drained means it degraded, and the THREE
    // states matter: TimedOut is a loaded box (bus found, still
    // posting), Unreachable is the API moving. Run a job first so
    // there are events in flight.
    spark.range(0, 1000).count()
    ListenerDrain.drainDetailed(spark) match {
      case ListenerDrain.Drained => // the contract
      case ListenerDrain.TimedOut(ms) =>
        fail(s"listener bus did not empty within $ms ms on an idle test JVM — investigate")
      case ListenerDrain.Unreachable(detail) =>
        fail(s"LiveListenerBus.waitUntilEmpty(long) no longer reachable reflectively — update ListenerDrain ($detail)")
    }
    assert(ListenerDrain.drain(spark), "boolean convenience must mirror Drained")
  }

  test("a drain timeout classifies as TimedOut, not as an API move") {
    // Force the timeout path deterministically: a 0 ms budget with
    // events in flight. waitUntilEmpty throws TimeoutException wrapped
    // in InvocationTargetException — the classifier must unwrap it;
    // conflating it with Unreachable would silently reinstate the racy
    // 300 ms sleep on exactly the loaded-box case the drain exists for.
    spark.range(0, 100000).count()
    val r = ListenerDrain.drainDetailed(spark, timeoutMs = 0L)
    assert(r == ListenerDrain.Drained || r == ListenerDrain.TimedOut(0L),
      s"0 ms drain must be Drained (bus happened to be empty) or TimedOut, never Unreachable: $r")
  }
}
