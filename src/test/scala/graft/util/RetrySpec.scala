package graft.util

import graft.sources.Warehouse
import org.scalatest.funsuite.AnyFunSuite

class RetrySpec extends AnyFunSuite {

  test("withRetry returns on first success without sleeping") {
    var slept = 0L
    val out = Retry.withRetry(3, 100, sleep = slept += _)(42)
    assert(out == 42 && slept == 0)
  }

  test("withRetry retries with backoff then succeeds") {
    var calls = 0
    var sleeps = List.empty[Long]
    val out = Retry.withRetry(3, 100, backoffFactor = 2.0, sleep = s => sleeps :+= s) {
      calls += 1
      if (calls < 3) throw new RuntimeException("transient")
      "ok"
    }
    assert(out == "ok" && calls == 3 && sleeps == List(100L, 200L))
  }

  test("withRetry propagates cancellation immediately and re-asserts the interrupt flag") {
    var slept = 0L
    intercept[InterruptedException] {
      Retry.withRetry(3, 100, sleep = slept += _) { throw new InterruptedException("cancelled") }
    }
    assert(slept == 0, "a cancelled action must not back off and retry")
    assert(Thread.interrupted(), "the interrupt flag must be re-asserted (and cleared here)")
  }

  test("withRetry does not retry fatal errors") {
    var calls = 0
    intercept[OutOfMemoryError] {
      Retry.withRetry(3, 10, sleep = _ => ()) { calls += 1; throw new OutOfMemoryError("boom") }
    }
    assert(calls == 1, "a dying JVM must not be retried behind backoff")
  }

  test("withRetry exhausts and wraps the last error") {
    var calls = 0
    val e = intercept[Retry.RetriesExhausted] {
      Retry.withRetry(2, 10, sleep = _ => ()) { calls += 1; throw new RuntimeException(s"fail $calls") }
    }
    assert(e.attempts == 2 && e.getCause.getMessage == "fail 2")
  }

  test("reference retry policies: 2x300s read, 3x180s write") {
    var readSleeps = List.empty[Long]
    intercept[Retry.RetriesExhausted] {
      Retry.dbRead(s => readSleeps :+= s) { throw new RuntimeException("db down") }
    }
    assert(readSleeps == List(300000L))
    var writeSleeps = List.empty[Long]
    intercept[Retry.RetriesExhausted] {
      Retry.dbWrite(s => writeSleeps :+= s) { throw new RuntimeException("db down") }
    }
    assert(writeSleeps == List(180000L, 180000L))
  }

  test("warehouse option construction: pushdown query, chunked writes") {
    val conn = Warehouse.Conn("jdbc:sqlserver://wh.example:1433;db=dwh", "etl", "secret")
    val r = Warehouse.readOptions(conn, "SELECT * FROM VisitMgt.Visit WHERE CreatedDate > ?")
    assert(r("query").startsWith("SELECT") && r("fetchsize") == "1000" && r("pushDownPredicate") == "true")
    val w = Warehouse.writeOptions(conn, "dbo.Eligibility_dotcare")
    assert(w("dbtable") == "dbo.Eligibility_dotcare" && w("batchsize") == "1000")
  }
}
