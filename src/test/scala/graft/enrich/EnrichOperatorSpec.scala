package graft.enrich

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-client-instance state for the heal-on-retry test: the retry
  * pass builds FRESH clients per partition, so "garbage once, valid
  * afterwards" needs JVM-wide state (fine under local mode).
  */
object FlakyJsonState {
  val tries = new java.util.concurrent.atomic.AtomicInteger(0)
}

class EnrichOperatorSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("transient failures recover via in-partition retry; metrics count the extra calls") {
    val df = (1L to 50L).toDF("k").withColumn("__p", $"k".cast("string"))
    val m = EnrichOperator.Metrics(df, "test")
    val out = EnrichOperator.enrich(df, "__p", () => new MockBeneficiaryClient(transientEvery = 7),
      EnrichOperator.Config(parallelism = 2, maxAttempts = 2), Some(m))
    assert(out.filter($"status" === "error").count() == 0)
    val transientKeys = (1L to 50L).count(_ % 7 == 0)
    assert(m.calls.value == 50 + transientKeys)
    assert(m.failures.value == transientKeys)
  }

  test("default config widens with the cluster: partition count = defaultParallelism") {
    val df = (1L to 100L).toDF("k").withColumn("__p", $"k".cast("string"))
    val out = EnrichOperator.enrich(df, "__p", () => new MockBeneficiaryClient(0))
    assert(out.rdd.getNumPartitions == spark.sparkContext.defaultParallelism,
      "unset parallelism must follow the cluster, not a hard-coded constant")
    val explicit = EnrichOperator.enrich(df, "__p", () => new MockBeneficiaryClient(0),
      EnrichOperator.Config(parallelism = 3))
    assert(explicit.rdd.getNumPartitions == 3, "explicit override still wins")
  }

  test("terminal errors surface as values, not exceptions") {
    val df = (1L to 33L).toDF("v").withColumn("__p", $"v".cast("string"))
    val out = EnrichOperator.enrich(df, "__p", () => new MockEligibilityClient(),
      EnrichOperator.Config(parallelism = 2))
    val errs = out.filter($"status" === "error").select($"v").as[Long].collect().toSet
    assert(errs == (1L to 33L).filter(_ % 11 == 0).toSet)
    assert(out.filter($"status" === "error" && $"message".contains("timeout")).count() == errs.size)
  }

  test("enrich is idempotent: two runs produce identical results") {
    val df = (1L to 40L).toDF("k").withColumn("__p", $"k".cast("string"))
    def run() = EnrichOperator.enrich(df, "__p", () => new MockBeneficiaryClient(0),
      EnrichOperator.Config(parallelism = 3)).select($"k", $"response").collect().toSet
    assert(run() == run())
  }

  test("enrichUniqueKeys calls once per distinct key, not per row") {
    val df = Seq(1L, 1L, 1L, 2L, 2L, 3L).toDF("iqama")
    val m = EnrichOperator.Metrics(df, "uniq")
    val out = EnrichOperator.enrichUniqueKeys(df, "iqama", () => new MockBeneficiaryClient(0),
      EnrichOperator.Config(parallelism = 2), Some(m))
    assert(out.count() == 6)
    assert(m.calls.value == 3)
  }

  test("rate limiter paces calls per partition") {
    val df = (1L to 10L).toDF("k").withColumn("__p", $"k".cast("string"))
    val t0 = System.nanoTime()
    EnrichOperator.enrich(df, "__p", () => new MockBeneficiaryClient(0),
      EnrichOperator.Config(parallelism = 1, ratePerSec = 100.0)).count()
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(elapsedMs >= 80, s"10 calls at 100/s in one partition should take >=~90ms, took $elapsedMs")
  }

  test("withRetryPass marks persistent failures with the terminal message") {
    val df = Seq(97L, 98L).toDF("v")
      .withColumn("__p", concat($"v".cast("string"), lit("|1,2")))
    val first = EnrichOperator.enrich(df, "__p", () => new MockLlmClient(), EnrichOperator.Config(parallelism = 1))
    val out = EnrichOperator.withRetryPass(first, "__p", () => new MockLlmClient(), EnrichOperator.Config(parallelism = 1))
    val byVisit = out.select($"v", $"status", $"message").collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(byVisit(97L) == ("error", "Failed to reach LLM"))
    assert(byVisit(98L)._1 == "ok")
  }

  test("checkpoint record + filterNew resumes exactly where it left off") {
    val tmp = java.nio.file.Files.createTempDirectory("ckpt_spec").toString
    val ckpt = new Checkpoint(spark, tmp, "id")
    val all = (1L to 20L).toDF("id")
    assert(ckpt.filterNew(all).count() == 20, "empty checkpoint passes everything")
    ckpt.record(all.filter($"id" <= 8), "run1")
    assert(ckpt.filterNew(all).as[Long].collect().toSet == (9L to 20L).toSet)
    ckpt.record(all.filter($"id" > 8), "run2")
    assert(ckpt.filterNew(all).count() == 0)
  }

  test("checkpoint store with only _temporary crash debris reads as empty, not wedged") {
    // A first record() that crashed mid-write leaves files only under
    // _temporary/ — Spark's reader ignores them, so the probe must
    // classify the store as empty instead of attempting a read that
    // fails schema inference on every subsequent batch.
    val tmp = java.nio.file.Files.createTempDirectory("ckpt_debris").toString
    // An underscore-prefixed dir distinct from the live committer's
    // own _temporary, so the later REAL write can't collide with the
    // planted debris (the probe treats any hidden segment the same).
    val debris = java.nio.file.Paths.get(tmp, "_abandoned_attempt", "0")
    java.nio.file.Files.createDirectories(debris)
    java.nio.file.Files.writeString(debris.resolve("part-00000.parquet"), "not parquet")
    val ckpt = new Checkpoint(spark, tmp, "id")
    assert(ckpt.filterNew((1L to 5L).toDF("id")).count() == 5,
      "crash debris must read as an empty store")
    // A real record afterwards works normally.
    ckpt.record((1L to 2L).toDF("id"), "run1")
    assert(ckpt.filterNew((1L to 5L).toDF("id")).as[Long].collect().toSet == (3L to 5L).toSet)
  }

  test("LlmFanout.predict: rejection map exploded and joined back to claims") {
    val claims = Seq((1L, 10L), (1L, 11L), (2L, 25L), (97L, 970L))
      .toDF("visit_id", "uid")
    val out = LlmFanout.predict(claims, "visit_id", "uid", () => new MockLlmClient(),
        EnrichOperator.Config(parallelism = 2))
      .select($"uid", $"medical_prediction").as[(Long, String)].collect().toMap
    assert(out(10L) == "Rejected")
    assert(out(11L) == "Approved")
    assert(out(25L) == "Rejected")
    assert(out(970L) == "Failed to reach LLM")
  }

  test("LlmFanout: unparseable-but-HTTP-ok responses retry, then terminally fail — never approve") {
    // The reference treats a JSONDecodeError like a transport failure
    // (predictions.py:276-288): failed visit -> retry -> terminal
    // "Failed to reach LLM". An ok-status response that no repair
    // strategy can parse must NOT collapse to an empty rejection map
    // (which downstream reads as "LLM approved everything").
    val claims = (1L to 8L).map(v => (v, v * 10)).toDF("visit_id", "uid")
    val m = EnrichOperator.Metrics(claims, "parsefail")
    val garbage = () => new ServiceClient {
      override def call(payload: String): Either[String, String] = {
        val visit = payload.split('|')(0).toLong
        if (visit == 7L) Right("I am sorry, I cannot help with that request.")
        else Right("""{"Rejected": {}}""")
      }
    }
    val out = LlmFanout.predict(claims, "visit_id", "uid", garbage,
        EnrichOperator.Config(parallelism = 2), Some(m))
      .select($"uid", $"medical_prediction").as[(Long, String)].collect().toMap
    assert(out(70L) == "Failed to reach LLM", "a parse failure must never default to Approved")
    assert((1L to 8L).filterNot(_ == 7L).forall(v => out(v * 10) == "Approved"),
      "parsed-but-empty rejection maps stay Approved: " + out)
    assert(m.calls.value == 9, s"the parse-failed visit must get exactly one retry call, calls=${m.calls.value}")
  }

  test("LlmFanout: a parse failure that repairs on retry contributes its entries normally") {
    FlakyJsonState.tries.set(0)
    val claims = Seq((7L, 70L), (7L, 71L), (2L, 20L)).toDF("visit_id", "uid")
    val healing = () => new ServiceClient {
      override def call(payload: String): Either[String, String] = {
        val visit = payload.split('|')(0).toLong
        if (visit == 7L && FlakyJsonState.tries.getAndIncrement() == 0)
          Right("json coming right up!") // first attempt: no JSON anywhere
        else if (visit == 7L)
          Right("""{"Rejected": {"70": "service 70 is a duplicate order"}}""")
        else Right("""{"Rejected": {}}""")
      }
    }
    val out = LlmFanout.predict(claims, "visit_id", "uid", healing,
        EnrichOperator.Config(parallelism = 1))
      .select($"uid", $"medical_prediction").as[(Long, String)].collect().toMap
    assert(out(70L) == "Rejected", "the healed retry's entries must flow like any other visit")
    assert(out(71L) == "Approved")
    assert(out(20L) == "Approved")
  }

  test("LlmFanout.justify: parse failures surface as the terminal justification marker") {
    // C5 shares explodeCalls with predict, but its downstream labeling
    // differs (justification column, not medical_prediction) — pin the
    // parse-failure contract on this face too.
    val claims = Seq((3L, 30L), (9L, 90L)).toDF("visit_id", "uid")
    val garbage = () => new ServiceClient {
      override def call(payload: String): Either[String, String] = {
        val visit = payload.split('|')(0).toLong
        if (visit == 9L) Right("no json here, ever")
        else Right("""{"Justifications": {"30": "clinically indicated"}}""")
      }
    }
    val out = LlmFanout.justify(claims, "visit_id", "uid", garbage,
        EnrichOperator.Config(parallelism = 1))
      .select($"uid", $"justification").as[(Long, String)].collect().toMap
    assert(out(30L) == "clinically indicated")
    assert(out(90L) == "Failed to reach LLM",
      "a parse-failed visit must carry the terminal marker, not a null justification")
  }

  test("no-diagnosis visits are identified for auto-reject (B18 gate)") {
    val claims = Seq((1L, Some("J10")), (1L, None), (2L, Some("K21"))).toDF("visit_id", "icd10")
    val v = LlmFanout.noDiagnosisVisits(claims, "visit_id", "icd10").as[Long].collect().toSet
    assert(v == Set(1L))
  }

  test("circuit breaker trips after the streak and stops calling the service") {
    val alwaysFail = () => new ServiceClient {
      override def call(payload: String): Either[String, String] = Left("endpoint down")
    }
    val df = (1L to 40L).toDF("k").withColumn("__p", $"k".cast("string"))
    val m = EnrichOperator.Metrics(df, "breaker")
    val out = EnrichOperator.enrich(df, "__p", alwaysFail,
      EnrichOperator.Config(parallelism = 1, maxAttempts = 2, breakerThreshold = 3), Some(m))
      .groupBy("status").count().as[(String, Long)].collect().toMap
    assert(out("error") == 3 && out("skipped") == 37, out.toString)
    // Only the 3 tripping rows hit the wire (x maxAttempts retries).
    assert(m.calls.value == 6, s"calls = ${m.calls.value}")
    val msg = EnrichOperator.enrich(df, "__p", alwaysFail,
      EnrichOperator.Config(parallelism = 1, maxAttempts = 1, breakerThreshold = 1))
      .filter($"status" === "skipped").select("message").as[String].head()
    assert(msg.contains("circuit open"))
  }

  test("withRetryPass preserves circuit-broken rows: skipped rows retry, none vanish") {
    // First pass dies after 2 failures and skips the rest; the retry
    // pass (healthy service) must pick the skipped rows up — the old
    // error-only filter silently DROPPED them, and LlmFanout's default
    // labeling then auto-approved the vanished visits.
    val alwaysFail = () => new ServiceClient {
      override def call(payload: String): Either[String, String] = Left("endpoint down")
    }
    val df = (1L to 10L).toDF("k").withColumn("__p", $"k".cast("string"))
    val first = EnrichOperator.enrich(df, "__p", alwaysFail,
      EnrichOperator.Config(parallelism = 1, maxAttempts = 1, breakerThreshold = 2))
    val m = EnrichOperator.Metrics(df, "retrypass")
    val out = EnrichOperator.withRetryPass(first, "__p", () => new MockBeneficiaryClient(0),
      EnrichOperator.Config(parallelism = 1), metrics = Some(m))
    assert(out.count() == 10, "every input row must survive the retry pass")
    assert(out.filter($"status" === "ok").count() == 10, "healthy retry heals skipped AND error rows")
    assert(m.calls.value == 10, "retry-pass calls must be billed to the metrics accumulators")
  }

  test("a success resets the breaker streak") {
    // Client alternates fail/ok by an internal counter: failures can
    // never run consecutively, so threshold 2 must never trip in any
    // row order.
    val flaky = () => new ServiceClient {
      private var n = 0
      override def call(payload: String): Either[String, String] = {
        n += 1
        if (n % 2 == 1) Left("odd call fails") else Right("{}")
      }
    }
    val out = EnrichOperator.enrich((1L to 30L).toDF("k").withColumn("__p", $"k".cast("string")),
      "__p", flaky,
      EnrichOperator.Config(parallelism = 1, maxAttempts = 1, breakerThreshold = 2))
      .groupBy("status").count().as[(String, Long)].collect().toMap
    assert(!out.contains("skipped"), out.toString)
    assert(out("error") == 15 && out("ok") == 15)
  }

  test("breaker disabled by default: every row is attempted") {
    val alwaysFail = () => new ServiceClient {
      override def call(payload: String): Either[String, String] = Left("down")
    }
    val out = EnrichOperator.enrich((1L to 20L).toDF("k").withColumn("__p", $"k".cast("string")),
      "__p", alwaysFail, EnrichOperator.Config(parallelism = 2, maxAttempts = 1))
      .groupBy("status").count().as[(String, Long)].collect().toMap
    assert(out("error") == 20 && !out.contains("skipped"))
  }
}
