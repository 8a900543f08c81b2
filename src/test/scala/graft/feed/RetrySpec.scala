package graft.feed

import org.scalatest.funsuite.AnyFunSuite

/** ST6 backoff contract vs the reference schedule
  * (cmd/worker/worker.go:75-91). */
class RetrySpec extends AnyFunSuite {

  test("backoff schedule is min(1000, 2^attempt) ms — the reference formula") {
    assert((0 to 11).map(Retry.backoffMs(_)) ==
      Seq(1L, 2L, 4L, 8L, 16L, 32L, 64L, 128L, 256L, 512L, 1000L, 1000L))
  }

  test("transient failures retry with the schedule, then succeed") {
    val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
    var calls = 0
    val out = Retry.withBackoff(maxRetries = 5, sleep = slept.append(_)) {
      calls += 1
      if (calls < 3) throw new java.io.IOException("flaky store")
      "ok"
    }
    assert(out == "ok" && calls == 3)
    assert(slept.toSeq == Seq(1L, 2L)) // attempts 0 and 1 backed off
  }

  test("budget exhaustion rethrows the last failure after maxRetries sleeps") {
    val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
    var calls = 0
    val e = intercept[java.io.IOException] {
      Retry.withBackoff(maxRetries = 3, sleep = slept.append(_)) {
        calls += 1; throw new java.io.IOException(s"always down $calls")
      }
    }
    assert(e.getMessage == "always down 4") // 1 try + 3 retries
    assert(slept.toSeq == Seq(1L, 2L, 4L))
  }

  test("non-transient (analysis) errors propagate immediately, no retry") {
    var calls = 0
    intercept[org.apache.spark.sql.AnalysisException] {
      Retry.withBackoff(maxRetries = 5, sleep = _ => fail("must not sleep")) {
        calls += 1
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "INTERNAL_ERROR",
          messageParameters = Map("message" -> "planning bug"),
          cause = None)
      }
    }
    assert(calls == 1)
  }
}
