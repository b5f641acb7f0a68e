package graft.delivery

import org.scalatest.funsuite.AnyFunSuite

/** Pins the reference's retry-delay spec (`src/cdc_webhook.c:103-109`,
  * `README.md:124-129`, defaults `BASELINE.md`). */
class BackoffSpec extends AnyFunSuite {
  test("LINEAR: constant interval (2s,2s,2s @ interval=2)") {
    assert(Backoff.schedule("LINEAR", 2, 3) == Seq(2L, 2L, 2L))
  }
  test("EXPONENTIAL: interval*2^n, n from 0 (2s,4s,8s @ interval=2)") {
    assert(Backoff.schedule("EXPONENTIAL", 2, 3) == Seq(2L, 4L, 8L))
  }
  test("reference defaults: 3 retries, 1s interval, LINEAR") {
    assert(Backoff.schedule("LINEAR", 1, 3) == Seq(1L, 1L, 1L))
  }
  test("schedule length equals retryNumber (sleeps between retry_number+1 attempts)") {
    assert(Backoff.schedule("EXPONENTIAL", 1, 0).isEmpty)
    assert(Backoff.schedule("LINEAR", 5, 7).length == 7)
  }
  test("unknown strategy rejected") {
    assertThrows[IllegalArgumentException](Backoff.delaySeconds("QUADRATIC", 1, 0))
  }
}
