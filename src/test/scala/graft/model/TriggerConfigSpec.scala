package graft.model

import org.scalatest.funsuite.AnyFunSuite

/** V1-V8 validation predicates (reference `cdc_webhook--1.0.sql:146-182`,
  * behaviors pinned by `tests/test_invalid_trigger_parameters.py`). */
class TriggerConfigSpec extends AnyFunSuite {
  private def base = TriggerConfig(
    name = "t", tableName = "employees",
    operations = Seq("INSERT", "UPDATE", "DELETE"),
    webhookUrl = "http://localhost:9/hook")

  test("valid config constructs with reference defaults") {
    val c = base
    assert(c.timeout == 10 && c.retryNumber == 3 && c.retryInterval == 1)
    assert(c.retryBackoff == "LINEAR" && c.security == "NONE")
    assert(c.triggerTiming == "AFTER" && c.mode == "SYNC" && !c.cancelOnFailure)
  }

  test("V1: invalid timing rejected") {
    assertThrows[IllegalArgumentException](base.copy(triggerTiming = "DURING"))
  }
  test("V2: invalid backoff rejected") {
    assertThrows[IllegalArgumentException](base.copy(retryBackoff = "QUADRATIC"))
  }
  test("V3: invalid security rejected") {
    assertThrows[IllegalArgumentException](base.copy(security = "PUBLIC"))
  }
  test("V4: invalid mode rejected") {
    assertThrows[IllegalArgumentException](base.copy(mode = "BATCH"))
  }
  test("V5: ASYNC with cancel_on_failure rejected") {
    assertThrows[IllegalArgumentException](
      base.copy(mode = "ASYNC", cancelOnFailure = true))
    base.copy(mode = "ASYNC") // without cancel: fine
  }
  test("V6: negative retry_number rejected") {
    assertThrows[IllegalArgumentException](base.copy(retryNumber = -1))
  }
  test("V7: zero retry_interval rejected") {
    assertThrows[IllegalArgumentException](base.copy(retryInterval = 0))
  }
  test("V8: empty operations rejected") {
    assertThrows[IllegalArgumentException](base.copy(operations = Nil))
  }
  test("unknown operation rejected") {
    assertThrows[IllegalArgumentException](base.copy(operations = Seq("TRUNCATE")))
  }
  test("empty updateColumns disables tracking gate") {
    assert(!base.tracksColumns)
    assert(base.copy(updateColumns = Seq("salary")).tracksColumns)
  }
}
