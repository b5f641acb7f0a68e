package graft.delivery

import graft.SparkTestSession
import graft.cdc.{ChangeCapture, Emp, SnapshotDiff}
import graft.model.TriggerConfig
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's delivery-behavior tests (SURVEY §5): payload
  * arrival, retry counts, timeout classification, unreachable endpoints,
  * cancel-vs-warn on exhausted retries. */
class WebhookSinkSpec extends AnyFunSuite with SparkTestSession with BeforeAndAfterAll {
  import spark.implicits._

  private var server: CaptureServer = _
  override def beforeAll(): Unit = { server = new CaptureServer }
  override def afterAll(): Unit = server.stop()

  private def cfg(url: String, retries: Int = 0, interval: Int = 1,
                  backoff: String = "LINEAR", cancel: Boolean = false,
                  timeout: Int = 10) = TriggerConfig(
    name = "t", tableName = "employees", operations = Seq("INSERT", "UPDATE", "DELETE"),
    webhookUrl = url, headers = Map("X-API-Key" -> "test-key"),
    retryNumber = retries, retryInterval = interval, retryBackoff = backoff,
    cancelOnFailure = cancel, timeout = timeout)

  private def envelopes(c: TriggerConfig) = ChangeCapture.capture(
    SnapshotDiff.diff(
      Seq(Emp(2, "bob", 200)).toDF(),
      Seq(Emp(1, "alice", 100), Emp(2, "bob", 250)).toDF(),
      Seq("id")), c)

  test("test_basic_insert/all_operations: payloads arrive with envelope fields") {
    server.received.clear()
    val c = cfg(server.url)
    WebhookSink.deliverBatch(envelopes(c), c)
    val bodies = server.bodies
    assert(bodies.length == 2)
    // row images are JSON *strings* (row_to_json parity) ⇒ inner quotes escaped
    assert(bodies.exists(b => b.contains(""""op":"INSERT"""") && b.contains("alice")))
    assert(bodies.exists(b => b.contains(""""op":"UPDATE"""") && b.contains("250")))
    assert(bodies.forall(b => b.contains(""""table":{"schema":"public","name":"employees"}""")))
    // custom + content-type headers delivered (reference src/cdc_webhook.c:196-198)
    val it = server.received.iterator()
    while (it.hasNext) {
      val h = it.next()._2
      assert(h("X-api-key") == "test-key" || h.getOrElse("X-API-Key", "") == "test-key")
      assert(h.exists { case (k, v) => k.equalsIgnoreCase("content-type") &&
        v == "application/json" })
    }
  }

  test("test_retries: exactly retry_number+1 attempts, then success on last") {
    server.received.clear()
    server.failFirst.set(2)
    val c = cfg(server.url, retries = 2, interval = 1)
    val out = WebhookSink.deliverPayload(c, JdkHttpPoster, c.webhookUrl, c.headers,
      "e1", """{"probe":1}""")
    assert(out.success && out.attemptCount == 3)
    assert(server.bodies.count(_.contains("probe")) == 3) // server saw every attempt
  }

  test("test_exponential_backoff: attempts spaced by growing delays") {
    server.received.clear()
    server.failFirst.set(2)
    val c = cfg(server.url, retries = 2, interval = 1, backoff = "EXPONENTIAL")
    val t0 = System.nanoTime()
    val out = WebhookSink.deliverPayload(c, JdkHttpPoster, c.webhookUrl, c.headers,
      "e2", """{"probe":2}""")
    val elapsed = (System.nanoTime() - t0) / 1e9
    assert(out.success && out.attemptCount == 3)
    assert(elapsed >= 3.0) // sleeps 1s + 2s
  }

  test("test_webhook_timeout: slow endpoint ⇒ failed attempt, DML-blocking ≈ timeout") {
    server.responseDelayMs = 2000
    try {
      val c = cfg(server.url, timeout = 1)
      val t0 = System.nanoTime()
      val out = WebhookSink.deliverPayload(c, JdkHttpPoster, c.webhookUrl, c.headers,
        "e3", """{"probe":3}""")
      val elapsed = (System.nanoTime() - t0) / 1e9
      assert(!out.success && out.lastStatus == 0)
      assert(elapsed >= 0.9 && elapsed < 2.0) // blocked ≈ timeout, not server delay
    } finally server.responseDelayMs = 0
  }

  test("test_unreachable_webhook_without_cancellation: batch completes (WARN path)") {
    val c = cfg("http://127.0.0.1:1/webhook") // connection refused
    WebhookSink.deliverBatch(envelopes(c), c) // must not throw
  }

  test("test_unreachable_webhook_with_cancellation / cancel_on_failure: batch aborts") {
    val c = cfg("http://127.0.0.1:1/webhook", cancel = true)
    val ex = intercept[Exception](WebhookSink.deliverBatch(envelopes(c), c))
    // P6: the error mentions the placeholder, never the header value
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: chain(t.getCause)
    val msgs = chain(ex).mkString("; ")
    assert(msgs.contains("webhook_headers") || ex.getMessage.contains("aborted"))
    assert(!msgs.contains("test-key"))
  }
}
