package graft.queue

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkTestSession
import graft.cdc.{ChangeCapture, Emp, SnapshotDiff}
import graft.delivery.CaptureServer
import graft.model.TriggerConfig
import graft.queue.EventLog.QueueRow
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** ASYNC mode end-to-end: enqueue → durable PENDING → dispatcher cycles with
  * next_attempt rescheduling → DELIVERED / FAILED with attempt history
  * (completing the reference worker's TODO drain loop against its own
  * event_log schema). */
class DispatcherSpec extends AnyFunSuite with SparkTestSession with BeforeAndAfterAll {
  import spark.implicits._

  private var server: CaptureServer = _
  override def beforeAll(): Unit = { server = new CaptureServer }
  override def afterAll(): Unit = server.stop()

  private def asyncCfg(url: String, retries: Int = 2) = TriggerConfig(
    name = "async_t", tableName = "employees",
    operations = Seq("INSERT", "UPDATE", "DELETE"), webhookUrl = url,
    headers = Map("X-API-Key" -> "qkey"), mode = "ASYNC",
    retryNumber = retries, retryInterval = 2, retryBackoff = "EXPONENTIAL")

  private def freshQueue(c: TriggerConfig): String = {
    val dir = Files.createTempDirectory("graft_queue_").toString + "/event_log"
    val env = ChangeCapture.capture(
      SnapshotDiff.diff(
        Seq(Emp(2, "bob", 200)).toDF(),
        Seq(Emp(1, "alice", 100), Emp(2, "bob", 250)).toDF(),
        Seq("id")), c)
    EventLog.enqueue(env, c, dir)
    dir
  }

  private def rows(dir: String): Seq[QueueRow] =
    EventLog.read(spark, dir).as[QueueRow].collect().toSeq

  test("enqueue: durable PENDING rows carry config + payload + empty history") {
    val dir = freshQueue(asyncCfg(server.url))
    val rs = rows(dir)
    assert(rs.length == 2)
    assert(rs.forall(r => r.status == "PENDING" && r.attempt_count == 0 &&
      r.attempts_time.isEmpty && r.retry_number == 2 &&
      r.retry_backoff == "EXPONENTIAL" && r.trigger_name == "async_t" &&
      r.payload.contains(""""op":""")))
  }

  test("not-due rows are untouched (next_attempt scheduling respected)") {
    val dir = freshQueue(asyncCfg(server.url))
    val past = new Timestamp(System.currentTimeMillis() - 3600 * 1000L)
    val stats = Dispatcher.runOnce(spark, dir, now = past)
    assert(stats.due == 0)
    assert(rows(dir).forall(_.status == "PENDING"))
  }

  test("happy path: due PENDING → DELIVERED with one recorded attempt") {
    server.received.clear()
    val dir = freshQueue(asyncCfg(server.url))
    val enqueued = rows(dir)
    // the cycle clock is strictly after enqueue, so the audit touch is observable
    val cycleAt = new Timestamp(enqueued.map(_.updated_at.getTime).max + 1000L)
    val stats = Dispatcher.runOnce(spark, dir, now = cycleAt)
    assert(stats.due == 2 && stats.delivered == 2 && stats.failed == 0)
    val rs = rows(dir)
    assert(rs.forall(r => r.status == "DELIVERED" && r.attempt_count == 1 &&
      r.attempts_status == Seq(200) && r.attempts_time.length == 1))
    // updated_at advances on the PENDING→terminal transition (the
    // reference's audit trigger, cdc_webhook--1.0.sql:87-100) while
    // created_at stays the enqueue time
    assert(rs.forall(r => r.updated_at == cycleAt && r.updated_at.after(r.created_at)))
    assert(server.bodies.length == 2)
  }

  test("failure path: reschedules with backoff then FAILS after retry_number+1 attempts") {
    val dir = freshQueue(asyncCfg("http://127.0.0.1:1/webhook", retries = 2))
    val t0 = System.currentTimeMillis()

    val s1 = Dispatcher.runOnce(spark, dir, now = new Timestamp(t0))
    assert(s1.due == 2 && s1.rescheduled == 2)
    val r1 = rows(dir)
    assert(r1.forall(r => r.status == "PENDING" && r.attempt_count == 1))
    // EXPONENTIAL interval=2, first retry delay = 2s
    assert(r1.forall(_.next_attempt.getTime == t0 + 2000))

    // advance injected clock past each scheduled retry — no real sleeping
    val s2 = Dispatcher.runOnce(spark, dir, now = new Timestamp(t0 + 2000))
    assert(s2.due == 2 && s2.rescheduled == 2)
    val r2 = rows(dir)
    assert(r2.forall(r => r.attempt_count == 2 &&
      r.next_attempt.getTime == t0 + 2000 + 4000)) // second delay = 4s

    val s3 = Dispatcher.runOnce(spark, dir, now = new Timestamp(t0 + 7000))
    assert(s3.due == 2 && s3.failed == 2)
    val r3 = rows(dir)
    assert(r3.forall(r => r.status == "FAILED" && r.attempt_count == 3 &&
      r.attempts_status == Seq(0, 0, 0) && r.attempts_time.length == 3 &&
      r.attempts_response.length == 3))
  }

  test("mixed queue: delivered rows stay DELIVERED across later cycles") {
    server.received.clear()
    val dir = freshQueue(asyncCfg(server.url))
    Dispatcher.runOnce(spark, dir)
    val stats2 = Dispatcher.runOnce(spark, dir)
    assert(stats2.due == 0)
    assert(rows(dir).forall(_.status == "DELIVERED"))
  }
}
