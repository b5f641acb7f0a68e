package graft.queue

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import graft.SparkTestSession
import graft.cdc.{ChangeCapture, Emp, SnapshotDiff}
import graft.delivery.CaptureServer
import graft.model.TriggerConfig
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Crash-safety model of the dispatcher (SURVEY §3.3): a crash between
  * delivery and the queue snapshot-swap loses the status transition, so the
  * next cycle re-attempts the same rows — duplicates reach the endpoint.
  * That is the at-least-once contract the reference itself exhibits
  * (`tests/test_webhook_timeout.py:52-65`, T2); consumers dedupe on the
  * envelope id ([[graft.streaming.StatefulDedup]]). */
class QueueReplaySpec extends AnyFunSuite with SparkTestSession with BeforeAndAfterAll {
  import spark.implicits._

  private var server: CaptureServer = _
  override def beforeAll(): Unit = { server = new CaptureServer }
  override def afterAll(): Unit = server.stop()

  private def copyTree(src: String, dst: String): Unit = {
    val s = Paths.get(src)
    Files.walk(s).forEach { p =>
      val t = Paths.get(dst, s.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else {
        Files.createDirectories(t.getParent)
        Files.copy(p, t, StandardCopyOption.REPLACE_EXISTING)
      }
    }
  }

  private def deleteTree(dir: String): Unit = {
    val p = Paths.get(dir)
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
  }

  test("lost swap after delivery replays the cycle: at-least-once duplicates") {
    val cfg = TriggerConfig(
      name = "replay_t", tableName = "employees",
      operations = Seq("INSERT"), webhookUrl = server.url, mode = "ASYNC")
    val dir = Files.createTempDirectory("graft_replay_").toString + "/event_log"
    val env = ChangeCapture.capture(
      SnapshotDiff.diff(Seq.empty[Emp].toDF("id", "name", "salary"),
        Seq(Emp(1, "ann", 100), Emp(2, "ben", 200)).toDF(), Seq("id")), cfg)
    EventLog.enqueue(env, cfg, dir)

    val backup = Files.createTempDirectory("graft_replay_bk_").toString
    copyTree(dir, backup)

    server.received.clear()
    val first = Dispatcher.runOnce(spark, dir)
    assert(first.delivered == 2 && server.received.size() == 2)

    // the "crash": delivery happened but the queue state change is lost
    deleteTree(dir)
    copyTree(backup, dir)

    val second = Dispatcher.runOnce(spark, dir)
    assert(second.delivered == 2)
    assert(server.received.size() == 4, "replayed rows re-deliver (T2)")

    // duplicates share envelope ids — the consumer-side dedupe key
    val bodies = (0 until server.bodies.length).map(server.bodies)
    val ids = bodies.flatMap(b => """"id":"([0-9a-f-]+)"""".r
      .findFirstMatchIn(b).map(_.group(1)))
    assert(ids.distinct.size == 2 && ids.size == 4)
  }

  test("terminal history reader restores the exactly-once view after a partial crash") {
    val cfg = TriggerConfig(
      name = "replay_t2", tableName = "employees",
      operations = Seq("INSERT"), webhookUrl = server.url, mode = "ASYNC")
    val dir = Files.createTempDirectory("graft_replay2_").toString + "/event_log"
    val env = ChangeCapture.capture(
      SnapshotDiff.diff(Seq.empty[Emp].toDF("id", "name", "salary"),
        Seq(Emp(1, "ann", 100), Emp(2, "ben", 200)).toDF(), Seq("id")), cfg)
    EventLog.enqueue(env, cfg, dir)

    val backup = Files.createTempDirectory("graft_replay2_bk_").toString
    copyTree(s"$dir/.pending", backup)

    assert(Dispatcher.runOnce(spark, dir).delivered == 2)
    // the precise worst crash: terminal rows were appended, but the PENDING
    // store's manifest flip was lost — restore the pre-cycle store and replay
    deleteTree(s"$dir/.pending")
    copyTree(backup, s"$dir/.pending")
    assert(Dispatcher.runOnce(spark, dir).delivered == 2)

    // raw history now holds each delivery twice; the reader collapses it
    val raw = EventLog.read(spark, dir).filter($"status" === "DELIVERED")
    assert(raw.count() == 4)
    val deduped = EventLog.terminalHistory(spark, dir)
    assert(deduped.count() == 2)
    assert(deduped.select($"id").distinct().count() == 2)
    assert(deduped.filter($"status" === "DELIVERED").count() == 2)
  }
}
