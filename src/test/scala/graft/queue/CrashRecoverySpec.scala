package graft.queue

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import graft.SparkTestSession
import graft.cdc.{ChangeCapture, Emp, SnapshotDiff}
import graft.delivery.{CaptureServer, HttpPoster, JdkHttpPoster}
import graft.model.TriggerConfig
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Supervised-restart contract of the reference worker
  * (`src/cdc_webhook_worker.c:48-53,91`): the worker crashes mid-cycle —
  * AFTER a webhook fired but before any queue state landed — and a
  * supervisor restarts it. Delivery must still complete for every row,
  * with duplicate posts sharing envelope ids (at-least-once, T2). */
object CrashRecoverySpec {
  /** Static so executor threads in the local JVM share the budget. */
  val crashesLeft = new AtomicInteger(0)
}

/** Posts for real, then dies — the worst-ordered crash: the side effect
  * happened, the state transition did not. */
final class CrashAfterPostPoster extends HttpPoster {
  override def post(url: String, headers: Map[String, String], body: String,
                    timeoutMs: Long): (Int, String) = {
    val r = JdkHttpPoster.post(url, headers, body, timeoutMs)
    if (CrashRecoverySpec.crashesLeft.getAndUpdate(n => math.max(0, n - 1)) > 0)
      throw new RuntimeException("injected worker crash (reference: exit(1) at 10%)")
    r
  }
}

class CrashRecoverySpec extends AnyFunSuite with SparkTestSession with BeforeAndAfterAll {
  import spark.implicits._

  private var server: CaptureServer = _
  override def beforeAll(): Unit = { server = new CaptureServer }
  override def afterAll(): Unit = server.stop()

  test("delivery completes despite injected mid-cycle crashes; duplicates share ids") {
    val cfg = TriggerConfig(
      name = "crash_t", tableName = "employees",
      operations = Seq("INSERT"), webhookUrl = server.url,
      headers = Map.empty, mode = "ASYNC",
      retryNumber = 5, retryInterval = 1, retryBackoff = "LINEAR")
    val dir = Files.createTempDirectory("graft_crash_").toString + "/event_log"
    val emps = (1 to 6).map(i => Emp(i, s"e$i", i * 100))
    val env = ChangeCapture.capture(
      SnapshotDiff.diff(Seq.empty[Emp].toDF(), emps.toDF(), Seq("id")), cfg)
    EventLog.enqueue(env, cfg, dir)
    val expectedIds = EventLog.read(spark, dir)
      .select($"id").as[String].collect().toSet
    assert(expectedIds.size == 6)

    server.received.clear()
    CrashRecoverySpec.crashesLeft.set(3)
    val restarts = Dispatcher.supervise(spark, dir, new CrashAfterPostPoster,
      pollMs = 10L, restartDelayMs = 10L)

    assert(restarts >= 1, "at least one injected crash must abort a cycle")
    // Queue converged: everything DELIVERED, nothing PENDING left behind.
    assert(!Dispatcher.hasPending(spark, dir))
    val terminal = EventLog.read(spark, dir).as[EventLog.QueueRow].collect()
    assert(terminal.map(_.id).toSet == expectedIds)
    assert(terminal.forall(_.status == "DELIVERED"))
    // At-least-once at the wire: >= one post per row, and every duplicate
    // post carries an id from the same envelope set (no invented events).
    val postedIds = server.bodies.map { b =>
      val m = """"id":"([0-9a-f-]+)"""".r.findFirstMatchIn(b)
      m.map(_.group(1)).getOrElse(sys.error(s"no id in $b"))
    }
    assert(postedIds.toSet == expectedIds)
    assert(postedIds.length >= expectedIds.size,
      s"expected at-least-once: ${postedIds.length} posts for ${expectedIds.size} rows")
  }

  test("commit crash leaves only unreferenced dirs: restart drains with no repair step") {
    // The manifest commit's crash surface is "orphan dirs the manifest never
    // references" (PendingStoreSpec kills the writer between every pair of
    // steps). Here the dispatcher-level restart story: a crashed cycle left
    // an orphan snapshot AND a garbage spool temp; a restarted dispatcher
    // must read the intact manifest state, drain, and sweep the orphans —
    // no heal/repair step exists or is needed.
    val cfg = TriggerConfig(
      name = "heal_t", tableName = "employees",
      operations = Seq("INSERT"), webhookUrl = server.url,
      headers = Map.empty, mode = "ASYNC",
      retryNumber = 1, retryInterval = 1, retryBackoff = "LINEAR")
    val dir = Files.createTempDirectory("graft_heal_").toString + "/event_log"
    val env = ChangeCapture.capture(
      SnapshotDiff.diff(Seq.empty[Emp].toDF(),
        Seq(Emp(1, "h1", 100), Emp(2, "h2", 200)).toDF(), Seq("id")), cfg)
    EventLog.enqueue(env, cfg, dir)

    // ← the crash points: a snapshot written but never flipped to, and a
    //   spool that never completed its rename (both dot-/unreferenced)
    val orphanSnap = java.nio.file.Paths.get(dir, ".pending", "v1")
    java.nio.file.Files.createDirectories(orphanSnap)
    java.nio.file.Files.write(orphanSnap.resolve("part-junk.parquet"),
      "not parquet".getBytes)
    val halfSpool = java.nio.file.Paths.get(dir, ".pending", ".spool-crashed")
    java.nio.file.Files.createDirectories(halfSpool)
    java.nio.file.Files.write(halfSpool.resolve("part-0.parquet"),
      "not parquet".getBytes)

    assert(Dispatcher.hasPending(spark, dir),
      "restarted scan must see the enqueued rows despite crash leftovers")
    server.received.clear()
    Dispatcher.drain(spark, dir, pollMs = 10L)
    val terminal = EventLog.read(spark, dir).as[EventLog.QueueRow].collect()
    assert(terminal.length == 2 && terminal.forall(_.status == "DELIVERED"))
    assert(server.bodies.length == 2)
    // the real commit at v1 overwrote the orphan garbage
    assert(graft.queue.PendingStore.manifest(dir).version >= 1L)
  }
}
