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

  test("crash between swap renames: aside PENDING partition is healed, no rows dropped") {
    // swapDirs' only non-atomic window: old status=PENDING already renamed
    // to the dot-prefixed aside, replacement not yet moved in. A crash here
    // must NOT read as an empty queue on restart — inject exactly that state.
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

    val pending = java.nio.file.Paths.get(dir, "status=PENDING")
    val aside = pending.resolveSibling(".status=PENDING.old")
    java.nio.file.Files.move(pending, aside,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE) // ← the crash point

    // Restarted dispatcher: scan heals the aside back before reading.
    assert(Dispatcher.hasPending(spark, dir), "healed scan must see the aside rows")
    assert(!java.nio.file.Files.exists(aside) && java.nio.file.Files.exists(pending))
    server.received.clear()
    Dispatcher.drain(spark, dir, pollMs = 10L)
    val terminal = EventLog.read(spark, dir).as[EventLog.QueueRow].collect()
    assert(terminal.length == 2 && terminal.forall(_.status == "DELIVERED"))
  }
}
