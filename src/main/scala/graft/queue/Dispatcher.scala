package graft.queue

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.sql.Timestamp

import graft.delivery.{Backoff, HttpPoster, JdkHttpPoster}
import graft.queue.EventLog.QueueRow
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Async delivery worker — completes the drain loop the reference left as a
  * TODO (`src/cdc_webhook_worker.c:55-61`), using its `event_log` schema +
  * README retry spec as the contract (SURVEY §3.3, T5).
  *
  * Each cycle (the reference polls at 1 s, `src/cdc_webhook_worker.c:63-64`):
  *   1. scan due work: `status = PENDING AND next_attempt <= now` — a
  *      partition-pruned read (queue is partitioned by status);
  *   2. one delivery attempt per due row, distributed via mapPartitions
  *      (the retry LOOP lives in the queue, not in process: a failed attempt
  *      reschedules by writing `next_attempt = now + Backoff.delay(n)`,
  *      so retries survive worker crashes — stronger than the reference's
  *      in-process sleeps and exactly what its schema was designed for);
  *   3. state transitions PENDING→DELIVERED / PENDING(rescheduled) / FAILED
  *      with attempt history arrays appended (`cdc_webhook--1.0.sql:36-43`);
  *   4. append terminal rows to their status partitions, snapshot-swap ONLY
  *      the PENDING partition (prod: Delta/Iceberg MERGE instead).
  *
  * Scale model: a cycle's I/O is O(PENDING), never O(history). The due scan
  * is a Column predicate (`status = 'PENDING' AND next_attempt <= now`), so
  * Catalyst prunes to the `status=PENDING` partition directory — the Spark
  * analog of the reference's btree index on (status, next_attempt)
  * (`cdc_webhook--1.0.sql:50-52`). DELIVERED/FAILED partitions are immutable,
  * append-only history that a cycle never reads or rewrites.
  *
  * Crash-safety model: terminal rows are appended BEFORE the PENDING swap, so
  * a crash between the two leaves a row visible as both DELIVERED and
  * PENDING; the next cycle re-attempts it ⇒ at-least-once with duplicate
  * envelope ids, same as the reference (T2) — readers dedup terminal history
  * by (id, attempt_count), the streaming twin of StatefulDedup.
  */
object Dispatcher {

  final case class CycleStats(due: Long, delivered: Long, rescheduled: Long, failed: Long)

  /** One poll cycle. `now` is injectable for tests. */
  def runOnce(spark: SparkSession, queueDir: String,
              poster: HttpPoster = JdkHttpPoster,
              now: Timestamp = new Timestamp(System.currentTimeMillis())): CycleStats = {
    import spark.implicits._
    val posted = dueScan(spark, queueDir, now).mapPartitions(_.map { r =>
      // IN_PROGRESS → terminal transition happens within the cycle; only
      // terminal states are persisted (single-writer dispatcher).
      val (status, resp) = poster.post(r.webhook_url,
        graft.delivery.HeadersCodec.parse(r.headers), r.payload, r.timeout * 1000L)
      val ok = status >= 200 && status < 300
      val attempts = r.attempt_count + 1
      val newStatus =
        if (ok) "DELIVERED"
        else if (attempts > r.retry_number) "FAILED"
        else "PENDING"
      val nextAt =
        if (newStatus == "PENDING")
          new Timestamp(now.getTime +
            Backoff.delayMs(r.retry_backoff, r.retry_interval, r.attempt_count))
        else r.next_attempt
      r.copy(
        status = newStatus,
        attempt_count = attempts,
        attempts_time = r.attempts_time :+ now,
        attempts_status = r.attempts_status :+ status,
        attempts_response = r.attempts_response :+ resp,
        next_attempt = nextAt)
    })

    // 1) Durable attempt log: ONE action materializes every post exactly
    //    once per cycle. Counting or re-writing from the live dataset would
    //    risk recomputation (Spark invalidates caches over queueDir on the
    //    appends below) and with it duplicate HTTP side effects.
    val attemptsDir = queueDir.stripSuffix("/") + ".attempts"
    posted.toDF().write.mode("overwrite").parquet(attemptsDir)
    val attempted = spark.read
      .schema(org.apache.spark.sql.Encoders.product[QueueRow].schema)
      .parquet(attemptsDir).as[QueueRow]

    val delivered = attempted.filter(col("status") === "DELIVERED").count()
    val failed = attempted.filter(col("status") === "FAILED").count()
    val due = attempted.count()
    if (due == 0) { // idle cycle: no state changed, rewrite nothing
      deleteRec(Paths.get(attemptsDir))
      return CycleStats(0, 0, 0, 0)
    }

    // 2) The new PENDING partition (not-yet-due ∪ rescheduled) is staged
    //    beside the queue before any live write. `status` lives in the
    //    directory name, not the files, matching the hive layout enqueue uses.
    val notDue = pendingScan(spark, queueDir)
      .filter(col("next_attempt") > lit(now))
    val newPending = notDue.toDF().unionByName(
      attempted.filter(col("status") === "PENDING").toDF()).drop("status")
    val tmp = queueDir.stripSuffix("/") + ".pending-next"
    newPending.write.mode("overwrite").parquet(tmp)

    // 3) Terminal rows append to their own status partitions — DELIVERED and
    //    FAILED history is write-once, never rewritten (O(due), not O(history)).
    attempted.filter(col("status") =!= "PENDING").toDF()
      .write.mode("append").partitionBy("status").parquet(queueDir)

    // 4) Swap the PENDING partition last: a crash before this point leaves
    //    the due rows PENDING and re-attempted next cycle (at-least-once).
    swapDirs(Paths.get(tmp), Paths.get(queueDir, "status=PENDING"))
    deleteRec(Paths.get(attemptsDir))
    CycleStats(due, delivered, due - delivered - failed, failed)
  }

  /** Run cycles until no PENDING work remains or `maxCycles` hit, sleeping
    * `pollMs` between cycles (reference cadence: 1000 ms). */
  def drain(spark: SparkSession, queueDir: String, poster: HttpPoster = JdkHttpPoster,
            pollMs: Long = 1000L, maxCycles: Int = 60): Seq[CycleStats] = {
    import spark.implicits._
    val out = scala.collection.mutable.ArrayBuffer.empty[CycleStats]
    var cycle = 0
    var pending = true
    while (pending && cycle < maxCycles) {
      out += runOnce(spark, queueDir, poster)
      pending = hasPending(spark, queueDir)
      cycle += 1
      if (pending) Thread.sleep(pollMs)
    }
    out.toSeq
  }

  /** Supervised drain — the reference worker deliberately crashes ~10% of
    * its iterations and relies on the postmaster to restart it within 1 s
    * (`src/cdc_webhook_worker.c:48-53,91`); recovery is queue state, not
    * process state. Same contract here: any mid-cycle crash aborts the
    * cycle before its PENDING swap, so a restarted drain re-reads the
    * still-PENDING rows and re-attempts them (at-least-once; duplicate
    * deliveries share envelope ids). Returns the number of restarts. */
  def supervise(spark: SparkSession, queueDir: String,
                poster: HttpPoster = JdkHttpPoster,
                pollMs: Long = 1000L, restartDelayMs: Long = 1000L,
                maxRestarts: Int = 10, maxCycles: Int = 60): Int = {
    var restarts = 0
    var done = false
    while (!done) {
      try { drain(spark, queueDir, poster, pollMs, maxCycles); done = true }
      catch {
        case scala.util.control.NonFatal(e) =>
          restarts += 1
          if (restarts > maxRestarts) throw e
          Thread.sleep(restartDelayMs)
      }
    }
    restarts
  }

  /** Column predicates (not typed lambdas): `status` is the hive partition
    * column, so these scans list and read ONLY status=PENDING files —
    * exposed so StorageLayoutSpec can assert the pruning on the executed
    * plan the dispatcher actually runs. */
  def pendingScan(spark: SparkSession, queueDir: String): Dataset[QueueRow] = {
    import spark.implicits._
    healAside(Paths.get(queueDir, "status=PENDING"))
    EventLog.read(spark, queueDir).filter(col("status") === "PENDING").as[QueueRow]
  }

  /** The cycle's due-work scan: PENDING ∧ next_attempt ≤ now. */
  def dueScan(spark: SparkSession, queueDir: String, now: Timestamp): Dataset[QueueRow] =
    pendingScan(spark, queueDir).filter(col("next_attempt") <= lit(now))

  /** Partition-pruned existence check (reads only status=PENDING files). */
  def hasPending(spark: SparkSession, queueDir: String): Boolean =
    pendingScan(spark, queueDir).limit(1).count() > 0

  /** Serializes [[healAside]] against [[swapDirs]]: a reader poll
    * (hasPending from a monitor thread, the streaming dispatcher's caller)
    * must not observe the between-renames window of an IN-FLIGHT swap and
    * "heal" it back — that would make the swap's second rename collide.
    * Queue writers are single-JVM (driver-side) by design, so a monitor
    * suffices; crash recovery across processes still comes from the
    * startup-time heal (the crashed process holds no lock). */
  private[queue] val swapLock = new Object

  /** Crash-recovery heal for [[swapDirs]]' one non-atomic window: a crash
    * between its two renames leaves the target missing with the aside
    * present. Every scan entry point restores the aside first, so a
    * restarted dispatcher never mistakes that window for an empty queue
    * (which would silently drop not-yet-due PENDING rows). If both target
    * and aside exist the swap completed; the stale aside is left for the
    * next swap's cleanup. */
  private[queue] def healAside(target: Path): Unit = swapLock.synchronized {
    val aside = target.resolveSibling("." + target.getFileName.toString + ".old")
    if (!Files.exists(target) && Files.exists(aside))
      Files.move(aside, target, StandardCopyOption.ATOMIC_MOVE)
  }

  /** Swap `tmp` into place at `target` via rename-aside: the old directory
    * is moved aside first, so a crash at any point leaves either the old or
    * the new snapshot restorable at a deterministic path — never neither
    * (the between-renames window is healed by [[healAside]] on the next
    * scan). */
  private def swapDirs(tmp: Path, target: Path): Unit = swapLock.synchronized {
    // Dot-prefixed so partition discovery never sees the aside copy.
    val aside = target.resolveSibling("." + target.getFileName.toString + ".old")
    deleteRec(aside)
    val hadOld = Files.exists(target)
    if (hadOld) Files.move(target, aside, StandardCopyOption.ATOMIC_MOVE)
    try Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
    catch { case e: Throwable =>
      if (hadOld) Files.move(aside, target, StandardCopyOption.ATOMIC_MOVE)
      throw e
    }
    deleteRec(aside)
  }

  private def deleteRec(p: Path): Unit = if (Files.exists(p)) {
    Files.walk(p).sorted(java.util.Comparator.reverseOrder())
      .forEach(f => Files.delete(f))
  }
}
