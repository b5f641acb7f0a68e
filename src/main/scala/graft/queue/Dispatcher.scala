package graft.queue

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.sql.Timestamp

import graft.delivery.{Backoff, HttpPoster, JdkHttpPoster}
import graft.queue.EventLog.QueueRow
import org.apache.spark.sql.SparkSession
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
  *   4. snapshot-swap the queue dir (prod: Delta/Iceberg MERGE instead).
  *
  * Crash-safety model: a crash between deliver and swap re-attempts the same
  * rows next cycle ⇒ at-least-once, same as the reference (T2).
  */
object Dispatcher {

  final case class CycleStats(due: Long, delivered: Long, rescheduled: Long, failed: Long)

  /** One poll cycle. `now` is injectable for tests. */
  def runOnce(spark: SparkSession, queueDir: String,
              poster: HttpPoster = JdkHttpPoster,
              now: Timestamp = new Timestamp(System.currentTimeMillis())): CycleStats = {
    import spark.implicits._
    val q = EventLog.read(spark, queueDir).as[QueueRow]
    val isDue = (r: QueueRow) => r.status == "PENDING" && !r.next_attempt.after(now)

    val attempted = q.filter(isDue(_)).mapPartitions(_.map { r =>
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
    }).persist()

    val untouched = q.filter(r => !isDue(r)).persist()
    val delivered = attempted.filter(_.status == "DELIVERED").count()
    val failed = attempted.filter(_.status == "FAILED").count()
    val due = attempted.count()

    // Snapshot-swap: write the new queue state beside the old dir, then
    // atomically move it into place (plain-parquet stand-in for MERGE).
    val tmp = queueDir.stripSuffix("/") + ".next"
    // unionByName: the partition column (status) comes back in a different
    // position than the case-class field order.
    untouched.toDF().unionByName(attempted.toDF())
      .write.mode("overwrite").partitionBy("status").parquet(tmp)
    attempted.unpersist()
    untouched.unpersist()
    swapDirs(Paths.get(tmp), Paths.get(queueDir))
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
      pending = EventLog.read(spark, queueDir).as[QueueRow]
        .filter(_.status == "PENDING").count() > 0
      cycle += 1
      if (pending) Thread.sleep(pollMs)
    }
    out.toSeq
  }

  private def swapDirs(tmp: Path, target: Path): Unit = {
    def deleteRec(p: Path): Unit = if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
    deleteRec(target)
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
  }
}
