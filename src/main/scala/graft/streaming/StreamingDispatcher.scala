package graft.streaming

import graft.delivery.{HttpPoster, JdkHttpPoster}
import graft.queue.Dispatcher
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The Structured-Streaming-native form of the reference's delivery worker
  * loop (`src/cdc_webhook_worker.c:63-64` polls the queue every second):
  * a rate-source tick drives one [[Dispatcher.runOnce]] cycle per
  * `Trigger.ProcessingTime` interval, replacing the hand-rolled
  * sleep/restart loop ([[Dispatcher.drain]]/[[Dispatcher.supervise]]) with
  * the engine's own scheduler, checkpointing, and restart semantics
  * (SURVEY §3.3's stated mapping).
  *
  * Division of labor: ALL queue state lives in the queue directory —
  * PENDING/terminal partitions, attempt history, next_attempt schedules —
  * exactly as in the batch dispatcher, so the streaming checkpoint only
  * carries the tick offsets. A stop/restart (or crash/supervised-restart,
  * which Structured Streaming handles natively) resumes by simply ticking
  * again over whatever the queue says is due: the at-least-once contract is
  * the queue's, not the checkpoint's, and rewinding ticks can never replay
  * a delivery that already swapped to DELIVERED.
  *
  * The cycle body runs on the driver inside `foreachBatch` (the tick batch
  * itself is ignored); the delivery fan-out inside `runOnce` remains
  * distributed over executors via its `mapPartitions`.
  */
object StreamingDispatcher {

  /** Start the dispatcher as a streaming query polling every `intervalMs`.
    * Caller owns the returned query's lifecycle (stop/awaitTermination).
    *
    * `compactTerminalEvery` schedules terminal-history compaction inside
    * the worker loop: each cycle with deliveries appends one file set to
    * `status=DELIVERED|FAILED`, which at the reference's 1 s cadence is
    * ~86k file sets/day — scan planning for history readers starts to cost
    * more than scanning. Every N ticks each terminal partition rewrites to
    * one file via the crash-safe rename-aside swap; it runs between cycles
    * on the query's own thread, so it never races the dispatcher itself
    * (history readers see the documented rename-aside window — these are
    * offline/analytical scans, unlike the PENDING store's manifest reads). */
  def start(spark: SparkSession, queueDir: String,
            poster: HttpPoster = JdkHttpPoster,
            checkpointDir: String,
            intervalMs: Long = 1000L,
            compactTerminalEvery: Int = 0): StreamingQuery = {
    // Writer lease for the query's lifetime: a second dispatcher (streaming
    // or batch) on the same queueDir refuses cleanly at acquisition instead
    // of interleaving manifest flips with this one. Released on the query's
    // termination event (async, typically <100 ms after stop); a crashed
    // driver's lease simply expires after its ttl.
    val lease = graft.queue.PendingStore.acquireLease(
      queueDir, "streaming-dispatcher", ttlMs = math.max(30000L, intervalMs * 30))
    // Heartbeat for the query's lifetime: a tick whose delivery pass
    // outlives the ttl (slow webhooks × backlog) must not expire the lease
    // mid-cycle — the commit-time check would refuse a cycle that retries
    // just as slowly (livelock). Closed wherever the lease is released.
    val hb = graft.queue.PendingStore.heartbeat(queueDir, lease)
    def releaseAll(): Unit = {
      hb.close(); graft.queue.PendingStore.releaseLease(queueDir, lease)
    }
    // rowsPerSecond must keep pace with the trigger interval: a micro-batch
    // with zero new rows is skipped by Structured Streaming (foreachBatch
    // never fires), so a 1-row/s source under a sub-second trigger would
    // silently floor the poll cadence at ~1 s.
    val rowsPerSecond = math.max(1L, 1000L / math.max(1L, intervalMs))
    val ticks = spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()
    val query =
      try ticks.writeStream
        .outputMode("append")
        .trigger(Trigger.ProcessingTime(s"$intervalMs milliseconds"))
        .option("checkpointLocation", checkpointDir)
        .queryName("graft-dispatcher")
        .foreachBatch { (_: DataFrame, batchId: Long) =>
          Dispatcher.runOnce(spark, queueDir, poster, lease = Some(lease))
          if (compactTerminalEvery > 0 && (batchId + 1) % compactTerminalEvery == 0)
            Seq("status=DELIVERED", "status=FAILED").foreach { p =>
              val dir = java.nio.file.Paths.get(queueDir, p)
              if (java.nio.file.Files.exists(dir))
                graft.queue.Maintenance.compactParquet(spark, dir.toString)
            }
          ()
        }
        .start()
      catch { case e: Throwable => releaseAll(); throw e }
    val qid = query.id
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = ()
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit =
        if (e.id == qid) {
          releaseAll()
          spark.streams.removeListener(this)
        }
    })
    // A query that died in its first instants may have posted its terminated
    // event BEFORE the listener registered — the event is then never
    // delivered to it and the lease would leak until ttl. releaseLease is
    // idempotent (token-checked), so the direct check closes the gap.
    if (!query.isActive)
      releaseAll()
    query
  }
}
