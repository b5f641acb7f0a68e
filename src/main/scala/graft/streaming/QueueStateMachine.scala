package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming event-log status machine via `mapGroupsWithState` — the
  * stateful-streaming realization of the queue contract the reference
  * sketches and [[graft.queue.Dispatcher]] implements statelessly
  * (SURVEY §2.7 T5: statuses `cdc_webhook--1.0.sql:35`, attempt-history
  * arrays `:36-39`, worker intent `src/cdc_webhook_worker.c:55-61`).
  *
  * Input is the stream of delivery-attempt outcomes; state is one row per
  * event id holding the reference's status machine:
  *
  *   PENDING --2xx--> DELIVERED (terminal)
  *   PENDING --failure, attempts > retry_number--> FAILED (terminal)
  *   PENDING --failure otherwise--> PENDING (awaiting rescheduled retry)
  *
  * Terminal states absorb late outcomes — the at-least-once duplicate
  * attempts the reference's own tests prove possible
  * (`tests/test_webhook_timeout.py:52-65`, T2) update nothing.
  *
  * Scale: state is hash-partitioned by event id across executors and each
  * key holds O(retry_number) ints, so state size is bounded by in-flight
  * (non-terminal) events, not stream history; terminal keys could be aged
  * out with a processing-time TTL exactly as [[StatefulDedup]] does.
  */
object QueueStateMachine {

  /** One delivery-attempt outcome (`ts` orders attempts within a batch). */
  final case class Attempt(event_id: String, ts: Timestamp, http_status: Int)

  /** Current per-event status — mirrors `event_log`'s status +
    * `attempt_count` + `attempts_status` array columns. */
  final case class QueueStatus(
      event_id: String, status: String, attempt_count: Int,
      attempts_status: Seq[Int])

  private def success(httpStatus: Int): Boolean =
    httpStatus >= 200 && httpStatus < 300 // src/cdc_webhook.c:137-139

  /** Fold attempt outcomes into per-event status; emits the updated status
    * row per key per micro-batch (use with OutputMode.Update). */
  def track(spark: SparkSession, attempts: Dataset[Attempt],
            retryNumber: Int): Dataset[QueueStatus] = {
    import spark.implicits._
    attempts
      .groupByKey(_.event_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (id: String, rows: Iterator[Attempt], state: GroupState[QueueStatus]) => {
          var cur = state.getOption.getOrElse(QueueStatus(id, "PENDING", 0, Nil))
          rows.toSeq.sortBy(_.ts.getTime).foreach { a =>
            if (cur.status == "PENDING") {
              val n = cur.attempt_count + 1
              val st =
                if (success(a.http_status)) "DELIVERED"
                else if (n > retryNumber) "FAILED" // retry_number+1 total attempts
                else "PENDING"
              cur = QueueStatus(id, st, n, cur.attempts_status :+ a.http_status)
            }
          }
          state.update(cur)
          cur
        })
  }

  /** The same status machine on the `transformWithState` API (Spark 4's
    * arbitrary-state v2): explicit named `ValueState`, RocksDB-backed —
    * the forward path for production state (changelog checkpointing, state
    * TTL per state variable rather than per key). Requires
    * `spark.sql.streaming.stateStore.providerClass =
    * ...RocksDBStateStoreProvider`. */
  def trackV2(spark: SparkSession, attempts: Dataset[Attempt],
              retryNumber: Int): Dataset[QueueStatus] = {
    import spark.implicits._
    attempts
      .groupByKey(_.event_id)
      .transformWithState(new QueueStatusProcessor(retryNumber),
        TimeMode.None(), OutputMode.Update())
  }

  /** One `ValueState[QueueStatus]` per event id; fold identical to
    * [[track]]'s. */
  final class QueueStatusProcessor(retryNumber: Int)
      extends StatefulProcessor[String, Attempt, QueueStatus] {
    @transient private var state: ValueState[QueueStatus] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[QueueStatus](
        "queueStatus", Encoders.product[QueueStatus], TTLConfig.NONE)

    override def handleInputRows(id: String, rows: Iterator[Attempt],
                                 timerValues: TimerValues): Iterator[QueueStatus] = {
      var cur = if (state.exists()) state.get()
                else QueueStatus(id, "PENDING", 0, Nil)
      rows.toSeq.sortBy(_.ts.getTime).foreach { a =>
        if (cur.status == "PENDING") {
          val n = cur.attempt_count + 1
          val st =
            if (success(a.http_status)) "DELIVERED"
            else if (n > retryNumber) "FAILED"
            else "PENDING"
          cur = QueueStatus(id, st, n, cur.attempts_status :+ a.http_status)
        }
      }
      state.update(cur)
      Iterator.single(cur)
    }
  }
}
