package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming deduplication via `flatMapGroupsWithState`
  * (SURVEY §2.8 custom-state surface, §2.7 T2).
  *
  * The engine's delivery guarantee — like the reference's — is
  * at-least-once: a timed-out webhook attempt can land after a retry was
  * already sent, so consumers see duplicate envelope ids
  * (`tests/test_webhook_timeout.py:52-65`). This operator restores
  * effectively-once downstream by keying on the envelope `id` and keeping
  * per-key seen-state with a TTL.
  *
  * Scale notes: state is hash-partitioned by key across executors (RocksDB/
  * HDFS state store in production); the TTL (processing-time timeout) bounds
  * state size to the duplicate-arrival window instead of growing forever —
  * the knob that makes this viable on an unbounded 100 TB/day feed.
  */
object StatefulDedup {

  final case class Keyed(id: String, payload: String)

  /** Emit the first occurrence of each id; drop repeats while state lives.
    * `ttlMs` > 0 bounds how long an id is remembered after last sighting
    * (processing-time timeout); 0 keeps state forever (test/simple mode). */
  def dedupById(spark: SparkSession, events: Dataset[Keyed],
                ttlMs: Long = 0L): Dataset[Keyed] = {
    import spark.implicits._
    val timeoutConf =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.id)
      .flatMapGroupsWithState(
        OutputMode.Append, timeoutConf)(
        (id: String, rows: Iterator[Keyed], state: GroupState[Boolean]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val first = if (state.exists) Iterator.empty
                        else rows.take(1)
            val out = first.toSeq // materialize before mutating state
            state.update(true)
            if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            out.iterator
          }
        })(Encoders.scalaBoolean, Encoders.product[Keyed])
  }
}
