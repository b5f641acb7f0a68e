package graft.streaming

import java.sql.Timestamp

import graft.SparkTestSession
import graft.streaming.QueueStateMachine.{Attempt, QueueStatus}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The reference's event_log status machine (T5) realized as keyed
  * streaming state: PENDING→DELIVERED/FAILED with attempt history, terminal
  * states absorbing late duplicate outcomes (T2). */
class QueueStateMachineSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private def lastByKey(rows: Seq[QueueStatus]): Map[String, QueueStatus] =
    rows.groupBy(_.event_id).map { case (k, v) => k -> v.maxBy(_.attempt_count) }

  test("status transitions across micro-batches with retry_number = 1") {
    val ms = MemoryStream[Attempt]
    val tracked = QueueStateMachine.track(spark, ms.toDS(), retryNumber = 1)
    val q = tracked.writeStream.format("memory").queryName("qsm_out")
      .outputMode("update").start()
    try {
      // batch 1: e1 fails once (retry still available), e2 delivered first try
      ms.addData(Attempt("e1", ts(1), 500), Attempt("e2", ts(2), 204))
      q.processAllAvailable()
      // batch 2: e1 succeeds on retry; e3 fails twice in one batch → FAILED
      ms.addData(Attempt("e1", ts(3), 200),
        Attempt("e3", ts(4), 503), Attempt("e3", ts(5), 502))
      q.processAllAvailable()
      // batch 3: late duplicate outcomes for terminal keys change nothing
      ms.addData(Attempt("e2", ts(6), 500), Attempt("e3", ts(7), 200))
      q.processAllAvailable()

      val m = lastByKey(spark.table("qsm_out").as[QueueStatus].collect().toSeq)
      assert(m("e1") == QueueStatus("e1", "DELIVERED", 2, Seq(500, 200)))
      assert(m("e2") == QueueStatus("e2", "DELIVERED", 1, Seq(204)))
      // exactly retry_number+1 = 2 attempts then FAILED (tests/test_retries.py:54-62)
      assert(m("e3") == QueueStatus("e3", "FAILED", 2, Seq(503, 502)))
    } finally q.stop()
  }

  test("transformWithState (v2 API, RocksDB state) reaches the same statuses") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ms = MemoryStream[Attempt]
    val tracked = QueueStateMachine.trackV2(spark, ms.toDS(), retryNumber = 1)
    val q = tracked.writeStream.format("memory").queryName("qsm_v2")
      .outputMode("update").start()
    try {
      ms.addData(Attempt("e1", ts(1), 500), Attempt("e2", ts(2), 204))
      q.processAllAvailable()
      ms.addData(Attempt("e1", ts(3), 200),
        Attempt("e3", ts(4), 503), Attempt("e3", ts(5), 502))
      q.processAllAvailable()
      val m = lastByKey(spark.table("qsm_v2").as[QueueStatus].collect().toSeq)
      assert(m("e1") == QueueStatus("e1", "DELIVERED", 2, Seq(500, 200)))
      assert(m("e2") == QueueStatus("e2", "DELIVERED", 1, Seq(204)))
      assert(m("e3") == QueueStatus("e3", "FAILED", 2, Seq(503, 502)))
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("attempts within a batch fold in timestamp order") {
    val ms = MemoryStream[Attempt]
    val tracked = QueueStateMachine.track(spark, ms.toDS(), retryNumber = 5)
    val q = tracked.writeStream.format("memory").queryName("qsm_order")
      .outputMode("update").start()
    try {
      // delivered at ts=30; the later-added-but-earlier-ts failures come first
      ms.addData(Attempt("e9", ts(30), 200),
        Attempt("e9", ts(10), 500), Attempt("e9", ts(20), 502))
      q.processAllAvailable()
      val m = lastByKey(spark.table("qsm_order").as[QueueStatus].collect().toSeq)
      assert(m("e9") == QueueStatus("e9", "DELIVERED", 3, Seq(500, 502, 200)))
    } finally q.stop()
  }
}
