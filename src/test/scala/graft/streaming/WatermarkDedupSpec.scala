package graft.streaming

import java.sql.Timestamp

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The built-in bounded-state twin of [[StatefulDedup]]:
  * `dropDuplicatesWithinWatermark` keeps per-id state only for the
  * watermark delay — the duplicate-arrival window of the at-least-once
  * delivery contract (T2) — instead of forever. */
final case class Env(id: String, ts: Timestamp, payload: String)

class WatermarkDedupSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  // offset from epoch — event times equal to the initial watermark are late
  private val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
  private def ts(min: Long) = new Timestamp(base + min * 60000L)

  test("duplicates within the watermark window are dropped") {
    val ms = MemoryStream[Env]
    val deduped = ms.toDS()
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("id")
    val q = deduped.writeStream.format("memory").queryName("wm_dedup")
      .outputMode("append").start()
    try {
      ms.addData(Env("e1", ts(0), "first"), Env("e1", ts(1), "dup-in-batch"),
        Env("e2", ts(2), "other"))
      q.processAllAvailable()
      ms.addData(Env("e1", ts(3), "dup-cross-batch"))
      q.processAllAvailable()
      val got = spark.table("wm_dedup").as[Env].collect()
      assert(got.map(_.id).sorted.toSeq == Seq("e1", "e2"))
      // which same-batch duplicate survives is not defined; the cross-batch
      // one must never appear
      assert(Set("first", "dup-in-batch").contains(got.find(_.id == "e1").get.payload))
    } finally q.stop()
  }
}
