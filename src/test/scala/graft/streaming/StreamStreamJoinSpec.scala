package graft.streaming

import java.sql.Timestamp

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream-stream interval join (T6 beyond the reference): attribute each
  * purchase to a click by the same user within the preceding 10 minutes.
  * Both sides carry watermarks so the join state is bounded — the shape
  * that holds on an unbounded feed: state per key is limited to the
  * interval length plus the watermark delay, not stream history. */
final case class Click(c_user: Long, c_ts: Timestamp, click_id: Long)
final case class Purchase(p_user: Long, p_ts: Timestamp, purchase_id: Long)

class StreamStreamJoinSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  // offset from epoch: a row whose event time equals the initial watermark
  // (1970-01-01T00:00) is dropped as late before any state is built
  private val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
  private def ts(min: Long) = new Timestamp(base + min * 60000L)

  test("purchases join clicks of the same user within the interval") {
    val clicks = MemoryStream[Click]
    val purchases = MemoryStream[Purchase]
    val c = clicks.toDS().withWatermark("c_ts", "10 minutes")
    val p = purchases.toDS().withWatermark("p_ts", "10 minutes")
    val joined = p.join(c, expr(
      """p_user = c_user AND
        |p_ts >= c_ts AND p_ts <= c_ts + interval 10 minutes""".stripMargin))
      .select($"purchase_id", $"click_id")
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    try {
      clicks.addData(Click(1L, ts(0), 100L), Click(2L, ts(1), 200L))
      purchases.addData(
        Purchase(1L, ts(5), 900L),   // within 10 min of click 100 → match
        Purchase(5L, ts(8), 901L),   // user never clicked → no match
        Purchase(3L, ts(6), 902L))   // user never clicked → no match
      q.processAllAvailable()
      clicks.addData(Click(1L, ts(30), 101L))
      purchases.addData(Purchase(1L, ts(31), 903L)) // matches the NEW click only
      q.processAllAvailable()
      val got = spark.table("ssj_out").as[(Long, Long)].collect().toSet
      assert(got == Set((900L, 100L), (903L, 101L)))
    } finally q.stop()
  }
}
