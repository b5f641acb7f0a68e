package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

case class TimedDoc(doc_id: Long, lang: String, ts: Timestamp)

/** Mix-drift monitoring: windows close on the watermark (append emits each
  * window once, final), too-late data is dropped, and the report surfaces
  * a mix lurch — including a language vanishing — as an alert with the
  * first window never alerting. */
class MixDriftSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def tmp(p: String) = Files.createTempDirectory(p).toString
  // base aligned to a 10-minute wall-clock boundary (22:20:00 UTC), so
  // t(0)/t(10)/t(20) are exactly the tumbling-window starts
  private def t(min: Int) = new Timestamp(1700000400000L + min * 60000L)

  test("windows close once; a mix lurch and a vanished language alert; first window never does") {
    val out = tmp("graft_drift_out")
    val chk = tmp("graft_drift_chk")
    val mem = MemoryStream[TimedDoc]
    val q = MixDrift.feed(mem.toDF(), out, chk,
      windowSize = "10 minutes", watermarkDelay = "5 minutes").start()
    try {
      // window 1 [0,10): balanced 2 en / 2 fr
      mem.addData(TimedDoc(1, "en", t(1)), TimedDoc(2, "en", t(2)),
        TimedDoc(3, "fr", t(3)), TimedDoc(4, "fr", t(4)))
      q.processAllAvailable()
      // window 2 [10,20): lurch to 4 en / 1 fr; also advances the
      // watermark past window 1's end so window 1 closes
      mem.addData(TimedDoc(5, "en", t(11)), TimedDoc(6, "en", t(12)),
        TimedDoc(7, "en", t(13)), TimedDoc(8, "en", t(14)),
        TimedDoc(9, "fr", t(15)))
      q.processAllAvailable()
      // a doc for window 1 arriving AFTER the watermark passed: dropped,
      // the closed window must not change
      mem.addData(TimedDoc(10, "fr", t(5)))
      q.processAllAvailable()
      // window 3 [20,30): fr vanishes entirely; then a far-future tick
      // closes windows 2 and 3
      mem.addData(TimedDoc(11, "en", t(21)), TimedDoc(12, "en", t(22)))
      q.processAllAvailable()
      mem.addData(TimedDoc(99, "en", t(120)))
      q.processAllAvailable()
    } finally q.stop()

    val rows = MixDrift.report(spark, out, alertPpm = 200000L).collect()
      .map(r => (r.getTimestamp(0), r.getString(2), r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5)), r.getBoolean(6)))
    val w1 = rows.filter(_._1 == t(0))
    val w2 = rows.filter(_._1 == t(10))
    val w3 = rows.filter(_._1 == t(20))
    assert(w1.nonEmpty && w2.nonEmpty && w3.nonEmpty, s"${rows.toSeq}")
    // window 1: the late doc did NOT amend the closed window (2 fr, not 3);
    // balanced shares; no baseline → no alert
    assert(w1.map(r => r._2 -> r._3).toMap == Map("en" -> 2L, "fr" -> 2L))
    assert(w1.forall(r => r._4 == 500000L && r._5.isEmpty && !r._6), s"${w1.toSeq}")
    // window 2: en 4/5 = 800000 ppm, +300000 vs 500000 → alert both ways
    val en2 = w2.find(_._2 == "en").get
    val fr2 = w2.find(_._2 == "fr").get
    assert(en2._4 == 800000L && en2._5 == Some(300000L) && en2._6, s"$en2")
    assert(fr2._4 == 200000L && fr2._5 == Some(-300000L) && fr2._6, s"$fr2")
    // window 3: fr vanished — share 0, drift -200000, still an alert row
    val fr3 = w3.find(_._2 == "fr").get
    assert(fr3._3 == 0L && fr3._4 == 0L && fr3._5 == Some(-200000L) && fr3._6, s"$fr3")
  }

  test("small drifts under the threshold do not alert") {
    val out = tmp("graft_drift_out2")
    val chk = tmp("graft_drift_chk2")
    val mem = MemoryStream[TimedDoc]
    val q = MixDrift.feed(mem.toDF(), out, chk,
      windowSize = "10 minutes", watermarkDelay = "1 minutes").start()
    try {
      mem.addData(TimedDoc(1, "en", t(1)), TimedDoc(2, "fr", t(2)))
      q.processAllAvailable()
      mem.addData(TimedDoc(3, "en", t(11)), TimedDoc(4, "fr", t(12)))
      q.processAllAvailable()
      mem.addData(TimedDoc(9, "en", t(60)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = MixDrift.report(spark, out, alertPpm = 200000L).collect()
    assert(rows.length >= 4)
    assert(rows.forall(!_.getBoolean(6)), "steady mix must stay quiet")
  }

  test("an ingest gap yields no baseline, not a cross-gap drift comparison") {
    val out = tmp("graft_drift_out3")
    val chk = tmp("graft_drift_chk3")
    val mem = MemoryStream[TimedDoc]
    val q = MixDrift.feed(mem.toDF(), out, chk,
      windowSize = "10 minutes", watermarkDelay = "1 minutes").start()
    try {
      // window [0,10): all en; then a 20-minute silence; window [30,40):
      // all fr — a lurch, but NOT window-over-window adjacent
      mem.addData(TimedDoc(1, "en", t(1)), TimedDoc(2, "en", t(2)))
      q.processAllAvailable()
      mem.addData(TimedDoc(3, "fr", t(31)), TimedDoc(4, "fr", t(32)))
      q.processAllAvailable()
      mem.addData(TimedDoc(9, "en", t(90)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = MixDrift.report(spark, out, alertPpm = 200000L).collect()
      .map(r => (r.getTimestamp(0), r.getString(2),
        if (r.isNullAt(5)) None else Some(r.getLong(5)), r.getBoolean(6)))
    val post = rows.filter(_._1 == t(30))
    assert(post.nonEmpty)
    assert(post.forall(r => r._3.isEmpty && !r._4),
      s"a gap means no baseline and no alert, got ${post.toSeq}")
  }
}
