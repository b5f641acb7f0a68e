package graft.streaming

import graft.SparkTestSession
import graft.streaming.StatefulDedup.Keyed
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** At-least-once delivery (T2) → effectively-once consumption: duplicates of
  * an envelope id are dropped across micro-batches via keyed state. */
class StatefulDedupSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("duplicate ids are dropped within and across micro-batches") {
    val ms = MemoryStream[Keyed]
    val deduped = StatefulDedup.dedupById(spark, ms.toDS())
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      ms.addData(Keyed("e1", "p1"), Keyed("e1", "p1-dup"), Keyed("e2", "p2"))
      q.processAllAvailable()
      ms.addData(Keyed("e1", "p1-retry"), Keyed("e3", "p3")) // cross-batch dup
      q.processAllAvailable()
      val got = spark.table("dedup_out").as[Keyed].collect()
      assert(got.map(_.id).sorted.toSeq == Seq("e1", "e2", "e3"))
      assert(got.find(_.id == "e1").get.payload == "p1") // first occurrence wins
    } finally q.stop()
  }
}
