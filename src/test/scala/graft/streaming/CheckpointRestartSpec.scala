package graft.streaming

import java.nio.file.Files

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Exactly-once *capture*: the file-source → capture → parquet-sink path
  * resumes from its checkpoint after a stop without reprocessing consumed
  * input — the durability contract the reference gets from enqueueing
  * inside the user's transaction (SURVEY §3.3 step 1), delivered here by
  * source offsets + sink commit log. */
class CheckpointRestartSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("restart from checkpoint: no reprocessing, new input still flows") {
    val root = Files.createTempDirectory("graft_ckr_").toString
    val feed = s"$root/feed"; val out = s"$root/out"; val ck = s"$root/ck"

    def append(ids: Long*): Unit =
      ids.map(i => (i, s"payload-$i")).toDF("id", "payload")
        .write.mode("append").parquet(feed)

    append(1L, 2L)
    val schema = spark.read.parquet(feed).schema

    def runOnePass(): Unit = {
      val q = spark.readStream.schema(schema).parquet(feed)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }

    runOnePass()
    assert(spark.read.parquet(out).count() == 2)

    append(3L)
    runOnePass() // second incarnation, same checkpoint
    val afterRestart = spark.read.parquet(out).as[(Long, String)].collect()
    assert(afterRestart.length == 3, "batch 1 must not be reprocessed")
    assert(afterRestart.map(_._1).sorted.toSeq == Seq(1L, 2L, 3L))

    runOnePass() // third incarnation, no new data
    assert(spark.read.parquet(out).count() == 3)
  }
}
