package graft.streaming

import java.nio.file.Files

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Curation at ingest: every gate (near-dup vs corpus + same batch,
  * quality, language) verdicts per micro-batch, composite `keep` matches
  * the batch pipeline's semantics, and seen-but-rejected content is still
  * flagged as duplicate on re-ingest. */
class IngestCurationSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  // en markers ("the", "a", "of", "and") make langId say "en"
  private val good = "the quick brown fox jumps over a lazy dog of note and more"
  private val junk = "spam spam spam spam spam spam spam spam"     // distinct_ratio 1/8
  private val short = "the a"                                      // 2 tokens
  private val noLang = "zzz yyy xxx www vvv uuu ttt sss"           // no markers

  private def run(docs: Seq[(Long, String)], reg: String) =
    IngestCuration.processBatch(docs.toDF("doc_id", "text"), reg)
      .select($"doc_id", $"is_dup", $"quality_ok", $"lang_ok", $"keep", $"predicted_lang")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, String)].collect()
      .map(r => r._1 -> r).toMap

  test("each gate verdicts independently; keep is their conjunction") {
    val reg = tmp("graft_icur")
    val v = run(Seq(1L -> good, 2L -> junk, 3L -> short, 4L -> noLang), reg)
    assert(v(1L) == (1L, false, true, true, true, "en"), s"got ${v(1L)}")
    assert(!v(2L)._3 && !v(2L)._5, s"low distinct_ratio must fail quality: ${v(2L)}")
    assert(!v(3L)._3 && !v(3L)._5, s"too-short doc must fail quality: ${v(3L)}")
    assert(v(4L)._6 == "unknown" && !v(4L)._4 && !v(4L)._5, s"got ${v(4L)}")
  }

  test("rejected content still registers: its re-ingest is a duplicate, not a re-evaluation") {
    val reg = tmp("graft_icur_seen")
    val v1 = run(Seq(10L -> junk), reg)
    assert(!v1(10L)._2 && !v1(10L)._5) // fresh but dropped by quality
    val v2 = run(Seq(11L -> (junk + " again")), reg)
    assert(v2(11L)._2, s"near-dup of seen-and-rejected content must flag: $v2")
    assert(!v2(11L)._5)
  }

  test("near-dup of an admitted doc is dropped by the dedup gate alone") {
    val reg = tmp("graft_icur_dup")
    val v1 = run(Seq(20L -> good), reg)
    assert(v1(20L)._5)
    val v2 = run(Seq(21L -> (good + " suffix")), reg)
    assert(v2(21L)._2 && v2(21L)._3 && v2(21L)._4 && !v2(21L)._5,
      s"only the dup gate should fire: ${v2(21L)}")
  }

  test("streaming gate writes auditable verdicts; consumer keeps filter(keep)") {
    val reg = tmp("graft_icur_s")
    val out = tmp("graft_icur_out") + "/v"
    case class D(doc_id: Long, text: String)
    val ms = MemoryStream[(Long, String)]
    ms.addData(1L -> good, 2L -> junk)
    val q = IngestCuration.gate(
      ms.toDF().toDF("doc_id", "text"), reg, out)
      .option("checkpointLocation", tmp("graft_icur_ck")).start()
    try {
      q.processAllAvailable()
      ms.addData(3L -> (good + " tail"), 4L -> noLang)
      q.processAllAvailable()
      val kept = spark.read.parquet(out).filter($"keep")
        .select($"doc_id").as[Long].collect().toSet
      assert(kept == Set(1L), s"got $kept")
      // the audit trail explains every drop
      val why = spark.read.parquet(out)
        .select($"doc_id", $"is_dup", $"quality_ok", $"lang_ok")
        .as[(Long, Boolean, Boolean, Boolean)].collect().map(r => r._1 -> r).toMap
      assert(!why(2L)._3 && why(3L)._2 && !why(4L)._4)
    } finally q.stop()
  }
}
