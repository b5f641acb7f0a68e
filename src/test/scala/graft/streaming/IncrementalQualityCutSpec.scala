package graft.streaming

import java.nio.file.Files

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

case class QCDoc(doc_id: Long, source: String, score: Long)
case class QCText(doc_id: Long, source: String, text: String)

/** Quality cut at ingest: after a multi-batch ingest the retrospective
  * admitted set equals the batch q114 over the same corpus, replay is
  * idempotent, per-batch verdicts judge against post-batch cutoffs with
  * keep-all-ties, the registry probe is partition-pruned, and the rollup
  * self-heals across the append-then-crash window. */
class IncrementalQualityCutSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def admittedSet(reg: String, frac: Double = 0.4) =
    IncrementalQualityCut.admitted(spark, reg, frac).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet

  test("after a 3-batch ingest, admitted() equals the batch q114 over the same corpus") {
    val reg = tmp("graft_qc_reg")
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, dir)
      .select($"doc_id", $"source",
        IncrementalQualityCut.distinctTokenScore($"text").as("score"))
    (0 until 3).foreach { i =>
      IncrementalQualityCut.processBatch(
        docs.filter($"doc_id" % 3 === i), reg, frac = 0.4)
    }
    val got = admittedSet(reg)
    val want = graft.queries.TrainingDataQueries.qualityCut(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getAs[Number]("n_distinct").longValue(),
        r.getAs[Number]("cutoff").longValue())).toSet
    assert(want.nonEmpty && got == want,
      s"gate=${got.size} batch=${want.size} diff=${(got diff want) ++ (want diff got)}")
  }

  test("per-batch verdicts use post-batch cutoffs; the cut moves as the corpus grows") {
    val reg = tmp("graft_qc_prov")
    val b1 = (1L to 10L).map(i => QCDoc(i, "s", i)).toDF()
    val v1 = IncrementalQualityCut.processBatch(b1, reg, frac = 0.4)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getBoolean(4))).toMap
    // 10 docs, top 40% → cutoff = 4th-largest score = 7; admitted 7..10
    assert(v1.values.map(_._1).toSet == Set(7L))
    assert(v1.filter(_._2._2).keySet == Set(7L, 8L, 9L, 10L), s"got $v1")
    val b2 = (11L to 20L).map(i => QCDoc(i, "s", i)).toDF()
    val v2 = IncrementalQualityCut.processBatch(b2, reg, frac = 0.4)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getBoolean(4))).toMap
    // 20 docs now: cutoff = 8th-largest = 13 — the batch judged against
    // the POST-batch corpus, and the retrospective truth moved with it
    assert(v2.values.map(_._1).toSet == Set(13L))
    assert(v2.filter(_._2._2).keySet == (13L to 20L).toSet, s"got $v2")
    assert(admittedSet(reg).map(_._1) == (13L to 20L).toSet)
  }

  test("keep-all-ties at the boundary: no arbitrary within-tie order decides") {
    val reg = tmp("graft_qc_ties")
    // 5 docs, frac 0.4 → ⌈2⌉-nd largest = 8, and BOTH 8-ties stay
    val b = Seq(QCDoc(1L, "s", 5L), QCDoc(2L, "s", 8L), QCDoc(3L, "s", 8L),
      QCDoc(4L, "s", 9L), QCDoc(5L, "s", 3L)).toDF()
    val v = IncrementalQualityCut.processBatch(b, reg, frac = 0.4)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(v.filter(_._2).keySet == Set(2L, 3L, 4L), s"got $v")
  }

  test("replay is idempotent: a redelivered batch changes nothing") {
    val reg = tmp("graft_qc_replay")
    val b1 = (1L to 10L).map(i => QCDoc(i, "s", i)).toDF()
    val b2 = (11L to 20L).map(i => QCDoc(i, "s", i)).toDF()
    IncrementalQualityCut.processBatch(b1, reg, frac = 0.4)
    IncrementalQualityCut.processBatch(b2, reg, frac = 0.4)
    val before = admittedSet(reg)
    val vr = IncrementalQualityCut.processBatch(b2, reg, frac = 0.4)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getBoolean(4))).toMap
    assert(admittedSet(reg) == before)
    // the replayed docs are re-judged under the unchanged cut
    assert(vr.values.map(_._1).toSet == Set(13L), s"got $vr")
    // and the histogram didn't double-count
    val n = IncrementalQualityCut.readRollup(spark, reg)
      .agg(sum($"n")).head().getLong(0)
    assert(n == 20L, s"rollup rows sum to $n")
  }

  test("registry probe never reads untouched sbucket partitions") {
    val reg = tmp("graft_qc_prune")
    IncrementalQualityCut.processBatch(
      Seq(QCDoc(1L, "s", 5L)).toDF(), reg, frac = 0.4)
    val poison = java.nio.file.Paths.get(reg, "sbucket=999")
    Files.createDirectories(poison)
    Files.write(poison.resolve("part-junk.parquet"), "not parquet".getBytes)
    intercept[Exception] {
      IncrementalQualityCut.readRegistry(spark, reg)
        .filter(col("sbucket") === 999).count()
    }
    val v = IncrementalQualityCut.processBatch(
      Seq(QCDoc(2L, "s", 9L)).toDF(), reg, frac = 0.4)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(v == Map(2L -> true), s"got $v")
  }

  test("rollup self-heals across the append-then-crash window") {
    val reg = tmp("graft_qc_heal")
    IncrementalQualityCut.processBatch(
      (1L to 10L).map(i => QCDoc(i, "s", i)).toDF(), reg, frac = 0.4)
    // simulate a batch that appended its registry rows and crashed before
    // the rollup merge: rows land, histogram goes stale
    (11L to 20L).map(i => QCDoc(i, "s", i)).toDF()
      .select((crc32($"source") % 256).cast("int").as("sbucket"),
        $"source", $"doc_id", $"score")
      .write.mode("append").partitionBy("sbucket").parquet(reg)
    val stale = IncrementalQualityCut.readRollup(spark, reg)
      .agg(sum($"n")).head().getLong(0)
    assert(stale == 10L) // the crash left the rollup behind the registry
    // the crashed batch's at-least-once replay touches exactly the stale
    // cells — the self-heal detects the drift and rebuilds
    IncrementalQualityCut.processBatch(
      (11L to 20L).map(i => QCDoc(i, "s", i)).toDF(), reg, frac = 0.4)
    val healed = IncrementalQualityCut.readRollup(spark, reg)
      .agg(sum($"n")).head().getLong(0)
    assert(healed == 20L, s"rollup still stale: $healed")
    assert(admittedSet(reg).map(_._1) == (13L to 20L).toSet)
  }

  test("streaming gate derives q114's score and writes verdicts through foreachBatch") {
    val reg = tmp("graft_qc_reg_s")
    val out = tmp("graft_qc_out") + "/verdicts"
    val ms = MemoryStream[QCText]
    // distinct-token scores 2..6 over five docs, frac 0.4 → cutoff = 5
    def text(k: Int) = (1 to k).map(i => s"w$i").mkString(" ")
    ms.addData((2 to 6).map(k => QCText(k.toLong, "s", text(k))): _*)
    val q = IncrementalQualityCut.gate(ms.toDF(), reg, out, frac = 0.4)
      .option("checkpointLocation", tmp("graft_qc_ckpt")).start()
    try {
      q.processAllAvailable()
      val v = spark.read.parquet(out)
        .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(4))).toMap
      assert(v.filter(_._2._2).keySet == Set(5L, 6L), s"got $v")
      assert(v(4L)._1 == 4L) // the derived score is the distinct-token count
    } finally q.stop()
  }

  test("deleteDocs: admitted() judges exactly the surviving corpus; the rollup stays exact") {
    val reg = tmp("graft_qc_erase_reg")
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, dir)
      .select($"doc_id", $"source",
        IncrementalQualityCut.distinctTokenScore($"text").as("score"))
    (0 until 3).foreach { i =>
      IncrementalQualityCut.processBatch(docs.filter($"doc_id" % 3 === i),
        reg, frac = 0.4)
    }
    // erase every 7th doc - including high scorers, so cutoffs MOVE
    val gone = docs.filter($"doc_id" % 7 === 0)
      .select($"doc_id").as[Long].collect().toSeq
    val removed = IncrementalQualityCut.deleteDocs(spark, reg, gone)
    assert(removed == gone.length.toLong)
    // truth: a registry seeded from only the survivors
    val regB = tmp("graft_qc_erase_regB")
    IncrementalQualityCut.processBatch(
      docs.filter($"doc_id" % 7 =!= 0), regB, frac = 0.4)
    assert(admittedSet(reg) == admittedSet(regB))
    assert(admittedSet(reg) != admittedSet(regB) ||
      IncrementalQualityCut.readRegistry(spark, reg)
        .filter($"doc_id".isin(gone: _*)).count() == 0)
    // the delta-subtracted rollup equals a from-scratch registry aggregate
    val rollup = IncrementalQualityCut.readRollup(spark, reg)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    IncrementalQualityCut.rebuildRollup(spark, reg)
    val rebuilt = IncrementalQualityCut.readRollup(spark, reg)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(rollup == rebuilt)
  }

  test("reconcile re-judges stale verdicts: verdict dir == admitted() after the pass") {
    val reg = tmp("graft_qc_rec_reg")
    val out = tmp("graft_qc_rec_out") + "/verdicts"
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, dir)
      .select($"doc_id", $"source",
        IncrementalQualityCut.distinctTokenScore($"text").as("score"))
    // three striped batches: early verdicts judge against early cutoffs,
    // which MOVE as the later strata arrive — the staleness reconcile fixes
    (0 until 3).foreach { i =>
      IncrementalQualityCut.processBatch(docs.filter($"doc_id" % 3 === i),
          reg, frac = 0.4)
        .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(out)
    }
    val staleKeeps = spark.read.parquet(out).filter($"admitted")
      .select($"doc_id", $"source", $"score", $"cutoff").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val truth = admittedSet(reg)
    assert(staleKeeps != truth, "fixture too weak: no verdict went stale")
    val stats = IncrementalQualityCut.reconcile(spark, reg, out, frac = 0.4)
    assert(stats.nFlipped > 0)
    val afterKeeps = spark.read.parquet(out).filter($"admitted")
      .select($"doc_id", $"source", $"score", $"cutoff").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(afterKeeps == truth)
    // idempotent: a second pass flips nothing
    assert(IncrementalQualityCut.reconcile(spark, reg, out, frac = 0.4).nFlipped == 0L)
    // one row per document survives the replay-dedupe
    assert(spark.read.parquet(out).count() ==
      spark.read.parquet(out).select($"source", $"doc_id").distinct().count())
  }

  test("gate(reconcileEvery) reconciles on cadence: stream verdicts match admitted() after the tick") {
    val reg = tmp("graft_qc_rec2_reg")
    val out = tmp("graft_qc_rec2_out") + "/verdicts"
    val ms = MemoryStream[QCText]
    def text(k: Int) = (1 to k).map(i => s"w$i").mkString(" ")
    val q = IncrementalQualityCut.gate(ms.toDF(), reg, out, frac = 0.4,
        reconcileEvery = 2)
      .option("checkpointLocation", tmp("graft_qc_rec2_ckpt")).start()
    try {
      // batch 0: scores 2..6 → cutoff 5, docs 5,6 admitted
      ms.addData((2 to 6).map(k => QCText(k.toLong, "s", text(k))): _*)
      q.processAllAvailable()
      // batch 1: scores 7..11 push the 40% cut to 9 — batch-0 keeps 5,6
      // go stale, and (batchId+1) % 2 == 0 fires the reconcile
      ms.addData((7 to 11).map(k => QCText(k.toLong, "s", text(k))): _*)
      q.processAllAvailable()
      val keeps = spark.read.parquet(out).filter($"admitted")
        .select($"doc_id").as[Long].collect().toSet
      val truth = IncrementalQualityCut.admitted(spark, reg, 0.4)
        .select($"doc_id").as[Long].collect().toSet
      assert(keeps == truth, s"stream keeps $keeps != admitted() $truth")
      assert(!keeps.contains(5L) && !keeps.contains(6L), s"stale keeps survived: $keeps")
    } finally q.stop()
  }
}
