package graft.streaming

import java.nio.file.Files

import graft.SparkTestSession
import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite

/** [[IncrementalDedup.reconcile]]: dup chains accumulated across micro-
  * batches canonicalize to the kept representative, a registry seeded with
  * two representatives of one neighborhood collapses to one, admission
  * history (`is_dup`) is never rewritten, and a second run is a no-op. */
class ReconcileSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString
  private val base = "alpha beta gamma delta epsilon zeta eta theta"

  private def step(batch: org.apache.spark.sql.DataFrame,
                   reg: String, vd: String): Unit =
    IncrementalDedup.processBatch(batch, reg)
      .write.mode(SaveMode.Append).parquet(vd)

  private def verdicts(vd: String): Map[Long, (Boolean, Option[Long])] =
    spark.read.parquet(vd).as[(Long, Boolean, Option[Long])].collect()
      .map { case (k, b, r) => k -> (b, r) }.toMap

  test("verdict chain B~A~R canonicalizes to R; flags untouched; idempotent") {
    val reg = tmp("graft_rec_reg"); val vd = tmp("graft_rec_vd")
    step(Seq(Doc(100L, base)).toDF(), reg, vd)
    // 50 hits the registry rep (100); 60 hits BOTH but charges to the
    // smaller intra-batch partner 50 — the chain 60 -> 50 -> 100
    step(Seq(Doc(50L, base), Doc(60L, base)).toDF(), reg, vd)
    assert(verdicts(vd) == Map(100L -> (false, None),
      50L -> (true, Some(100L)), 60L -> (true, Some(50L))))

    val st = IncrementalDedup.reconcile(spark, reg, vd)
    assert(st.nVerdictLinksCanonicalized == 1, st)
    assert(st.nRegistryRowsRemapped == 0, st) // only 100 ever registered
    assert(st.nDocs == 3 && st.nClusters == 1, st)
    // 60's pointer now names the kept representative; nothing else moved
    assert(verdicts(vd) == Map(100L -> (false, None),
      50L -> (true, Some(100L)), 60L -> (true, Some(100L))))

    val st2 = IncrementalDedup.reconcile(spark, reg, vd)
    assert(st2.nVerdictLinksCanonicalized == 0 &&
      st2.nRegistryRowsRemapped == 0, st2)
  }

  test("gate(reconcileEvery): chains canonicalize in-stream on the cadence") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val reg = tmp("graft_rec_greg"); val vd = tmp("graft_rec_gvd") + "/v"
    val ms = MemoryStream[Doc]
    val q = IncrementalDedup.gate(ms.toDF(), reg, vd, reconcileEvery = 2)
      .option("checkpointLocation", tmp("graft_rec_gck")).start()
    try {
      ms.addData(Doc(100L, base))
      q.processAllAvailable() // batch 0: no reconcile tick yet
      ms.addData(Doc(50L, base), Doc(60L, base))
      q.processAllAvailable() // batch 1: tick — the 60 -> 50 -> 100 chain
      val v = verdicts(vd)    // must already be canonical on disk
      assert(v == Map(100L -> (false, None),
        50L -> (true, Some(100L)), 60L -> (true, Some(100L))), v)
    } finally q.stop()
  }

  test("richer verdict dirs keep every audit column through the rewrite") {
    import org.apache.spark.sql.functions.{col, lit}
    val reg = tmp("graft_rec_reg3"); val vd = tmp("graft_rec_vd3")
    IncrementalDedup.processBatch(Seq(Doc(100L, base)).toDF(), reg)
      .withColumn("lang_ok", lit(true))
      .write.mode(SaveMode.Append).parquet(vd)
    IncrementalDedup.processBatch(Seq(Doc(50L, base), Doc(60L, base)).toDF(), reg)
      .withColumn("lang_ok", lit(true))
      .write.mode(SaveMode.Append).parquet(vd)

    val st = IncrementalDedup.reconcile(spark, reg, vd)
    assert(st.nVerdictLinksCanonicalized == 1, st)
    val after = spark.read.parquet(vd)
    // the extra column survives, in schema and in value, on every row
    assert(after.columns.toSet == Set("doc_id", "is_dup", "dup_of", "lang_ok"))
    assert(after.filter(col("lang_ok")).count() == 3)
    assert(after.filter(col("doc_id") === 60L).select("dup_of")
      .as[Long].head() == 100L)
  }

  test("registry seeded with two reps of one neighborhood collapses to one") {
    val reg = tmp("graft_rec_reg2"); val vd = tmp("graft_rec_vd2")
    // seedRegistry registers every doc as its own representative — an
    // undeduplicated corpus legitimately produces sibling reps 10 and 20
    IncrementalDedup.seedRegistry(Seq(Doc(10L, base), Doc(20L, base)).toDF(), reg)
    step(Seq(Doc(30L, base)).toDF(), reg, vd)
    assert(verdicts(vd) == Map(30L -> (true, Some(10L))))

    val st = IncrementalDedup.reconcile(spark, reg, vd)
    // 20's four band rows repoint to 10; 30's link was already canonical
    assert(st.nRegistryRowsRemapped == 4, st)
    assert(st.nVerdictLinksCanonicalized == 0, st)
    assert(st.nDocs == 3 && st.nClusters == 1, st)
    val reps = IncrementalDedup.readRegistry(spark, reg)
      .select("rep_doc_id").as[Long].collect().toSet
    assert(reps == Set(10L), reps)
    // the collapsed registry still guards the neighborhood
    step(Seq(Doc(40L, base)).toDF(), reg, vd)
    assert(verdicts(vd)(40L) == (true, Some(10L)))

    val st2 = IncrementalDedup.reconcile(spark, reg, vd)
    assert(st2.nVerdictLinksCanonicalized == 0 &&
      st2.nRegistryRowsRemapped == 0, st2)
  }

  // ---- r18: registry erasure composed with reconcile (the GDPR gap) ----

  test("erasing a representative: rows gone, orphaned chains re-point to " +
    "the succession rep, replay cannot resurrect, idempotent") {
    val reg = tmp("graft_rec_ereg"); val vd = tmp("graft_rec_evd")
    step(Seq(Doc(100L, base)).toDF(), reg, vd)
    step(Seq(Doc(50L, base), Doc(60L, base)).toDF(), reg, vd)
    // chain on disk: 50 -> 100, 60 -> 50; registry carries only 100's rows
    val st = IncrementalDedup.eraseAndReconcile(spark, reg, vd, Seq(100L))
    assert(st.nRegistryRowsErased == 4, st) // 100's four band rows
    assert(st.nVerdictRowsErased == 1, st)  // 100's verdict row
    // the erased doc's rows stop existing in BOTH relations
    assert(IncrementalDedup.readRegistry(spark, reg)
      .filter($"rep_doc_id" === 100L).count() == 0)
    // succession: 50 is the smallest survivor — it anchors the chain with
    // the explicit self-pointer; 60 re-points to it; flags untouched
    assert(verdicts(vd) == Map(
      50L -> (true, Some(50L)), 60L -> (true, Some(50L))))
    // a pre-erase checkpoint replay cannot resurrect the takedown: the
    // tombstone filters the doc before signatures, verdicts, registration
    step(Seq(Doc(100L, base)).toDF(), reg, vd)
    assert(!verdicts(vd).contains(100L))
    assert(IncrementalDedup.readRegistry(spark, reg)
      .filter($"rep_doc_id" === 100L).count() == 0)
    // idempotent: nothing left to erase or move
    val st2 = IncrementalDedup.eraseAndReconcile(spark, reg, vd, Seq(100L))
    assert(st2.nVerdictRowsErased == 0 && st2.nRegistryRowsErased == 0, st2)
    assert(st2.reconcile.nVerdictLinksCanonicalized == 0 &&
      st2.reconcile.nRegistryRowsRemapped == 0, st2)
  }

  test("a chain connected to a surviving kept rep ONLY through the erased " +
    "rep's co-bucket rows repoints to that kept rep, not a succession rep") {
    import org.apache.spark.sql.functions.col
    val reg = tmp("graft_rec_bridge_reg") + "/r"
    val vd = tmp("graft_rec_bridge_vd") + "/v"
    // hand-laid registry (the clusterable shape, minus minhash physics):
    // rep 20 bridges two neighborhoods — it co-buckets with kept rep 10 in
    // (band 0, m1) and with rep 30 in (band 1, m2); 10 and 30 never share.
    // Erasing 20 must still route 30's side to the surviving kept rep 10:
    // edges come from the PRE-erase registry (the erased doc's own links
    // are what route an orphaned chain), only the rewrite and canonical
    // exclusion see the erase filter.
    Seq((0, 17, "m1", 10L), (0, 17, "m1", 20L), (1, 42, "m2", 20L),
        (1, 42, "m2", 30L))
      .toDF("band", "bucket", "minhash", "rep_doc_id")
      .write.partitionBy("band", "bucket").parquet(reg)
    Seq((40L, true, Some(30L))).toDF("doc_id", "is_dup", "dup_of")
      .write.parquet(vd)
    val st = IncrementalDedup.eraseAndReconcile(spark, reg, vd, Seq(20L))
    assert(st.nRegistryRowsErased == 2, st)
    // 30's registry row repoints THROUGH the erased bridge to 10, and the
    // verdict chain 40 -> 30 canonicalizes to 10 with it
    assert(IncrementalDedup.readRegistry(spark, reg)
      .select("rep_doc_id").as[Long].collect().toSet == Set(10L))
    assert(verdicts(vd) == Map(40L -> (true, Some(10L))))
    // idempotent: the erased rows are gone, nothing left to move
    val st2 = IncrementalDedup.eraseAndReconcile(spark, reg, vd, Seq(20L))
    assert(st2.nRegistryRowsErased == 0 &&
      st2.reconcile.nRegistryRowsRemapped == 0, st2)
  }

  test("erasing a chain MEMBER leaves the kept representative canonical") {
    val reg = tmp("graft_rec_ereg2"); val vd = tmp("graft_rec_evd2")
    step(Seq(Doc(100L, base)).toDF(), reg, vd)
    step(Seq(Doc(50L, base), Doc(60L, base)).toDF(), reg, vd)
    // erase the middle link 50: 60's pointer must route THROUGH the erased
    // doc's own link to the kept rep 100, and 50's rows must go
    val st = IncrementalDedup.eraseAndReconcile(spark, reg, vd, Seq(50L))
    assert(st.nVerdictRowsErased == 1, st)
    assert(st.nRegistryRowsErased == 0, st) // 50 was a dup: never registered
    assert(verdicts(vd) == Map(
      100L -> (false, None), 60L -> (true, Some(100L))))
    // the kept rep still guards the neighborhood
    step(Seq(Doc(70L, base)).toDF(), reg, vd)
    assert(verdicts(vd)(70L) == (true, Some(100L)))
  }
}
