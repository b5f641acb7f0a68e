package graft.streaming

import java.nio.file.Files

import graft.SparkTestSession
import graft.operators.Similarity
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

case class Vec(vec_id: Long, embedding: Array[Float])

/** Embedding near-dup gating at ingest: candidates from registry bucket
  * collisions are EXACT-rescored (a chance collision between orthogonal
  * vectors never flags), cross-batch and same-batch dups are caught,
  * replay is idempotent, and the registry probe prunes to touched
  * (band, bucket) partitions. */
class IncrementalVecDedupSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def tmp(p: String) = Files.createTempDirectory(p).toString
  private val dims = 8
  private val threshold = 900000L // quantized 0.9

  private def axis(i: Int): Array[Float] =
    Array.tabulate(dims)(d => if (d == i) 1.0f else 0.0f)
  // unit-ish vector at cosine ~0.99 to axis(0)
  private val nearAxis0: Array[Float] =
    Array.tabulate(dims)(d => if (d == 0) 0.99f else if (d == 1) 0.141f else 0.0f)

  private def run(vecs: Seq[Vec], reg: String) =
    IncrementalVecDedup.processBatch(vecs.toDF(), reg, threshold, dims = dims)
      .as[(Long, Boolean, Option[Long])].collect()
      .map { case (k, b, r) => k -> (b, r) }.toMap

  /** (band, bucket) signature sets under the operator's own planes. */
  private def sigsOf(vecs: Seq[Vec]): Map[Long, Set[(Int, Int)]] =
    Similarity.lshBandSignatures(vecs.toDF(), dims = dims)
      .as[(Long, Int, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(s => (s._2, s._3)).toSet).toMap

  test("cross-batch near-dup flagged; sub-threshold bucket collision is NOT") {
    val reg = tmp("graft_vdedup_reg")
    val v1 = run(Seq(Vec(1L, axis(0)), Vec(2L, axis(1))), reg)
    assert(v1 == Map(1L -> (false, None), 2L -> (false, None)))

    // precondition (deterministic md5 planes): the near-dup pair must share
    // at least one band bucket, or banding could never surface it
    val sigs = sigsOf(Seq(Vec(1L, axis(0)), Vec(10L, nearAxis0)))
    assert(sigs(1L).intersect(sigs(10L)).nonEmpty, s"banding precondition: $sigs")

    // find an axis ORTHOGONAL to the registered axis(0) that still shares
    // an LSH bucket with it — it must surface as a candidate and then be
    // rejected by the exact rescore (sim = 0 < threshold)
    val axes = (2 until dims).map(i => Vec(100L + i, axis(i)))
    val axSigs = sigsOf(axes :+ Vec(1L, axis(0)))
    val colliders = axes.filter(a =>
      axSigs(a.vec_id).intersect(axSigs(1L)).nonEmpty)
    assert(colliders.nonEmpty,
      s"no orthogonal axis shares a bucket with axis(0) — widen the search: $axSigs")

    val v2 = run(Seq(Vec(10L, nearAxis0), colliders.head), reg)
    assert(v2(10L) == (true, Some(1L)), s"got $v2")
    assert(v2(colliders.head.vec_id) == (false, None),
      s"orthogonal bucket-collider must be rejected by exact rescore: $v2")
  }

  test("same-batch near-dups flagged against the smallest; dups do not register") {
    val reg = tmp("graft_vdedup_intra")
    val v = run(Seq(Vec(20L, axis(0)), Vec(21L, nearAxis0), Vec(22L, axis(2))), reg)
    assert(v(20L) == (false, None), s"got $v")
    assert(v(21L) == (true, Some(20L)), s"got $v")
    assert(v(22L) == (false, None), s"got $v")
    val reps = IncrementalVecDedup.readRegistry(spark, reg)
      .select($"rep_vec_id").distinct().as[Long].collect().toSet
    assert(reps == Set(20L, 22L), s"got $reps")
  }

  test("replay is idempotent: dup stays flagged, fresh vector stays fresh") {
    val reg = tmp("graft_vdedup_replay")
    run(Seq(Vec(1L, axis(0))), reg)
    val b2 = Seq(Vec(10L, nearAxis0), Vec(11L, axis(3)))
    val first = run(b2, reg)
    assert(first(10L) == (true, Some(1L)) && first(11L) == (false, None))
    // self-matches are excluded from the probe: 11's own first-play registry
    // row (similarity 1.0) must NOT flip its verdict to dup-of-itself
    val replay = run(b2, reg)
    assert(replay(10L) == (true, Some(1L)))
    assert(replay(11L) == (false, None), s"got $replay")
    // the re-appended identical rows are absorbed: a later near-dup of 11
    // still resolves to representative 11
    val later = run(Seq(Vec(12L, axis(3).updated(0, 0.05f))), reg)
    assert(later(12L) == (true, Some(11L)), s"got $later")
  }

  test("bulk-seeded registry gates like incremental registration; compaction preserves it") {
    val reg = tmp("graft_vdedup_seed")
    IncrementalVecDedup.seedRegistry(
      Seq(Vec(1L, axis(0)), Vec(2L, axis(1))).toDF(), reg, dims = dims)
    val before = IncrementalVecDedup.readRegistry(spark, reg).count()
    graft.queue.Maintenance.compactParquet(spark, reg,
      partitionCols = Seq("band", "bucket"))
    assert(IncrementalVecDedup.readRegistry(spark, reg).count() == before)
    val v = run(Seq(Vec(10L, nearAxis0), Vec(11L, axis(3))), reg)
    assert(v(10L) == (true, Some(1L)), s"got $v")
    assert(v(11L) == (false, None), s"got $v")
  }

  test("streaming gate writes verdicts through foreachBatch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val reg = tmp("graft_vdedup_reg_s")
    val out = tmp("graft_vdedup_out") + "/verdicts"
    val ms = MemoryStream[Vec]
    ms.addData(Vec(1L, axis(0)), Vec(2L, axis(1)))
    val q = IncrementalVecDedup.gate(ms.toDF(), reg, out, threshold, dims = dims)
      .option("checkpointLocation", tmp("graft_vdedup_ckpt")).start()
    try {
      q.processAllAvailable()
      ms.addData(Vec(10L, nearAxis0))
      q.processAllAvailable()
      val verdicts = spark.read.parquet(out)
        .as[(Long, Boolean, Option[Long])].collect()
        .map { case (k, b, r) => k -> (b, r) }.toMap
      assert(verdicts(1L) == (false, None) && verdicts(2L) == (false, None))
      assert(verdicts(10L) == (true, Some(1L)))
    } finally q.stop()
  }

  test("registry probe never reads untouched (band, bucket) partitions") {
    val reg = tmp("graft_vdedup_prune")
    run(Seq(Vec(1L, axis(0)), Vec(2L, axis(1))), reg)
    // real buckets are < 2^bandWidth = 16; bucket=999 is reachable only by
    // a scan that failed to prune
    val poison = java.nio.file.Paths.get(reg, "band=0", "bucket=999")
    Files.createDirectories(poison)
    Files.write(poison.resolve("part-junk.parquet"), "not parquet".getBytes)
    intercept[Exception] {
      IncrementalVecDedup.readRegistry(spark, reg)
        .filter(col("bucket") === 999).count()
    }
    val vdf = IncrementalVecDedup.processBatch(
      Seq(Vec(10L, nearAxis0)).toDF(), reg, threshold, dims = dims)
    // corpus state never shuffles on its bucket keys either
    val plan = vdf.queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning(band") &&
      !plan.contains("hashpartitioning(bucket"), plan)
    val v = vdf.as[(Long, Boolean, Option[Long])].collect()
      .map { case (k, b, r) => k -> (b, r) }.toMap
    assert(v(10L) == (true, Some(1L)), s"got $v")
  }
}
