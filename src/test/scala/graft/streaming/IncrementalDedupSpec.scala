package graft.streaming

import java.nio.file.Files

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

case class Doc(doc_id: Long, text: String)

/** Dedup at ingest: batch-2 documents are judged against batch-1's corpus
  * state, replay is idempotent, and verdicts agree with the batch LSH
  * candidate semantics (same md5 band signatures). */
class IncrementalDedupSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private val base = "alpha beta gamma delta epsilon zeta eta theta"
  private val other = "one two three four five six seven eight nine ten"

  test("near-dup of an earlier batch is flagged with its representative") {
    val reg = tmp("graft_dedup_reg")
    val b1 = Seq(Doc(1L, base), Doc(2L, other)).toDF()
    val v1 = IncrementalDedup.processBatch(b1, reg)
      .as[(Long, Boolean, Option[Long])].collect()
      .map { case (k, b, r) => k -> (b, r) }.toMap
    assert(v1 == Map(1L -> (false, None), 2L -> (false, None)))

    // doc 10 shares almost all shingles with doc 1; doc 11 is fresh
    val b2 = Seq(Doc(10L, base + " iota"), Doc(11L, "totally different words here now ok")).toDF()
    val v2df = IncrementalDedup.processBatch(b2, reg)
    // corpus state never shuffles: the registry side must not exchange on
    // its bucket keys (the batch broadcasts instead)
    val probePlan = v2df.queryExecution.executedPlan.toString
    assert(probePlan.contains("BroadcastExchange"), probePlan)
    assert(!probePlan.contains("hashpartitioning(band") &&
      !probePlan.contains("hashpartitioning(minhash"), probePlan)
    val v2 = v2df.as[(Long, Boolean, Option[Long])].collect()
      .map { case (k, b, r) => k -> (b, r) }.toMap
    assert(v2(10L) == (true, Some(1L)), s"got $v2")
    assert(v2(11L) == (false, None))

    // replayed batch (at-least-once): same verdicts, registry not corrupted
    val v2r = IncrementalDedup.processBatch(b2, reg)
      .as[(Long, Boolean, Option[Long])].collect()
      .map { case (k, b, r) => k -> (b, r) }.toMap
    assert(v2r(10L) == (true, Some(1L)))
    // 11 now collides with its own registered buckets from the first play —
    // the replay detects it as already-present (dup_of = itself's rep)
    assert(v2r(11L)._2.contains(11L))
  }

  test("two-batch verdicts equal the batch LSH candidate semantics") {
    // For a corpus split into two batches (first batch internally unique),
    // a second-batch document is flagged iff it shares a (band, minhash)
    // bucket with some first-batch document, and its representative is the
    // smallest such partner — exactly the batch operator's candidate edge.
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val vocab = Vector("red", "blue", "green", "ox", "hen", "fox", "elm",
      "oak", "ash", "tin", "zinc", "lead")
    val genDoc = Gen.listOfN(8, Gen.oneOf(vocab)).map(_.mkString(" "))
    val gen = Gen.listOfN(10, genDoc)
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(5),
      Prop.forAll(gen) { texts =>
        val docs = texts.zipWithIndex.map { case (t, i) => Doc(i.toLong, t) }
        val (b1, b2) = docs.splitAt(5)
        val reg = tmp("graft_dedup_prop")
        val v1 = IncrementalDedup.processBatch(b1.toDF(), reg)
          .as[(Long, Boolean, Option[Long])].collect()
        val batch1Dups = v1.filter(_._2).map(_._1).toSet // none (empty registry)
        val v2 = IncrementalDedup.processBatch(b2.toDF(), reg)
          .as[(Long, Boolean, Option[Long])].collect()
          .map { case (k, b, r) => k -> (b, r) }.toMap
        val sigs = graft.operators.Dedup
          .minhashSignatures(graft.operators.Dedup.shingles(docs.toDF()), bands = 4)
          .as[(Long, Int, String)].collect()
          .groupBy(_._1).view.mapValues(_.map(s => (s._2, s._3)).toSet).toMap
        val b1Ids = b1.map(_.doc_id).filterNot(batch1Dups)
        batch1Dups.isEmpty && b2.forall { d =>
          val partners = b1Ids.filter(o =>
            sigs.getOrElse(o, Set.empty).intersect(
              sigs.getOrElse(d.doc_id, Set.empty)).nonEmpty)
          v2(d.doc_id) == (partners.nonEmpty, partners.minOption)
        }
      })
    assert(res.passed, res.status.toString)
  }

  test("streaming gate writes verdicts through foreachBatch") {
    val reg = tmp("graft_dedup_reg_s")
    val out = tmp("graft_dedup_out") + "/verdicts"
    val ms = MemoryStream[Doc]
    ms.addData(Doc(1L, base), Doc(2L, other))
    val q = IncrementalDedup.gate(ms.toDF(), reg, out)
      .option("checkpointLocation", tmp("graft_dedup_ckpt")).start()
    try {
      q.processAllAvailable()
      ms.addData(Doc(10L, base + " iota"))
      q.processAllAvailable()
      val verdicts = spark.read.parquet(out)
        .as[(Long, Boolean, Option[Long])].collect()
        .map { case (k, b, r) => k -> (b, r) }.toMap
      assert(verdicts(1L) == (false, None) && verdicts(2L) == (false, None))
      assert(verdicts(10L) == (true, Some(1L)))
    } finally q.stop()
  }
}
