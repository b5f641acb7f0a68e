package graft.streaming

import java.nio.file.Files

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

case class SourcedDoc(doc_id: Long, source: String)
case class TokDoc(doc_id: Long, source: String, n_chars: Long)

/** Per-domain quota at ingest (the streaming twin of the batch domain cap
  * q91): admissions are durable and first-come-first-served across batches,
  * deterministic (content-hash order) within a batch, replay-idempotent,
  * and the registry probe is partition-pruned to the batch's touched
  * source buckets. */
class DomainQuotaSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def run(batch: org.apache.spark.sql.DataFrame, reg: String, cap: Int) =
    DomainQuota.processBatch(batch, reg, cap)
      .as[(Long, String, Boolean, Long)].collect()
      .map { case (id, src, adm, prior) => id -> (src, adm, prior) }.toMap

  test("quota fills across batches; overflow is rejected deterministically") {
    val reg = tmp("graft_quota_reg")
    // batch 1: 3 docs of srcA under cap=4 — all admitted
    val v1 = run(Seq(1L, 2L, 3L).map(SourcedDoc(_, "srcA")).toDF(), reg, cap = 4)
    assert(v1.values.forall { case (_, adm, prior) => adm && prior == 0L })
    // batch 2: 3 more srcA docs — exactly ONE admitted (4 - 3 = 1 slot),
    // chosen by md5(doc_id) order, not arrival order
    val b2 = Seq(10L, 11L, 12L)
    val v2 = run(b2.map(SourcedDoc(_, "srcA")).toDF(), reg, cap = 4)
    assert(v2.values.forall(_._3 == 3L), s"prior count must be 3: $v2")
    assert(v2.values.count(_._2) == 1, s"exactly one slot left: $v2")
    val expectedWinner = b2.minBy(id =>
      (java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes).map("%02x".format(_)).mkString, id))
    assert(v2(expectedWinner)._2, s"winner must be md5-order first: $v2")
    // batch 3: the rejected docs re-arrive — still rejected (quota full)
    val v3 = run(b2.filterNot(_ == expectedWinner)
      .map(SourcedDoc(_, "srcA")).toDF(), reg, cap = 4)
    assert(v3.values.forall { case (_, adm, prior) => !adm && prior == 4L })
  }

  test("domains have independent quotas; replay keeps verdicts and consumes no quota") {
    val reg = tmp("graft_quota_reg2")
    val b1 = Seq(SourcedDoc(1L, "srcA"), SourcedDoc(2L, "srcA"),
      SourcedDoc(3L, "srcB")).toDF()
    val v1 = run(b1, reg, cap = 2)
    assert(v1.values.forall(_._2), "everything under cap admits")
    // at-least-once replay of batch 1: identical verdicts, and the replayed
    // admissions must NOT double-count against the quota
    val v1r = run(b1, reg, cap = 2)
    assert(v1r.keySet == v1.keySet && v1r.values.forall(_._2),
      s"replay must keep admitted verdicts: $v1r")
    // srcA is now full (2/2) but srcB still has a slot
    val v2 = run(Seq(SourcedDoc(4L, "srcA"), SourcedDoc(5L, "srcB")).toDF(), reg, cap = 2)
    assert(!v2(4L)._2 && v2(4L)._3 == 2L, s"srcA full: $v2")
    assert(v2(5L)._2 && v2(5L)._3 == 1L, s"srcB open: $v2")
  }

  test("registry probe never reads untouched sbucket partitions") {
    val reg = tmp("graft_quota_reg3")
    run(Seq(SourcedDoc(1L, "srcA")).toDF(), reg, cap = 5)
    // poison a partition srcA's probe cannot touch: any OTHER sbucket
    val sbucketA = {
      val crc = new java.util.zip.CRC32()
      crc.update("srcA".getBytes); (crc.getValue % 256).toInt
    }
    val poisoned = (sbucketA + 1) % 256
    val dir = java.nio.file.Paths.get(reg, s"sbucket=$poisoned")
    Files.createDirectories(dir)
    Files.write(dir.resolve("part-junk.parquet"), "not parquet".getBytes)
    // srcA probe prunes to sbucket=<srcA> only — the junk is never opened
    val v = run(Seq(SourcedDoc(2L, "srcA")).toDF(), reg, cap = 5)
    assert(v(2L)._2 && v(2L)._3 == 1L, s"pruned probe must succeed: $v")
  }

  test("seeded registry counts exactly like incremental admissions") {
    val reg = tmp("graft_quota_reg4")
    DomainQuota.seedRegistry(
      Seq(SourcedDoc(1L, "srcA"), SourcedDoc(2L, "srcA")).toDF(), reg)
    val v = run(Seq(SourcedDoc(3L, "srcA"), SourcedDoc(4L, "srcA")).toDF(), reg, cap = 3)
    assert(v.values.forall(_._3 == 2L))
    assert(v.values.count(_._2) == 1, s"one slot after seeding 2 of 3: $v")
  }

  test("intra-batch redelivery of a doc takes ONE rank slot, not two") {
    val reg = tmp("graft_quota_reg5")
    // [A, A, B] with cap 2: the duplicate A must not consume B's slot
    val batch = Seq(SourcedDoc(1L, "srcA"), SourcedDoc(1L, "srcA"),
      SourcedDoc(2L, "srcA")).toDF()
    val rows = DomainQuota.processBatch(batch, reg, cap = 2)
      .as[(Long, String, Boolean, Long)].collect()
    assert(rows.length == 2, s"one verdict per distinct doc: ${rows.toSeq}")
    assert(rows.forall(_._3), s"both distinct docs fit the cap: ${rows.toSeq}")
  }

  test("null source reads as the '' domain instead of wedging the stream") {
    val reg = tmp("graft_quota_reg6")
    val batch = Seq((1L, null: String), (2L, "srcA")).toDF("doc_id", "source")
    val v = DomainQuota.processBatch(batch, reg, cap = 5)
      .as[(Long, String, Boolean, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(v(1L)._2 == "" && v(1L)._3, s"null source admits under '': $v")
    assert(v(2L)._2 == "srcA" && v(2L)._3)
    // the '' domain has durable quota like any other
    val v2 = DomainQuota.processBatch(
      Seq((3L, null: String)).toDF("doc_id", "source"), reg, cap = 5)
      .as[(Long, String, Boolean, Long)].collect().head
    assert(v2._4 == 1L, s"'' domain count persisted: $v2")
  }

  test("a non-positive cap fails fast instead of silently rejecting everything") {
    val reg = tmp("graft_quota_reg7")
    intercept[IllegalArgumentException] {
      DomainQuota.processBatch(Seq(SourcedDoc(1L, "srcA")).toDF(), reg, cap = 0)
    }
  }

  test("property: no domain ever exceeds its cap, and admissions are durable (random batch sequences)") {
    // raw ScalaCheck like PropertySpecs (no scalatestplus bridge offline);
    // few trials — every trial drives real Spark batches
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val docGen = for {
      id <- Gen.choose(1L, 15L) // small range forces replays + intra-batch dups
      src <- Gen.oneOf("srcA", "srcB", null)
    } yield (id, src)
    val seqGen = for {
      cap <- Gen.choose(1, 4)
      batches <- Gen.listOfN(3, Gen.nonEmptyListOf(docGen).map(_.take(10)))
    } yield (cap, batches)
    val prop = Prop.forAll(seqGen) { case (cap, batches) =>
      val reg = tmp("graft_quota_prop")
      val verdictsOk = batches.forall { b =>
        // registry state BEFORE this batch, keyed like the registry itself
        val before = DomainQuota.readRegistry(spark, reg)
          .select($"source", $"doc_id").as[(String, Long)].collect().toSet
        val v = DomainQuota.processBatch(
          b.toDF("doc_id", "source"), reg, cap)
          .as[(Long, String, Boolean, Long)].collect()
        // an admitted (source, doc) stays admitted on every re-arrival
        v.forall { case (id, src, adm, _) =>
          if (before.contains((src, id))) adm else true
        }
      }
      val counts = DomainQuota.readRegistry(spark, reg)
        .select($"source", $"doc_id").distinct()
        .groupBy($"source").count()
        .as[(String, Long)].collect()
      verdictsOk && counts.forall(_._2 <= cap)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  // ---- token-budget mode (processBatchTokens, the at-ingest twin of q93) ----

  private def md5Key(id: Long): (String, Long) =
    (java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes).map("%02x".format(_)).mkString, id)

  private def runTok(batch: org.apache.spark.sql.DataFrame, reg: String,
                     budget: Long) =
    DomainQuota.processBatchTokens(batch, reg, budget)
      .as[(Long, String, Boolean, Long)].collect()
      .map { case (id, src, adm, prior) => id -> (src, adm, prior) }.toMap

  test("token budget fills across batches; overflow rejected, remainder admitted") {
    val reg = tmp("graft_tokq_reg")
    // three 40-token docs under budget 100: the md5-order prefix of two fits
    val ids = Seq(1L, 2L, 3L)
    val v1 = runTok(ids.map(TokDoc(_, "srcA", 40L)).toDF(), reg, budget = 100L)
    val ordered = ids.sortBy(md5Key)
    assert(v1(ordered(0))._2 && v1(ordered(1))._2 && !v1(ordered(2))._2,
      s"maximal md5-order prefix under 100 tokens is the first two: $v1")
    // a 15-token doc still fits the 20 remaining tokens; prior mass is 80
    val v2 = runTok(Seq(TokDoc(10L, "srcA", 15L)).toDF(), reg, budget = 100L)
    assert(v2(10L)._2 && v2(10L)._3 == 80L, s"80 + 15 <= 100: $v2")
    // a 30-token doc no longer fits
    val v3 = runTok(Seq(TokDoc(11L, "srcA", 30L)).toDF(), reg, budget = 100L)
    assert(!v3(11L)._2 && v3(11L)._3 == 95L, s"95 + 30 > 100: $v3")
  }

  test("token replay keeps verdicts and never double-charges tokens") {
    val reg = tmp("graft_tokq_reg2")
    val b1 = Seq(TokDoc(1L, "srcA", 30L), TokDoc(2L, "srcA", 30L)).toDF()
    assert(runTok(b1, reg, budget = 100L).values.forall(_._2))
    // full replay: identical verdicts, prior mass unchanged at 60
    val v1r = runTok(b1, reg, budget = 100L)
    assert(v1r.values.forall { case (_, adm, prior) => adm && prior == 60L },
      s"replay must not double-charge (prior stays 60): $v1r")
    // replay MIXED with a fresh doc: the replayed row adds nothing to the
    // batch's running sum, so 60 prior + 40 fresh exactly fits
    val v2 = runTok(Seq(TokDoc(1L, "srcA", 30L), TokDoc(3L, "srcA", 40L)).toDF(),
      reg, budget = 100L)
    assert(v2(1L)._2 && v2(3L)._2 && v2(3L)._3 == 60L,
      s"replayed doc takes no budget; fresh 40 fits 60+40: $v2")
  }

  test("rejected tokens never consume budget; a lighter re-arrival can fit later") {
    val reg = tmp("graft_tokq_reg3")
    assert(runTok(Seq(TokDoc(1L, "srcA", 40L)).toDF(), reg, 50L)(1L)._2)
    // 30 tokens over a 40/50 budget: rejected, and NOT charged
    assert(!runTok(Seq(TokDoc(2L, "srcA", 30L)).toDF(), reg, 50L)(2L)._2)
    // a 5-token doc still sees prior mass 40 (not 70) and fits
    val v3 = runTok(Seq(TokDoc(3L, "srcA", 5L)).toDF(), reg, 50L)
    assert(v3(3L)._2 && v3(3L)._3 == 40L, s"rejection must not charge: $v3")
    // the rejected doc itself re-arrives: still over (45 + 30), still free
    assert(!runTok(Seq(TokDoc(2L, "srcA", 30L)).toDF(), reg, 50L)(2L)._2)
  }

  test("intra-batch admission is the maximal md5-order prefix (q93's semantics)") {
    val reg = tmp("graft_tokq_reg4")
    // three 60-token docs, budget 100: only the md5-first doc is admitted —
    // the THIRD doc is rejected even though 60 + its 60 > 100 would also
    // hold pairwise; stop-at-first-overflow is the pinned contract
    val ids = Seq(5L, 6L, 7L)
    val v = runTok(ids.map(TokDoc(_, "srcA", 60L)).toDF(), reg, budget = 100L)
    val first = ids.minBy(md5Key)
    assert(v(first)._2 && ids.filterNot(_ == first).forall(!v(_)._2),
      s"only the md5-order head fits a 100-token budget of 60-token docs: $v")
  }

  test("token budget in exact chunk-token units via chunkTokenCost (budgets mean tokens, not chars)") {
    val reg = tmp("graft_tokq_reg_c")
    def mk(id: Long, n: Int) =
      Seq((id, "srcA", Seq.fill(n)("tok").mkString(" "))).toDF("doc_id", "source", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      DomainQuota.processBatchTokens(
          graft.operators.TextAnalysis.chunkTokenCost(df), reg,
          budget = 150L, tokenCol = "token_cost")
        .as[(Long, String, Boolean, Long)].collect()
        .map { case (id, src, adm, prior) => id -> (src, adm, prior) }.toMap
    // 100 whitespace tokens chunk 64/48 into 2 windows → cost 100 + 16,
    // NOT the ~400 chars the n_chars proxy would charge
    val v1 = run(mk(1L, 100))
    assert(v1(1L)._2 && v1(1L)._3 == 0L, s"cost 116 fits 150: $v1")
    // the registry charged exactly the chunk cost: a 40-token doc (cost 40)
    // overflows 116 + 40, a 30-token doc (cost 30) fits 116 + 30
    val v2 = run(mk(2L, 40))
    assert(!v2(2L)._2 && v2(2L)._3 == 116L,
      s"prior mass must be the chunk cost 116, and 116 + 40 > 150: $v2")
    val v3 = run(mk(3L, 30))
    assert(v3(3L)._2 && v3(3L)._3 == 116L, s"116 + 30 <= 150: $v3")
  }

  test("token streaming gate writes verdicts through foreachBatch") {
    val reg = tmp("graft_tokq_reg_s")
    val out = tmp("graft_tokq_out") + "/verdicts"
    val ms = MemoryStream[TokDoc]
    ms.addData(TokDoc(1L, "srcA", 60L), TokDoc(2L, "srcB", 60L))
    val q = DomainQuota.gateTokens(ms.toDF(), reg, out, budget = 100L)
      .option("checkpointLocation", tmp("graft_tokq_ckpt")).start()
    try {
      q.processAllAvailable()
      ms.addData(TokDoc(3L, "srcA", 60L), TokDoc(4L, "srcB", 30L))
      q.processAllAvailable()
      val verdicts = spark.read.parquet(out)
        .as[(Long, String, Boolean, Long)].collect()
        .map { case (id, src, adm, prior) => id -> (src, adm, prior) }.toMap
      assert(verdicts(1L)._2 && verdicts(2L)._2, "first batch fits both domains")
      assert(!verdicts(3L)._2 && verdicts(3L)._3 == 60L, "srcA over budget")
      assert(verdicts(4L)._2 && verdicts(4L)._3 == 60L, "srcB's 30 still fits")
    } finally q.stop()
  }

  test("streaming gate writes verdicts through foreachBatch") {
    val reg = tmp("graft_quota_reg_s")
    val out = tmp("graft_quota_out") + "/verdicts"
    val ms = MemoryStream[SourcedDoc]
    ms.addData(SourcedDoc(1L, "srcA"), SourcedDoc(2L, "srcA"))
    val q = DomainQuota.gate(ms.toDF(), reg, out, cap = 2)
      .option("checkpointLocation", tmp("graft_quota_ckpt")).start()
    try {
      q.processAllAvailable()
      ms.addData(SourcedDoc(3L, "srcA"), SourcedDoc(4L, "srcB"))
      q.processAllAvailable()
      val verdicts = spark.read.parquet(out)
        .as[(Long, String, Boolean, Long)].collect()
        .map { case (id, src, adm, prior) => id -> (src, adm, prior) }.toMap
      assert(verdicts(1L)._2 && verdicts(2L)._2, "first batch fills the cap")
      assert(!verdicts(3L)._2 && verdicts(3L)._3 == 2L, "srcA over cap")
      assert(verdicts(4L)._2, "srcB independent")
    } finally q.stop()
  }
}
