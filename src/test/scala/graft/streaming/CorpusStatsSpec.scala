package graft.streaming

import java.nio.file.Files

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

case class StatDoc(doc_id: Long, source: String, lang: String, n_chars: Long)

/** Corpus accounting at ingest (the streaming twin of the batch mix report
  * q98): per-cell totals accumulate across batches, at-least-once replay
  * never double-counts, the registry probe is partition-pruned, and the
  * on-demand report matches the batch grouping-sets query over the same
  * documents exactly. */
class CorpusStatsSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def run(batch: org.apache.spark.sql.DataFrame, reg: String) =
    CorpusStats.processBatch(batch, reg)
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map { case (src, lang, n, c, bn, bc) => (src, lang) -> (n, c, bn, bc) }
      .toMap

  test("cells accumulate across batches; verdicts carry post-batch totals") {
    val reg = tmp("graft_cstats_reg")
    val v1 = run(Seq(StatDoc(1, "srcA", "en", 100), StatDoc(2, "srcA", "en", 50),
      StatDoc(3, "srcB", "fr", 30)).toDF(), reg)
    assert(v1(("srcA", "en")) == ((2L, 150L, 2L, 150L)), s"$v1")
    assert(v1(("srcB", "fr")) == ((1L, 30L, 1L, 30L)), s"$v1")
    val v2 = run(Seq(StatDoc(4, "srcA", "en", 25), StatDoc(5, "srcA", "fr", 10))
      .toDF(), reg)
    assert(v2(("srcA", "en")) == ((3L, 175L, 1L, 25L)),
      s"post-batch totals must include prior batches: $v2")
    assert(v2(("srcA", "fr")) == ((1L, 10L, 1L, 10L)), s"$v2")
  }

  test("at-least-once replay never double-counts; intra-batch dupes collapse") {
    val reg = tmp("graft_cstats_reg2")
    val b = Seq(StatDoc(1, "srcA", "en", 100), StatDoc(1, "srcA", "en", 100),
      StatDoc(2, "srcB", "fr", 40)).toDF()
    val v1 = run(b, reg)
    assert(v1(("srcA", "en")) == ((1L, 100L, 1L, 100L)),
      s"intra-batch duplicate must collapse: $v1")
    val v2 = run(b, reg)
    assert(v2(("srcA", "en")) == ((1L, 100L, 0L, 0L)),
      s"replay adds nothing and keeps totals: $v2")
    assert(v2(("srcB", "fr")) == ((1L, 40L, 0L, 0L)), s"$v2")
    // a fresh doc in a replay-heavy batch still lands
    val v3 = run(Seq(StatDoc(1, "srcA", "en", 100), StatDoc(9, "srcA", "en", 7))
      .toDF(), reg)
    assert(v3(("srcA", "en")) == ((2L, 107L, 1L, 7L)), s"$v3")
  }

  test("registry probe never reads untouched sbucket partitions") {
    val reg = tmp("graft_cstats_reg3")
    run(Seq(StatDoc(1, "srcA", "en", 10)).toDF(), reg)
    val sbucketA = {
      val crc = new java.util.zip.CRC32()
      crc.update("srcA".getBytes); (crc.getValue % 256).toInt
    }
    val poisoned = (sbucketA + 1) % 256
    val dir = java.nio.file.Paths.get(reg, s"sbucket=$poisoned")
    Files.createDirectories(dir)
    Files.write(dir.resolve("part-junk.parquet"), "not parquet".getBytes)
    val v = run(Seq(StatDoc(2, "srcA", "en", 20)).toDF(), reg)
    assert(v(("srcA", "en")) == ((2L, 30L, 1L, 20L)),
      s"pruned probe must succeed despite foreign junk: $v")
  }

  test("on-demand report matches the batch mix report over the same docs") {
    val reg = tmp("graft_cstats_reg4")
    val docs = (1L to 40L).map(i =>
      StatDoc(i, s"src${i % 3}", if (i % 2 == 0) "en" else "fr", i * 10))
    // ingest in three batches with a replayed middle batch
    run(docs.take(15).toDF(), reg)
    run(docs.slice(10, 30).toDF(), reg)
    run(docs.drop(30).toDF(), reg)
    val live = CorpusStats.report(spark, reg).collect().map(_.toSeq).toSeq
    val batch = graft.queries.TrainingDataQueries.corpusMixReportOn(docs.toDF())
      .collect().map(_.toSeq).toSeq
    assert(live == batch,
      s"live card must equal the batch card:\n$live\nvs\n$batch")
  }

  test("live card equals the batch card on null-bearing metadata after the operator's normalization") {
    val reg = tmp("graft_cstats_reg_null")
    val docs = Seq(StatDoc(1, "srcA", "en", 100), StatDoc(2, null, "en", 50),
      StatDoc(3, "srcA", null, 30), StatDoc(4, null, null, 20))
    run(docs.toDF(), reg)
    val live = CorpusStats.report(spark, reg).collect().map(_.toSeq).toSeq
    // the contract: compare against the batch card over docs normalized
    // the way processBatch stores them (null -> ""), NOT the raw nulls —
    // raw nulls would coalesce to the 'ALL' label in the batch card
    val normalized = docs.map(d => StatDoc(d.doc_id,
      Option(d.source).getOrElse(""), Option(d.lang).getOrElse(""), d.n_chars))
    val batch = graft.queries.TrainingDataQueries
      .corpusMixReportOn(normalized.toDF()).collect().map(_.toSeq).toSeq
    assert(live == batch, s"$live\nvs\n$batch")
    // the "" strata are real rows, distinct from the ALL aggregates
    assert(live.exists(r => r(0) == "" && r(2) == 0))
  }

  test("rollup stays exactly in sync with the doc-grained registry across batches, replays, and adoption") {
    def rollupOf(reg: String) = CorpusStats.readRollup(spark, reg)
      .as[(String, String, Long, Long)].collect().sorted.toSeq
    def groundTruth(reg: String) = CorpusStats.readRegistry(spark, reg)
      .select($"source", $"lang", $"doc_id", $"n_chars").distinct()
      .groupBy($"source", $"lang")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_docs"),
        org.apache.spark.sql.functions.sum($"n_chars").as("sum_chars"))
      .as[(String, String, Long, Long)].collect().sorted.toSeq

    // maintained path: batches + a full replay keep the rollup exact
    val reg = tmp("graft_cstats_rollup")
    val b1 = Seq(StatDoc(1, "srcA", "en", 100), StatDoc(2, "srcB", "fr", 30)).toDF()
    run(b1, reg)
    run(Seq(StatDoc(3, "srcA", "en", 25), StatDoc(4, "srcC", "de", 7)).toDF(), reg)
    run(b1, reg) // replay must not touch the rollup
    assert(rollupOf(reg) == groundTruth(reg), "incremental merge must stay exact")

    // adoption path: a seeded registry has no rollup; the first
    // processBatch rebuilds one covering the seeded mass too
    val reg2 = tmp("graft_cstats_rollup_adopt")
    CorpusStats.seedRegistry(
      Seq(StatDoc(10, "srcA", "en", 11), StatDoc(11, "srcB", "fr", 13)).toDF(), reg2)
    assert(CorpusStats.readRollup(spark, reg2).isEmpty,
      "a blind seed must not fabricate a rollup")
    run(Seq(StatDoc(12, "srcA", "en", 5)).toDF(), reg2)
    assert(rollupOf(reg2) == groundTruth(reg2),
      "adoption rebuild must cover pre-rollup mass")

    // a seed on TOP of a live rollup re-derives it
    CorpusStats.seedRegistry(Seq(StatDoc(13, "srcD", "es", 9)).toDF(), reg2)
    assert(rollupOf(reg2) == groundTruth(reg2), "post-seed rebuild must land")

    // crash-window recovery: a corrupted rollup is re-derived exactly
    CorpusStats.rebuildRollup(spark, reg)
    assert(rollupOf(reg) == groundTruth(reg))

    // SELF-HEAL: simulate the append-then-crash window — registry carries
    // a batch the rollup never merged — by overwriting the rollup with a
    // stale snapshot; the crashed batch's REPLAY (delta empty, so the merge
    // alone adds nothing) must detect the touched-cell mismatch against the
    // verdicts' registry-derived totals and rebuild
    val staleCells = rollupOf(reg)
    val b3 = Seq(StatDoc(20, "srcA", "en", 33), StatDoc(21, "srcE", "it", 44)).toDF()
    run(b3, reg) // rollup now includes b3
    staleCells.toDF("source", "lang", "n_docs", "sum_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(reg.stripSuffix("/") + "_rollup") // crash: swap never landed
    assert(rollupOf(reg) != groundTruth(reg), "stale state set up")
    run(b3, reg) // the at-least-once replay heals it
    assert(rollupOf(reg) == groundTruth(reg),
      "the replayed batch must self-heal the crash-window rollup")
  }

  test("null chars normalize to 0; a lang-changed replay's empty cell is not drift") {
    val reg = tmp("graft_cstats_nulls")
    // a cell whose ONLY doc has null chars: a raw null would make the
    // cell's sum NULL and NPE the rollup merge / self-heal collects
    val withNull = Seq((1L, "srcN", "en", None: Option[Long]),
      (2L, "srcN", "fr", Some(40L)))
      .toDF("doc_id", "source", "lang", "n_chars")
    val v = CorpusStats.processBatch(withNull, reg)
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map { case (s, l, n, c, _, _) => (s, l) -> (n, c) }.toMap
    assert(v(("srcN", "en")) == ((1L, 0L)), s"null chars count as 0: $v")
    assert(CorpusStats.langMass(spark, reg) == Map("en" -> 0L, "fr" -> 40L))
    // redeliver doc 1 claiming a DIFFERENT lang: replay-excluded, so the
    // de cell legitimately totals zero — the self-heal must read that as
    // consistent (absent rollup row == zero), not drift; and repeated
    // deliveries must stay stable
    val relabeled = Seq((1L, "srcN", "de", Some(99L)))
      .toDF("doc_id", "source", "lang", "n_chars")
    val v2 = CorpusStats.processBatch(relabeled, reg)
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map { case (s, l, n, c, bn, bc) => (s, l) -> (n, c, bn, bc) }.toMap
    assert(v2(("srcN", "de")) == ((0L, 0L, 0L, 0L)),
      s"a replayed doc must not register under its new lang: $v2")
    CorpusStats.processBatch(relabeled, reg) // and again — no rebuild loop
    assert(CorpusStats.langMass(spark, reg) == Map("en" -> 0L, "fr" -> 40L),
      "the corpus mix is unchanged by relabeled replays")
  }

  test("property: totals equal the deduplicated union under any batch/replay sequence") {
    // raw ScalaCheck like PropertySpecs (no scalatestplus bridge offline);
    // few trials — every trial drives real Spark batches
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val docGen = for {
      id <- Gen.choose(1L, 12L) // small range forces replays + intra-batch dups
      src <- Gen.oneOf("srcA", "srcB", null)
      // lang and n_chars are pure functions of id: a replayed (source, doc)
      // always re-arrives with identical payload, so which duplicate row
      // dropDuplicates keeps is immaterial (the operator's contract says
      // nothing about WHICH copy of a contradictory redelivery wins)
    } yield (id, src,
      if (id % 3 == 0) null else if (id % 2 == 0) "en" else "fr", id * 10)
    val seqGen = Gen.listOfN(3, Gen.nonEmptyListOf(docGen).map(_.take(10)))
    val prop = Prop.forAll(seqGen) { batches =>
      val reg = tmp("graft_cstats_prop")
      batches.foreach { b =>
        CorpusStats.processBatch(
          b.toDF("doc_id", "source", "lang", "n_chars"), reg)
      }
      // ground truth: the deduplicated union of everything ever sent,
      // normalized exactly as the operator normalizes (null -> "");
      // (source, doc) is the identity key — lang rides along with it
      val union = batches.flatten
        .map { case (id, src, lang, c) =>
          (Option(src).getOrElse(""), id) ->
            (Option(lang).getOrElse(""), c) }
        .groupBy(_._1).map { case (k, vs) => (k, vs.head._2) }
      val expect = union.toSeq
        .groupBy { case ((src, _), (lang, _)) => (src, lang) }
        .map { case (cell, vs) =>
          cell -> (vs.size.toLong, vs.map(_._2._2).sum) }
      val got = CorpusStats.readRegistry(spark, reg)
        .select($"source", $"lang", $"doc_id", $"n_chars").distinct()
        .groupBy($"source", $"lang")
        .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n"),
          org.apache.spark.sql.functions.sum($"n_chars").as("c"))
        .as[(String, String, Long, Long)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
      got == expect
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("streaming feed writes per-cell verdicts through foreachBatch") {
    val reg = tmp("graft_cstats_reg5")
    val out = tmp("graft_cstats_out")
    val chk = tmp("graft_cstats_chk")
    val mem = MemoryStream[StatDoc]
    mem.addData(StatDoc(1, "srcA", "en", 100), StatDoc(2, "srcB", "fr", 50))
    val q = CorpusStats.feed(mem.toDF(), reg, out)
      .option("checkpointLocation", chk).start()
    try q.processAllAvailable() finally q.stop()
    val cells = spark.read.parquet(out)
      .as[(String, String, Long, Long, Long, Long)].collect().toSet
    assert(cells == Set(("srcA", "en", 1L, 100L, 1L, 100L),
      ("srcB", "fr", 1L, 50L, 1L, 50L)), s"$cells")
  }
}
