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

  // ── embedded batches: vector near-dup + semantic decontamination gates ──

  private def unit(i: Int): Array[Float] = { val a = Array.fill(64)(0f); a(i) = 1f; a }

  test("embedded batch: semantic + vector gates verdict per-doc; unembedded docs pass through") {
    val reg = tmp("graft_icur_e")
    val vreg = tmp("graft_icur_ev") + "/r"
    val bench = Seq(Tuple1(unit(0))).toDF("bench_vec")
    val t2 = "the cat sat on a mat of wool and slept all day"
    val t3 = "a bright moon rose over the hills and the valley slept"
    val docs = Seq(
      (1L, good, Option(unit(0))), // embedding = benchmark → semantically contaminated
      (2L, t2, Option(unit(1))),   // clean embedded
      (3L, t3, Option.empty[Array[Float]])) // unembedded → embedding gates pass
      .toDF("doc_id", "text", "embedding")
    val v = IngestCuration.processBatch(docs, reg,
      vecRegistryDir = Some(vreg), benchmark = Some(bench))
      .select($"doc_id", $"vec_is_dup", $"max_bench_sim", $"sem_clean", $"keep")
      .as[(Long, Boolean, Option[Long], Boolean, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(v(1L) == (1L, false, Some(1000000L), false, false),
      s"benchmark-equal embedding must flag semantic, got ${v(1L)}")
    assert(v(2L) == (2L, false, Some(0L), true, true), s"got ${v(2L)}")
    assert(v(3L) == (3L, false, None, true, true),
      s"unembedded doc must pass embedding gates, got ${v(3L)}")
  }

  test("embedded batch: vector near-dup vs corpus fires alone; rejected vectors still register") {
    val reg = tmp("graft_icur_e2")
    val vreg = tmp("graft_icur_ev2") + "/r"
    val bench = Seq(Tuple1(unit(0))).toDF("bench_vec")
    val t2 = "the cat sat on a mat of wool and slept all day"
    val b1 = Seq(
      (1L, good, Option(unit(0))), // semantically flagged, still registers its vector
      (2L, t2, Option(unit(1))))
      .toDF("doc_id", "text", "embedding")
    IngestCuration.processBatch(b1, reg,
      vecRegistryDir = Some(vreg), benchmark = Some(bench)).collect()
    // batch 2: new TEXTS (lexical gates pass), near-dup VECTORS
    val a = 0.995f; val s = math.sqrt(1 - a.toDouble * a).toFloat
    val near1 = unit(1).clone(); near1(1) = a; near1(2) = s // cos vs unit(1) = 0.995
    val t4 = "the river ran east past a quiet town of stone and wood"
    val t5 = "a train crossed the bridge and the children waved at it"
    val b2 = Seq(
      (11L, t4, Option(near1)),  // near-dup of admitted doc 2's vector
      (12L, t5, Option(unit(0)))) // near-dup of REJECTED doc 1's vector
      .toDF("doc_id", "text", "embedding")
    val v = IngestCuration.processBatch(b2, reg,
      vecRegistryDir = Some(vreg), benchmark = Some(bench))
      .select($"doc_id", $"is_dup", $"vec_is_dup", $"vec_dup_of", $"sem_clean", $"keep")
      .as[(Long, Boolean, Boolean, Option[Long], Boolean, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(v(11L) == (11L, false, true, Some(2L), true, false),
      s"only the vector gate should fire for 11: ${v(11L)}")
    assert(v(12L)._3 && v(12L)._4 == Some(1L),
      s"vector of seen-and-REJECTED doc must still flag as dup: ${v(12L)}")
    assert(!v(12L)._5 && !v(12L)._6, s"12 also matches the benchmark: ${v(12L)}")
  }

  test("ingest semantic verdict equals the batch gate (q84) on the real corpus") {
    // the streaming gate and the batch pipeline must agree: same benchmark,
    // same threshold, same quantized scoring — sem_clean per doc == q84 clean
    val dir = "/root/testdata/sf0.001"
    val reg = tmp("graft_icur_eq")
    val emb = graft.Tables.embeddings(spark, dir)
    val docs = graft.Tables.documents(spark, dir)
      .join(emb, $"doc_id" === $"vec_id")
      .select($"doc_id", $"text", $"embedding")
    val bench = emb.filter($"vec_id" < 25).select($"embedding".as("bench_vec"))
    val gateVerdicts = IngestCuration.processBatch(docs, reg, benchmark = Some(bench))
      .filter($"doc_id" >= 25) // q84's corpus excludes the benchmark itself
      .select($"doc_id", $"sem_clean").as[(Long, Boolean)].collect().toMap
    val batchVerdicts = graft.queries.TrainingDataQueries
      .semanticDecontaminate(spark, dir)
      .select($"vec_id", $"clean").as[(Long, Boolean)].collect().toMap
    assert(gateVerdicts.size == batchVerdicts.size)
    val disagree = gateVerdicts.filter { case (id, c) => batchVerdicts(id) != c }
    assert(disagree.isEmpty, s"gate != batch on ${disagree.take(5)}")
    assert(gateVerdicts.values.count(!_) > 0, "threshold must bind on real data")
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

  test("streaming gate with embeddings: all five verdicts audited across micro-batches") {
    val reg = tmp("graft_icur_se")
    val vreg = tmp("graft_icur_sev") + "/r"
    val out = tmp("graft_icur_seo") + "/v"
    val bench = Seq(Tuple1(unit(0))).toDF("bench_vec")
    val t2 = "the cat sat on a mat of wool and slept all day"
    val ms = MemoryStream[(Long, String, Option[Array[Float]])]
    ms.addData((1L, good, Some(unit(0))), (2L, t2, Some(unit(1))))
    val q = IngestCuration.gate(
      ms.toDF().toDF("doc_id", "text", "embedding"), reg, out,
      vecRegistryDir = Some(vreg), benchmark = Some(bench))
      .option("checkpointLocation", tmp("graft_icur_seck")).start()
    try {
      q.processAllAvailable()
      // next batch: a vector near-dup of doc 2 under fresh text
      val t4 = "the river ran east past a quiet town of stone and wood"
      ms.addData((11L, t4, Some(unit(1))), (12L, good + " zz", None))
      q.processAllAvailable()
      val rows = spark.read.parquet(out)
        .select($"doc_id", $"is_dup", $"quality_ok", $"lang_ok",
          $"vec_is_dup", $"sem_clean", $"keep")
        .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
        .collect().map(r => r._1 -> r).toMap
      assert(!rows(1L)._6 && !rows(1L)._7, s"1 is benchmark-contaminated: ${rows(1L)}")
      assert(rows(2L)._7, s"2 passes every gate: ${rows(2L)}")
      assert(rows(11L)._5 && !rows(11L)._7 && !rows(11L)._2,
        s"11 drops on the vector gate alone: ${rows(11L)}")
      assert(rows(12L)._2 && !rows(12L)._5 && rows(12L)._6,
        s"12 is a lexical dup, unembedded: ${rows(12L)}")
    } finally q.stop()
  }

  test("gate cadence compacts the mix registry too; accounting survives the rewrite") {
    val reg = tmp("graft_icur_mc")
    val mix = tmp("graft_icur_mcm") + "/m"
    val out = tmp("graft_icur_mco") + "/v"
    val ms = MemoryStream[(Long, String, String)]
    val q = IngestCuration.gate(ms.toDF().toDF("doc_id", "text", "source"),
        reg, out, mixRegistryDir = Some(mix),
        mixTargetPpm = Map("en" -> 1000000L), compactEvery = 1)
      .option("checkpointLocation", tmp("graft_icur_mck")).start()
    try {
      ms.addData((1L, good, "s0"), (2L, good2, "s0")); q.processAllAvailable()
      ms.addData((3L, good3, "s0")); q.processAllAvailable()
      ms.addData((4L, good4, "s0")); q.processAllAvailable()
      // one source → ONE sbucket partition: three registering batches
      // would leave ≥3 files without the cadence; each tick rewrites the
      // partition to one file, so the probe-time file growth SCALE.md's
      // file_growth regime measures cannot accrue here
      def parquetFiles(dir: String): Int = {
        val it = java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator()
        var n = 0
        while (it.hasNext) if (it.next().toString.endsWith(".parquet")) n += 1
        n
      }
      assert(parquetFiles(mix) == 1, s"mix registry not compacted: ${parquetFiles(mix)} files")
      // the accounting survived three rewrites: every kept doc once, in
      // the doc-grained rows AND the derived rollup, and the last batch
      // (evaluated against a compacted registry) still admitted
      assert(CorpusStats.readRegistry(spark, mix).count() == 4)
      val rollup = CorpusStats.readRollup(spark, mix)
        .select($"n_docs").as[Long].collect().sum
      assert(rollup == 4L, s"rollup out of sync after compaction: $rollup")
      val kept = spark.read.parquet(out).filter($"keep")
        .select($"doc_id").as[Long].collect().toSet
      assert(kept == Set(1L, 2L, 3L, 4L), s"got $kept")
    } finally q.stop()
  }

  // ── per-domain quota gate (composed last, survivors-only) ──

  private val good2 = "a calm sea and the bright sun of morning waves and light"
  private val good3 = "the old tree stood by a stone wall of moss and ivy there"
  private val good4 = "a small bird flew over the green field of corn and rye now"

  private def runQ(docs: Seq[(Long, String, String)], reg: String,
                   qreg: String, cap: Int) =
    IngestCuration.processBatch(docs.toDF("doc_id", "text", "source"), reg,
      quotaRegistryDir = Some(qreg), quotaCap = cap)
      .select($"doc_id", $"keep", $"quota_admitted", $"is_dup", $"quality_ok")
      .as[(Long, Boolean, Option[Boolean], Boolean, Boolean)].collect()
      .map(r => r._1 -> r).toMap

  test("quota gate: only survivors of the other gates consume domain quota") {
    val reg = tmp("graft_icur_q"); val qreg = tmp("graft_icur_qreg")
    // two good docs + junk, all srcA, cap 2: junk fails quality and must
    // NOT take a slot — both good docs admit
    val v1 = runQ(Seq((1L, good, "srcA"), (2L, good2, "srcA"),
      (3L, junk, "srcA")), reg, qreg, cap = 2)
    assert(v1(1L)._2 && v1(1L)._3.contains(true), s"got ${v1(1L)}")
    assert(v1(2L)._2 && v1(2L)._3.contains(true), s"got ${v1(2L)}")
    assert(!v1(3L)._2 && v1(3L)._3.isEmpty,
      s"failed-gate doc never reaches the quota: ${v1(3L)}")
    // srcA is now full: a fresh good doc is gate-clean but quota-rejected;
    // srcB is independent
    val v2 = runQ(Seq((4L, good3, "srcA"), (5L, good4, "srcB")), reg, qreg, cap = 2)
    assert(!v2(4L)._2 && v2(4L)._3.contains(false) && !v2(4L)._4 && v2(4L)._5,
      s"gate-clean but over quota: ${v2(4L)}")
    assert(v2(5L)._2 && v2(5L)._3.contains(true), s"srcB independent: ${v2(5L)}")
  }

  test("quota gate enabled without a cap fails fast, not as a silent total drop") {
    val reg = tmp("graft_icur_q0"); val qreg = tmp("graft_icur_q0reg")
    intercept[IllegalArgumentException] {
      IngestCuration.processBatch(
        Seq((1L, good, "srcA")).toDF("doc_id", "text", "source"), reg,
        quotaRegistryDir = Some(qreg)) // quotaCap left at the 0 default
    }
  }

  test("quota gate: at-least-once replay keeps verdicts and consumes no quota") {
    val reg = tmp("graft_icur_qr"); val qreg = tmp("graft_icur_qrreg")
    val batch = Seq((1L, good, "srcA"), (2L, good2, "srcA"))
    val v1 = runQ(batch, reg, qreg, cap = 2)
    assert(v1.values.forall(_._2), s"both under cap: $v1")
    val v2 = runQ(batch, reg, qreg, cap = 2)
    assert(v2.values.forall(v => v._2 && v._3.contains(true)),
      s"replay keeps keep=true without double-charging the quota: $v2")
    // the quota is genuinely still full, not freed or double-counted
    val v3 = runQ(Seq((9L, good3, "srcA")), reg, qreg, cap = 2)
    assert(!v3(9L)._2 && v3(9L)._3.contains(false), s"got ${v3(9L)}")
  }

  test("PII audit: counts and digest reported, never a gate; off by default") {
    val reg = tmp("graft_icur_pii")
    val pii = good + " contact bob@example.com or 10.1.2.3 call 555-123-4567"
    val batch = Seq(30L -> pii, 31L -> good).toDF("doc_id", "text")
    val v = IngestCuration.processBatch(batch, reg, scrubPii = true)
      .select($"doc_id", $"n_emails", $"n_ipv4", $"n_phones", $"clean_md5", $"keep")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert((v(30L).getInt(1), v(30L).getInt(2), v(30L).getInt(3)) == ((1, 1, 1)))
    assert((v(31L).getInt(1), v(31L).getInt(2), v(31L).getInt(3)) == ((0, 0, 0)))
    assert(v(30L).getBoolean(5), "PII must never reject a document")
    // the digest is reproducible by applying the same scrub downstream
    val expected = graft.operators.TextAnalysis.piiScrub(batch)
      .select($"doc_id", org.apache.spark.sql.functions.md5($"clean_text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v(30L).getString(4) == expected(30L) && v(31L).getString(4) == expected(31L))
    assert(!expected(30L).isEmpty && expected(30L) != expected(31L))
    // off by default: audit columns stay null
    val off = IngestCuration.processBatch(
      Seq(32L -> pii).toDF("doc_id", "text"), tmp("graft_icur_piioff"))
      .select($"n_emails", $"clean_md5").collect().head
    assert(off.isNullAt(0) && off.isNullAt(1))
  }

  test("centroid gate: labeled embeddings far from their class centroid drop; others pass") {
    val reg = tmp("graft_icur_cent")
    // model artifact: label 0 centered at e0, label 1 at e1 (3 refs each)
    val ref = (Seq.fill(3)(0 -> unit(0)) ++ Seq.fill(3)(1 -> unit(1)))
      .toDF("label", "embedding")
    val cent = graft.operators.Similarity.labelCentroids(ref)
    val neg = { val a = Array.fill(64)(0f); a(0) = -1f; a }
    val t = Seq(good,
      "the cat sat on a mat of wool and slept all day",
      "a bright moon rose over the hills and the valley slept",
      "the ship sailed a calm sea of glass and found land",
      "a quiet rain fell on the roof of the old barn")
    val docs = Seq(
      (1L, t(0), Option(unit(0)), Option(0)),  // on-centroid → passes
      (2L, t(1), Option(neg), Option(0)),      // anti-centroid → outlier, drops
      (3L, t(2), Option(unit(1)), Option.empty[Int]), // unlabeled → passes
      (4L, t(3), Option(unit(0)), Option(9)),  // label with no centroid → passes
      (5L, t(4), Option.empty[Array[Float]], Option(1))) // unembedded → passes
      .toDF("doc_id", "text", "embedding", "label")
    val v = IngestCuration.processBatch(docs, reg, centroids = Some(cent))
      .select($"doc_id", $"centroid_sim", $"centroid_ok", $"keep")
      .as[(Long, Option[Long], Boolean, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(v(1L) == (1L, Some(1000000L), true, true), s"got ${v(1L)}")
    assert(v(2L) == (2L, Some(-1000000L), false, false),
      s"anti-centroid doc must drop on the centroid gate alone: ${v(2L)}")
    assert(v(3L) == (3L, None, true, true), s"unlabeled must pass: ${v(3L)}")
    assert(v(4L) == (4L, None, true, true),
      s"unknown label must pass, not crash or drop: ${v(4L)}")
    assert(v(5L) == (5L, None, true, true), s"unembedded must pass: ${v(5L)}")
    // off by default: audit columns null/true even for embedded batches
    val off = IngestCuration.processBatch(docs, tmp("graft_icur_centoff"))
      .select($"centroid_sim", $"centroid_ok").collect()
    assert(off.forall(r => r.isNullAt(0) && r.getBoolean(1)))
  }

  test("nine gates composed in one batch: each failure attributes to its own gate, quota sees only full survivors") {
    val reg = tmp("graft_icur_all"); val vreg = tmp("graft_icur_allv") + "/r"
    val qreg = tmp("graft_icur_allq")
    val ref = (Seq.fill(3)(0 -> unit(0)) ++ Seq.fill(3)(1 -> unit(1)))
      .toDF("label", "embedding")
    val cent = graft.operators.Similarity.labelCentroids(ref)
    val bench = Seq(Tuple1(unit(0))).toDF("bench_vec")
    val model = graft.operators.TextAnalysis.bigramLm(
      Seq(good, good2, good3).toDF("text"))
    val neg1 = { val a = Array.fill(64)(0f); a(1) = -1f; a }
    // one "the" marker keeps langId at en; everything else is rare bigrams
    // (scores 42619 ppm under this model, below the 50000 gate; the clean
    // texts score 73681+)
    val gib = "the zq zq jx jx qz qz xj xj wq wq qw qw zz qq xx jj"
    // the LEXICAL benchmark: common-letter English (so the fluency model
    // fit above scores it like the clean texts) sharing no trigram with
    // any other doc in the batch
    val benchText = "the red boat sailed down a long river of salt and foam"
    val benchSh = graft.operators.Dedup.shingles(
      Seq(100L -> benchText).toDF("doc_id", "text")).select($"shingle")
    // embeddings sit on DISTINCT axes: orthogonal pairs (cos 0) never trip
    // the 0.99 vector near-dup gate, while the loose -0.1 centroid
    // threshold still passes them — only doc 2's anti-centroid fails it
    val batch = Seq(
      // clean in every dimension + planted PII (audit, never a gate)
      (1L, good + " mail bob@example.com", "srcZ", Option(unit(1)), Option(1)),
      (2L, good2, "srcZ", Option(neg1), Option(1)),   // centroid outlier only
      (3L, gib, "srcZ", Option(unit(2)), Option(1)),  // disfluent only
      (4L, "the river ran past a mill of oak and iron each day",
        "srcZ", Option(unit(0)), Option(0)), // semantic hit only
      (5L, good3, "srcZ", Option(unit(3)), Option(1)), // clean
      (6L, good4, "srcZ", Option(unit(4)), Option(1)), // clean — cap binds
      (7L, benchText, "srcZ", Option(unit(5)), Option(1))) // lexical hit only
      .toDF("doc_id", "text", "source", "embedding", "label")
    val v = IngestCuration.processBatch(batch, reg,
        vecRegistryDir = Some(vreg), benchmark = Some(bench),
        centroids = Some(cent), bigramModel = Some(model),
        minFluencyPpm = 50000L, quotaRegistryDir = Some(qreg), quotaCap = 2,
        scrubPii = true, benchShingles = Some(benchSh))
      .select($"doc_id", $"centroid_ok", $"fluency_ok", $"sem_clean",
        $"quota_admitted", $"keep", $"n_emails", $"lex_clean")
      .as[(Long, Boolean, Boolean, Boolean, Option[Boolean], Boolean, Int, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(!v(2L)._2 && !v(2L)._6 && v(2L)._5.isEmpty,
      s"centroid failure alone, never consuming quota: ${v(2L)}")
    assert(!v(3L)._3 && !v(3L)._6 && v(3L)._5.isEmpty,
      s"fluency failure alone, never consuming quota: ${v(3L)}")
    assert(!v(4L)._4 && v(4L)._2 && !v(4L)._6 && v(4L)._5.isEmpty,
      s"semantic hit with a PASSING centroid, never consuming quota: ${v(4L)}")
    assert(!v(7L)._8 && v(7L)._2 && v(7L)._3 && v(7L)._4 &&
      !v(7L)._6 && v(7L)._5.isEmpty,
      s"lexical hit alone — every other gate passing, no quota consumed: ${v(7L)}")
    assert(Seq(1L, 2L, 3L, 4L, 5L, 6L).forall(id => v(id)._8),
      "no other doc trips the lexical gate")
    // three fully-clean docs (1, 5, 6) under cap 2: exactly two keep,
    // one is gate-clean but quota-rejected
    val clean = Seq(1L, 5L, 6L).map(v)
    assert(clean.forall(r => r._2 && r._3 && r._4), s"$clean")
    assert(clean.count(_._6) == 2, s"cap must bind at 2: $clean")
    val over = clean.find(!_._6).get
    assert(over._5 == Some(false), s"over-quota is attributed, not a gate: $over")
    assert(v(1L)._7 == 1 && clean.filter(_._1 != 1L).forall(_._7 == 0),
      "PII audit rides along without gating")
  }

  test("lexical decontamination gate: verbatim benchmark overlap drops, clean and short docs pass, off by default") {
    val reg = tmp("graft_icur_lex")
    val benchText = "the secret benchmark answer is forty two of course and obviously"
    val bench = graft.operators.Dedup.shingles(
        Seq((100L, benchText)).toDF("doc_id", "text"))
      .select($"shingle").distinct()
    // contaminated = the benchmark text verbatim (plus en markers already
    // present); clean = same length, disjoint vocabulary; short = no shingles
    val docs = Seq(1L -> benchText, 2L -> good, 3L -> short)
    val v = IngestCuration.processBatch(docs.toDF("doc_id", "text"), reg,
        benchShingles = Some(bench))
      .select($"doc_id", $"bench_overlap_frac", $"lex_clean", $"keep")
      .as[(Long, Option[Double], Boolean, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(v(1L)._2.contains(1.0) && !v(1L)._3 && !v(1L)._4,
      s"verbatim benchmark content must flag and drop: ${v(1L)}")
    assert(v(2L)._2.contains(0.0) && v(2L)._3 && v(2L)._4,
      s"disjoint-vocabulary doc must pass: ${v(2L)}")
    assert(v(3L)._2.isEmpty && v(3L)._3,
      s"unshingleable short doc passes with a null fraction: ${v(3L)}")
    // a doc_id under TWO variants — one verbatim-contaminated, one long
    // and clean — must still flag: fractions are per variant and the doc
    // aggregation is conservative (pooling the variants' shingles would
    // dilute the contaminated one below the threshold)
    val reg2 = tmp("graft_icur_lex_var")
    val vv = IngestCuration.processBatch(
        Seq(5L -> benchText, 5L -> (good + " plus extra clean trailing words here"))
          .toDF("doc_id", "text"), reg2, benchShingles = Some(bench))
      .select($"doc_id", $"bench_overlap_frac", $"lex_clean")
      .as[(Long, Option[Double], Boolean)].collect()
    assert(vv.length == 1 && vv.head._2.contains(1.0) && !vv.head._3,
      s"any contaminated variant must flag the doc: ${vv.toSeq}")
    // off by default: the same contaminated doc sails through a gate
    // without a benchmark set (fresh registry so dedup can't interfere)
    val off = IngestCuration.processBatch(
        Seq(9L -> benchText).toDF("doc_id", "text"), tmp("graft_icur_lex_off"))
      .select($"bench_overlap_frac", $"lex_clean", $"keep")
      .as[(Option[Double], Boolean, Boolean)].collect().head
    assert(off._1.isEmpty && off._2 && off._3, s"$off")
  }

  test("ingest lexical verdict equals the batch gate (q59 semantics) on the real corpus") {
    val reg = tmp("graft_icur_lex_eq")
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val bench = graft.operators.Dedup.shingles(docs.filter($"source" === "src0"))
      .select($"shingle").distinct().localCheckpoint(true)
    val eval = docs.filter($"source" =!= "src0").select($"doc_id", $"text").limit(120)
    val gate = IngestCuration.processBatch(eval, reg, benchShingles = Some(bench))
      .select($"doc_id", $"bench_overlap_frac")
      .as[(Long, Option[Double])].collect().toMap
    // q59's own algebra over the same slice: distinct shingles per doc,
    // overlap count against the bench set, fraction
    val dsh = graft.operators.Dedup.shingles(eval).distinct().localCheckpoint(true)
    val tot = dsh.groupBy($"doc_id").agg(org.apache.spark.sql.functions.count(
      org.apache.spark.sql.functions.lit(1)).as("n"))
    val ov = dsh.join(bench, "shingle").groupBy($"doc_id")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("o"))
    val expect = tot.join(ov, Seq("doc_id"), "left")
      .select($"doc_id",
        (org.apache.spark.sql.functions.coalesce($"o",
          org.apache.spark.sql.functions.lit(0L)).cast("double") / $"n").as("f"))
      .as[(Long, Double)].collect().toMap
    assert(expect.nonEmpty, "the slice must actually shingle")
    expect.foreach { case (id, f) =>
      assert(gate(id).contains(f), s"doc $id: gate ${gate(id)} vs batch $f")
    }
    // docs the batch algebra can't shingle must surface as null, not 0
    (gate.keySet -- expect.keySet).foreach(id =>
      assert(gate(id).isEmpty, s"unshingled doc $id must carry null"))
  }

  test("trained-classifier gate: scrambled text drops under a fitted weight table; score matches the batch operator") {
    val reg = tmp("graft_icur_clf")
    val ref = Seq(good,
      "the cat sat on a mat of wool and slept all day",
      "a bright moon rose over the hills and the valley slept",
      "the ship sailed a calm sea of glass and found land").toDF("text")
    val w = graft.operators.QualityClassifier.fit(ref)
    // a word-salad doc: same vocabulary register, destroyed order — exactly
    // what the src0-vs-shuffled training taught the weights to punish
    val salad = "dog lazy a over day all slept wool of mat the and cat sat"
    val batch = Seq(50L -> good, 51L -> salad).toDF("doc_id", "text")
    val expect = graft.operators.QualityClassifier.score(batch, w)
      .select($"doc_id", $"quality_score").as[(Long, Double)].collect().toMap
    assert(expect(50L) > expect(51L), s"the scorer must discriminate: $expect")
    val thresh = (expect(50L) + expect(51L)) / 2
    val v = IngestCuration.processBatch(batch, reg,
        qualityModel = Some(w), minQualityScore = thresh)
      .select($"doc_id", $"clf_score", $"clf_ok", $"keep")
      .as[(Long, Option[Double], Boolean, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // the gate's score IS the batch operator's score (one shared definition)
    assert(v(50L)._2 == Some(expect(50L)) && v(51L)._2 == Some(expect(51L)))
    assert(v(50L)._3 && v(50L)._4, s"fluent doc must pass: ${v(50L)}")
    assert(!v(51L)._3 && !v(51L)._4,
      s"word salad must drop on the classifier gate alone: ${v(51L)}")
    // off by default
    val off = IngestCuration.processBatch(batch, tmp("graft_icur_clfoff"))
      .select($"clf_score", $"clf_ok").collect()
    assert(off.forall(r => r.isNullAt(0) && r.getBoolean(1)))
  }

  test("mix gate: overrepresented stratum throttles by h16, kept docs register, quota never sees mix-rejected docs") {
    val reg = tmp("graft_icur_mix"); val mReg = tmp("graft_icur_mixreg")
    val qReg = tmp("graft_icur_mixq")
    // accounting says the corpus is 90% en / 10% fr by char mass
    CorpusStats.seedRegistry((0 until 900).map(i =>
      (100000L + i, "s", "en", 100L)).toDF("doc_id", "source", "lang", "n_chars"), mReg)
    CorpusStats.seedRegistry((0 until 100).map(i =>
      (200000L + i, "s", "fr", 100L)).toDF("doc_id", "source", "lang", "n_chars"), mReg)
    val target = Map("en" -> 500000L, "fr" -> 500000L)
    val rateEn = 500000.0 / 900000.0 // = target / current share (ppm)
    val enTexts = Seq(
      good, good2, good3, good4,
      "the river ran past a mill of oak and iron each day",
      "a quiet rain fell on the roof of the old barn and yard")
    val frTexts = Seq(
      "le chat noir et la souris des champs dorment sous le toit",
      "la mer calme et le vent des collines portent la barque")
    val batch = (enTexts.zipWithIndex.map { case (t, i) => (10L + i, t, "srcM") } ++
      frTexts.zipWithIndex.map { case (t, i) => (20L + i, t, "srcM") })
      .toDF("doc_id", "text", "source")
    def h16(id: Long): Int = Integer.parseInt(
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .substring(0, 4), 16)
    val v = IngestCuration.processBatch(batch, reg,
        quotaRegistryDir = Some(qReg), quotaCap = 100,
        mixRegistryDir = Some(mReg), mixTargetPpm = target)
      .select($"doc_id", $"predicted_lang", $"mix_rate", $"mix_admitted",
        $"quota_admitted", $"keep")
      .as[(Long, String, Option[Double], Option[Boolean], Option[Boolean], Boolean)]
      .collect().map(r => r._1 -> r).toMap
    // fr is underrepresented: full rate, everything admitted
    (20L until 22L).foreach { id =>
      assert(v(id)._2 == "fr" && v(id)._3 == Some(1.0) && v(id)._4 == Some(true)
        && v(id)._6, s"fr doc must sail through: ${v(id)}")
    }
    // en throttles at exactly the h16 rate — replayed JVM-side per doc
    (10L until 16L).foreach { id =>
      val expectAdmit = h16(id) < rateEn * 65536.0
      assert(v(id)._3 == Some(rateEn), s"rate audit: ${v(id)}")
      assert(v(id)._4 == Some(expectAdmit) && v(id)._6 == expectAdmit,
        s"doc $id h16=${h16(id)} vs ${rateEn * 65536.0}: ${v(id)}")
    }
    val rejected = (10L until 16L).filter(id => !v(id)._6)
    assert(rejected.nonEmpty, "the throttle must bind on this batch")
    // a mix-rejected doc never consumed quota
    rejected.foreach(id => assert(v(id)._5.isEmpty,
      s"mix-rejected doc $id must not reach the quota gate: ${v(id)}"))
    // only kept docs registered into the accounting registry
    val registered = CorpusStats.readRegistry(spark, mReg)
      .filter($"doc_id" >= 10L && $"doc_id" < 30L)
      .select($"doc_id").as[Long].collect().toSet
    val keptIds = v.values.filter(_._6).map(_._1).toSet
    assert(registered == keptIds, s"registry $registered vs kept $keptIds")
    // replay: identical verdicts, nothing re-charged
    val v2 = IngestCuration.processBatch(batch, reg,
        quotaRegistryDir = Some(qReg), quotaCap = 100,
        mixRegistryDir = Some(mReg), mixTargetPpm = target)
      .select($"doc_id", $"mix_admitted", $"keep")
      .as[(Long, Option[Boolean], Boolean)].collect().map(r => r._1 -> r).toMap
    // the batch is now a near-dup of itself in the lexical registry — the
    // DEDUP gate flags it; the mix columns though must stay consistent:
    // previously-kept docs are found in the accounting registry (admitted),
    // and nothing new registered
    val registered2 = CorpusStats.readRegistry(spark, mReg)
      .filter($"doc_id" >= 10L && $"doc_id" < 30L)
      .select($"doc_id").as[Long].collect().toSet
    assert(registered2 == keptIds, "replay must add nothing to the accounting")
    // off by default: mix columns stay null
    val off = IngestCuration.processBatch(
      Seq((40L, good, "srcM")).toDF("doc_id", "text", "source"),
      tmp("graft_icur_mixoff"))
      .select($"mix_rate", $"mix_admitted").collect().head
    assert(off.isNullAt(0) && off.isNullAt(1))
  }

  test("multi-source doc_id: centroid and fluency gates emit one verdict per (doc, source), min-conservative") {
    val reg = tmp("graft_icur_ms"); val qreg = tmp("graft_icur_msq")
    val ref = (Seq.fill(3)(0 -> unit(0)) ++ Seq.fill(3)(1 -> unit(1)))
      .toDF("label", "embedding")
    val cent = graft.operators.Similarity.labelCentroids(ref)
    val model = graft.operators.TextAnalysis.bigramLm(
      Seq(good, good2, good3).toDF("text"))
    val neg = { val a = Array.fill(64)(0f); a(0) = -1f; a }
    // doc 1 arrives under TWO sources, with differing labels per row: the
    // quota contract says one verdict per (doc, source); the scored gates
    // must aggregate per doc (min = conservative) instead of multiplying
    // rows through the id-only join — the on-centroid label-0 row must NOT
    // mask the anti-centroid label-1 claim
    val batch = Seq(
      (1L, good, "srcA", Option(unit(0)), Option(0)),
      (1L, good, "srcB", Option(neg), Option(0)),
      (2L, good2, "srcA", Option(unit(1)), Option(1)))
      .toDF("doc_id", "text", "source", "embedding", "label")
    val out = IngestCuration.processBatch(batch, reg,
        centroids = Some(cent), bigramModel = Some(model),
        minFluencyPpm = 50000L,
        quotaRegistryDir = Some(qreg), quotaCap = 5)
      .select($"doc_id", $"quota_source", $"centroid_sim", $"centroid_ok",
        $"fluency_ppm", $"fluency_ok")
      .as[(Long, String, Option[Long], Boolean, Option[Long], Boolean)]
      .collect()
    assert(out.length == 3, s"one row per (doc, source), no blow-up: ${out.toSeq}")
    assert(out.map(r => (r._1, r._2)).distinct.length == 3,
      s"(doc, source) keys must be unique: ${out.toSeq}")
    val d1 = out.filter(_._1 == 1L)
    assert(d1.forall(r => r._3 == Some(-1000000L) && !r._4),
      s"doc 1's verdict is the conservative min across its label claims: ${d1.toSeq}")
    assert(d1.map(_._5).distinct.length == 1 && d1.forall(_._6),
      s"one fluency score per doc, duplicated rows notwithstanding: ${d1.toSeq}")
    // without the quota gate the grain is one row per doc
    val off = IngestCuration.processBatch(batch, tmp("graft_icur_msoff"),
        centroids = Some(cent), bigramModel = Some(model), minFluencyPpm = 50000L)
      .select($"doc_id").as[Long].collect().sorted
    assert(off.toSeq == Seq(1L, 2L), s"per-doc grain when quota is off: ${off.toSeq}")
  }

  test("fluency gate: disfluent docs drop under a fitted model; score matches the batch operator") {
    val reg = tmp("graft_icur_flu")
    // reference slice: ordinary english-marker text (the corpus the model
    // should consider fluent)
    val ref = Seq(good,
      "the cat sat on a mat of wool and slept all day",
      "a bright moon rose over the hills and the valley slept").toDF("text")
    val model = graft.operators.TextAnalysis.bigramLm(ref)
    // a batch doc made of characters the model has barely seen scores low
    val gibberish = "the zq zq jx jx qz qz xj xj wq wq qw qw zz qq xx jj"
    val batch = Seq(40L -> good, 41L -> gibberish).toDF("doc_id", "text")
    val v = IngestCuration.processBatch(batch, reg,
        bigramModel = Some(model), minFluencyPpm = 50000L)
      .select($"doc_id", $"fluency_ppm", $"fluency_ok", $"keep")
      .as[(Long, Option[Long], Boolean, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // the gate's score IS the batch operator's score (one shared definition)
    val expect = graft.operators.TextAnalysis.lmFluency(batch, model._1, model._2)
      .select($"doc_id", $"fluency_ppm")
      .as[(Long, Long)].collect().toMap
    assert(v(40L)._2 == Some(expect(40L)) && v(41L)._2 == Some(expect(41L)))
    assert(v(40L)._3 && v(40L)._4, s"fluent doc must pass: ${v(40L)}")
    assert(!v(41L)._3 && !v(41L)._4,
      s"gibberish must drop on the fluency gate alone: ${v(41L)} (score ${expect(41L)})")
    // off by default
    val off = IngestCuration.processBatch(batch, tmp("graft_icur_fluoff"))
      .select($"fluency_ppm", $"fluency_ok").collect()
    assert(off.forall(r => r.isNullAt(0) && r.getBoolean(1)))
  }
}
