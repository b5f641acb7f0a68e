package graft.sources

import graft.SparkTestSession
import graft.operators.Similarity
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** [[IvfIndexStore]]'s layout contract — what q112's SQL gate cannot see:
  * that the serving read actually PRUNES to the probed lists (the whole
  * point of persisting the index), that the store equals the in-memory
  * probe path exactly, and that the codebook subdir stays invisible to
  * list discovery. */
class IvfIndexStoreSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = graft.Tables.embeddings(spark, dir)
  private lazy val store = {
    val d = java.nio.file.Files.createTempDirectory("graft_ivfstore").toString
    IvfIndexStore.build(emb, d, nlist = 16)
    d
  }
  private lazy val qvec: Seq[Float] = {
    import spark.implicits._
    emb.filter($"vec_id" === 0L).select($"embedding").as[Seq[Float]].head()
  }

  test("served top-k equals the in-memory probe path row for row") {
    val served = IvfIndexStore.topK(spark, store, qvec, k = 10, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val inMem = Similarity.ivfTopK(emb, queryId = 0L, k = 10,
      nlist = 16, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(served == inMem)
  }

  test("the serving scan prunes to the probed partitions") {
    val probes = IvfIndexStore.probeLists(spark, store, qvec, nprobe = 2)
    assert(probes.length == 2 && probes.toSet.size == 2)
    val plan = IvfIndexStore.topK(spark, store, qvec, k = 10, nprobe = 2)
      .queryExecution.executedPlan.toString
    // the probe ids must land as LITERALS in the scan's partition filter —
    // checked INSIDE the "PartitionFilters: [...]" segment (a bare
    // plan.contains(p) is vacuous for small-int ids that appear anywhere
    // in an executed-plan string)
    val pfStart = plan.indexOf("PartitionFilters: [")
    assert(pfStart >= 0 && plan.startsWith("PartitionFilters: [centroid_id", pfStart), plan)
    val pf = plan.substring(pfStart, plan.indexOf("]", pfStart) max (pfStart + 1))
    probes.foreach(p => assert(pf.contains(p.toString), s"probe $p not in $pf"))
    // and the probed read returns rows from exactly those lists
    val listed = spark.read.parquet(store)
      .filter(col("centroid_id").isin(probes: _*))
      .select(col("centroid_id")).distinct()
      .collect().map(_.getAs[Number]("centroid_id").longValue()).toSet
    assert(listed == probes.toSet)
  }

  test("batched serving equals per-query serving row for row") {
    import spark.implicits._
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val got = IvfIndexStore.topKBatch(spark, store, queries, k = 10, nprobe = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val single = (0L until 5L).flatMap { qid =>
      val qv = emb.filter($"vec_id" === qid).select($"embedding").as[Seq[Float]].head()
      IvfIndexStore.topK(spark, store, qv, k = 10, nprobe = 2)
        .collect().zipWithIndex
        .map { case (r, i) => (qid, i + 1, r.getLong(0), r.getLong(1)) }
    }.toSet
    assert(got == single)
  }

  test("batched scan's partition filter is the union of the queries' probes") {
    import spark.implicits._
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val expected = (0L until 5L).flatMap { qid =>
      val qv = emb.filter($"vec_id" === qid).select($"embedding").as[Seq[Float]].head()
      IvfIndexStore.probeLists(spark, store, qv, nprobe = 2)
    }.toSet
    assert(expected.size <= 10) // ≤ |batch|·nprobe by construction
    val plan = IvfIndexStore.topKBatch(spark, store, queries, k = 10, nprobe = 2)
      .queryExecution.executedPlan.toString
    val pfStart = plan.indexOf("PartitionFilters: [")
    assert(pfStart >= 0 && plan.startsWith("PartitionFilters: [centroid_id", pfStart), plan)
    val pf = plan.substring(pfStart, plan.indexOf("]", pfStart) max (pfStart + 1))
    // every probed list is in the filter, and nothing beyond the union is:
    // the in-filter literal count equals the probed-union size (≤ batch·nprobe)
    expected.foreach(p => assert(pf.contains(p.toString), s"probe $p not in $pf"))
    // strip attribute expression ids (centroid_id#123) before extracting
    // literals, so only the IN-list values remain
    val inFilter = "\\b\\d+\\b".r.findAllIn(pf.replaceAll("#\\d+", "")).map(_.toLong).toSet
    assert(inFilter == expected, s"filter lists $inFilter, probes $expected")
  }

  private def parquetFiles(f: java.io.File): Seq[java.io.File] =
    if (f.isDirectory) f.listFiles.toSeq.flatMap(parquetFiles)
    else if (f.getName.endsWith(".parquet")) Seq(f) else Seq.empty

  test("codebook: 16 rows, hidden from list discovery, lists cover the corpus") {
    assert(IvfIndexStore.codebook(spark, store).count() == 16)
    val lists = spark.read.parquet(store)
    // _codebook must not surface as data or break partition discovery;
    // every input column (label, the filtered-ANN metadata) rides the lists
    assert(lists.columns.toSet ==
      Set("vec_id", "embedding", "label", "centroid_id", "ingest_batch"))
    assert(lists.count() == emb.count())
    // one directory per non-empty list, each bounded to one task's files
    val listDirs = new java.io.File(store).listFiles
      .filter(_.getName.startsWith("centroid_id=")).toSeq
    assert(listDirs.nonEmpty && listDirs.size <= 16)
    listDirs.foreach { d =>
      assert(parquetFiles(d).size == 1, s"${d.getName}: one file per list")
    }
  }

  test("sink: appended batches serve identically to a one-shot bulk build") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_ivfsink").toString
    val base = emb.filter($"vec_id" < 300)
    IvfIndexStore.build(base, d, nlist = 16)
    IvfIndexStore.appendBatch(
      emb.filter($"vec_id" >= 300 && $"vec_id" < 400), d, batchId = 0)
    IvfIndexStore.appendBatch(emb.filter($"vec_id" >= 400), d, batchId = 1)
    assert(spark.read.parquet(d).count() == emb.count())
    val grown = IvfIndexStore.topK(spark, d, qvec, k = 10, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // one-shot build over everything, same codebook (vec_id < 16 ⊂ base)
    val oneShot = java.nio.file.Files.createTempDirectory("graft_ivfone").toString
    IvfIndexStore.build(emb, oneShot, nlist = 16)
    val bulk = IvfIndexStore.topK(spark, oneShot, qvec, k = 10, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(grown == bulk,
      "a grown store must serve exactly what a rebuild would")
  }

  test("sink: an at-least-once replay rewrites its partitions, never doubles") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_ivfreplay").toString
    IvfIndexStore.build(emb.filter($"vec_id" < 300), d, nlist = 16)
    val batch = emb.filter($"vec_id" >= 300 && $"vec_id" < 400)
    IvfIndexStore.appendBatch(batch, d, batchId = 7)
    val n1 = spark.read.parquet(d).count()
    IvfIndexStore.appendBatch(batch, d, batchId = 7) // crash-replay
    assert(spark.read.parquet(d).count() == n1)
  }

  test("sink: dim-drifted vectors abort instead of corrupting a list") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_ivfdrift").toString
    IvfIndexStore.build(emb.filter($"vec_id" < 300), d, nlist = 16)
    val drifted = Seq((9001L, Seq(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      IvfIndexStore.appendBatch(drifted, d, batchId = 0)
    }
    assert(e.getMessage.contains("mismatched"))
    // nothing was appended
    assert(!spark.read.parquet(d).filter($"vec_id" === 9001L).collect().nonEmpty)
  }

  test("filtered serving: predicate pushes to the probed scan; full probe = filtered brute force") {
    import graft.functions.GraftFunctions
    import spark.implicits._
    // the metadata predicate lands in PushedFilters BESIDE the partition
    // probe literals — no post-serve join, no unfiltered scan
    val probes = IvfIndexStore.probeLists(spark, store, qvec, nprobe = 4)
    val df = IvfIndexStore.topK(spark, store, qvec, k = 10, nprobe = 4,
      where = Some(col("label") === 3))
    val plan = df.queryExecution.executedPlan.toString
    val pushed = "PushedFilters: \\[[^\\]]*".r.findAllIn(plan).toSeq
    assert(pushed.exists(_.contains("EqualTo(label,3)")),
      s"label filter not pushed:\n${pushed.mkString("\n")}")
    val pfStart = plan.indexOf("PartitionFilters: [centroid_id")
    assert(pfStart >= 0, plan)
    val pf = plan.substring(pfStart, plan.indexOf("]", pfStart) max (pfStart + 1))
    probes.foreach(p => assert(pf.contains(p.toString), s"probe $p not in $pf"))
    // the over-probe endpoint: nprobe = nlist recovers exact brute force
    // over the FILTERED corpus
    val full = IvfIndexStore.topK(spark, store, qvec, k = 10, nprobe = 16,
      where = Some(col("label") === 3))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val brute = emb.filter($"label" === 3)
      .select($"vec_id", graft.operators.Similarity.quantize(
        GraftFunctions.vecDot(spark, $"embedding",
          org.apache.spark.sql.functions.typedLit(qvec))).as("sim_q"))
      .orderBy($"sim_q".desc, $"vec_id").limit(10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(full == brute)
    // and every served row actually satisfies the predicate
    val servedIds = full.map(_._1).toSet
    val okIds = emb.filter($"label" === 3)
      .select($"vec_id").as[Long].collect().toSet
    assert(servedIds.subsetOf(okIds))
  }

  test("append with a drifted column set aborts instead of mixing layouts") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_ivfcoldrift").toString
    IvfIndexStore.build(emb.filter($"vec_id" < 300), d, nlist = 16)
    // batch missing the label column the build carried
    val stripped = emb.filter($"vec_id" >= 300 && $"vec_id" < 320)
      .select($"vec_id", $"embedding")
    val e = intercept[IllegalArgumentException] {
      IvfIndexStore.appendBatch(stripped, d, batchId = 0)
    }
    assert(e.getMessage.contains("drift"))
    assert(spark.read.parquet(d).filter(col("ingest_batch") >= 0L).count() == 0)
  }

  test("layoutFor keys on (sfDir, nlist) and skips the rewrite on reuse") {
    val base = IvfIndexStore.layoutFor(spark, dir, emb, nlist = 16)
    val mtime0 = new java.io.File(base, "_SUCCESS").lastModified
    assert(IvfIndexStore.layoutFor(spark, dir, emb, nlist = 16) == base)
    assert(new java.io.File(base, "_SUCCESS").lastModified == mtime0)
    assert(IvfIndexStore.layoutFor(spark, dir, emb, nlist = 8) != base)
  }
}
