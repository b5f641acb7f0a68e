package graft.tools

import java.nio.file.Paths
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: jobs/actions per IngestCuration.processBatch with EVERY
  * text gate on (quality + tokens + PII + fluency + classifier + quota +
  * mix + lexical) — the before/after measurement for the pass-fusion work,
  * runnable against any revision (SCALE.md cites its numbers at commits
  * 21f55a0 vs HEAD). Test-scope only; the per-round tracking column lives
  * in ScaleBench's full-gate regime (`jobs/batch`). */
object GateJobsProbe {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.01")
    val root = "/tmp/graft-gatejobs"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val jobs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })

    val regDir = s"$root/registry"
    val quotaDir = s"$root/quota"
    val mixDir = s"$root/mix"
    Seq(regDir, quotaDir, mixDir, mixDir + "_rollup")
      .foreach(d => graft.queue.Maintenance.deleteRec(Paths.get(d)))
    val docs = spark.read.parquet(s"$base/documents.parquet")
    graft.streaming.IncrementalDedup.seedRegistry(docs, regDir)
    graft.streaming.DomainQuota.seedRegistry(docs, quotaDir)
    graft.streaming.CorpusStats.seedRegistry(docs, mixDir)
    graft.streaming.CorpusStats.rebuildRollup(spark, mixDir)
    val clfWeights = graft.operators.QualityClassifier.fit(
      docs.filter(col("source") === "src0"))
    val lmModel = graft.operators.TextAnalysis.bigramLm(
      docs.filter(col("source") === "src0"))
    val fgBench = graft.operators.Dedup.shingles(
        spark.createDataFrame(Seq(
          (1L, "the held out benchmark suite must never leak into training"),
          (2L, "every answer key sentence of the evaluation set lives here")))
          .toDF("doc_id", "text"))
      .select(col("shingle")).distinct().localCheckpoint(true)

    val batches = 12
    var jStart = 0L
    var tSum = 0.0
    val perBatch = (0 until batches).map { b =>
      val batch = spark.range(25).map { i =>
        val id = 97000000L + b * 25L + i
        (id, (1 to 8).map(w => s"tok${id}w$w").mkString(" "), s"dom${id % 7}")
      }.toDF("doc_id", "text", "source")
      batch.count() // materialize inputs outside the measured window
      jStart = jobs.get()
      val t0 = System.nanoTime()
      graft.streaming.IngestCuration.processBatch(batch, regDir,
          quotaRegistryDir = Some(quotaDir), quotaCap = 1000000,
          scrubPii = true,
          bigramModel = Some(lmModel), minFluencyPpm = 0L,
          qualityModel = Some(clfWeights), minQualityScore = -1e9,
          mixRegistryDir = Some(mixDir),
          mixTargetPpm = Map("en" -> 600000L, "fr" -> 200000L, "es" -> 200000L),
          benchShingles = Some(fgBench))
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      if (b >= 2) tSum += dt
      (jobs.get() - jStart, dt)
    }
    val steady = perBatch.drop(2) // skip warmup
    println(s"jobs/batch: ${steady.map(_._1).sum.toDouble / steady.size}")
    println(s"sec/batch:  ${tSum / steady.size}")
    println(s"per-batch: ${perBatch.mkString(", ")}")
    spark.stop()
  }
}
