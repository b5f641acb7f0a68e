package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mix-drift monitoring at ingest — the TIME axis of corpus accounting
  * ([[CorpusStats]] is the cumulative axis): per event-time window, each
  * language's share of arriving documents, and an alert when a share
  * jumps between consecutive windows. A crawl whose language mix lurches
  * (a source went down, a spider trap opened, an extractor broke) is the
  * kind of silent corpus poisoning a mix dashboard exists to catch DURING
  * ingest, not at training time.
  *
  * Two stages, deliberately split:
  *
  *   - [[windowCounts]]/[[feed]] — the STREAMING half: watermarked
  *     event-time tumbling windows, append-mode per-(window, lang) counts
  *     (a window emits exactly once, when the watermark passes its end —
  *     so the sink only ever holds CLOSED windows, each a final verdict).
  *     This is the only stateful streaming stage, and it is Spark's
  *     built-in windowed aggregation — late data inside the watermark
  *     amends the window before it closes; later than that is dropped,
  *     the standard trade the watermark delay knob prices.
  *   - [[report]] — the BATCH half over the accumulated closed windows:
  *     shares per window (q98's all-double ppm discipline), per-language
  *     drift vs the PREVIOUS window via lag(), and the alert flag.
  *     Consecutive-window comparison needs ordered state; doing it with a
  *     lag window over the closed-window relation (tiny: windows × langs
  *     rows) instead of a second chained stateful streaming operator
  *     keeps the stream single-stateful — the same
  *     accumulate-then-report split as CorpusStats.
  */
object MixDrift {

  /** Watermarked per-(window, lang) counts — append mode: one final row
    * per closed window. Null langs normalize to "" (the missing-metadata
    * rule every gate in this package shares). */
  def windowCounts(docStream: DataFrame, windowSize: String = "1 hour",
                   watermarkDelay: String = "10 minutes",
                   tsCol: String = "ts", langCol: String = "lang"): DataFrame =
    docStream
      .select(col(tsCol).as("__ts"), coalesce(col(langCol), lit("")).as("lang"))
      .withWatermark("__ts", watermarkDelay)
      .groupBy(window(col("__ts"), windowSize).as("w"), col("lang"))
      .agg(count(lit(1)).as("n_docs"))
      .select(col("w.start").as("win_start"), col("w.end").as("win_end"),
        col("lang"), col("n_docs"))

  /** Streaming face: closed windows append to `outDir` as the durable
    * mix history [[report]] reads. */
  def feed(docStream: DataFrame, outDir: String, checkpointDir: String,
           windowSize: String = "1 hour", watermarkDelay: String = "10 minutes",
           tsCol: String = "ts", langCol: String = "lang")
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    windowCounts(docStream, windowSize, watermarkDelay, tsCol, langCol)
      .writeStream.outputMode("append").format("parquet")
      .option("path", outDir).option("checkpointLocation", checkpointDir)

  /** Drift report over the accumulated closed windows: each (window, lang)
    * row carries the language's share of that window in ppm, the signed
    * drift vs the language's share in the PREVIOUS window (a language
    * absent from a window reads as share 0 there — disappearance is
    * exactly the drift worth alerting on), and `is_alert` when |drift|
    * crosses `alertPpm`. The first window per language has no baseline —
    * null drift, never an alert.
    *
    * Scale shape: the input is windows × langs rows (monitoring
    * granularity, not corpus granularity), so the per-window total and the
    * per-language lag are windows over a tiny relation; shares use the
    * battery's all-double floor-ppm algebra. */
  def report(spark: SparkSession, dir: String, alertPpm: Long = 200000L): DataFrame = {
    // empty-state rule ([[RegistryIO]]): a dashboard polling before the
    // watermark has closed the first window (dir missing, or holding only
    // _spark_metadata) gets an empty report, not an AnalysisException
    val closed = RegistryIO.readOrEmpty(spark, dir,
        org.apache.spark.sql.types.StructType.fromDDL(
          "win_start TIMESTAMP, win_end TIMESTAMP, lang STRING, n_docs BIGINT"),
        partitionPrefix = None)
      .groupBy(col("win_start"), col("win_end"), col("lang"))
      // a restarted feed can append a duplicate closed-window file; the
      // max collapses exact re-emissions of the same final verdict
      .agg(max(col("n_docs")).as("n_docs"))
    val total = Window.partitionBy(col("win_start"))
    val byLang = Window.partitionBy(col("lang")).orderBy(col("win_start"))
    // dense the matrix: every (window, lang) pair, absent cells as 0 — a
    // language that vanishes must surface as drift, not as a missing row
    val wins = closed.select(col("win_start"), col("win_end")).distinct()
    val langs = closed.select(col("lang")).distinct()
    wins.crossJoin(langs)
      .join(closed, Seq("win_start", "win_end", "lang"), "left")
      .withColumn("n_docs", coalesce(col("n_docs"), lit(0L)))
      .withColumn("win_total", sum(col("n_docs")).over(total))
      .withColumn("share_ppm",
        floor(col("n_docs").cast("double") / col("win_total").cast("double") * 1e6)
          .cast("long"))
      // the baseline must be the ADJACENT window: lag() alone would pair
      // the post-outage window with the pre-outage one across an ingest
      // gap and label a six-hours-apart comparison as window-over-window
      // drift — a gap means NO baseline (null drift, no alert; total
      // ingest silence itself is a liveness signal, not a mix one)
      .withColumn("prev_share_ppm",
        when(lag(col("win_end"), 1).over(byLang) === col("win_start"),
          lag(col("share_ppm"), 1).over(byLang)))
      .withColumn("drift_ppm", col("share_ppm") - col("prev_share_ppm"))
      .withColumn("is_alert",
        coalesce(abs(col("drift_ppm")) >= alertPpm, lit(false)))
      .select(col("win_start"), col("win_end"), col("lang"), col("n_docs"),
        col("share_ppm"), col("drift_ppm"), col("is_alert"))
      .orderBy(col("win_start"), col("lang"))
  }
}
