package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Curation AT INGEST — the streaming twin of the batch curation pipeline
  * (q78/q85): each micro-batch gets near-dup, quality, and language
  * verdicts in one pass, so a growing corpus admits only documents that
  * would have survived the batch gates. Composes the pieces that are each
  * spec'd alone:
  *
  *   - near-dup vs the EXISTING corpus + same batch via
  *     [[IncrementalDedup.processBatch]] (durable pruned bucket registry);
  *   - quality from [[TextAnalysis.qualityMetrics]] (token count, distinct
  *     ratio — pure column algebra, no shuffle);
  *   - language from [[TextAnalysis.langId]] against an allow-set.
  *
  * Registration semantics: every FRESH document registers its buckets,
  * including ones the quality/language gates reject — dedup means "seen
  * before", so re-ingesting previously-seen-and-rejected content is still
  * flagged as a duplicate rather than re-evaluated forever. The per-doc
  * verdict row records every gate separately (`is_dup`, `quality_ok`,
  * `lang_ok`, and the composite `keep`) so a pipeline can audit WHY a
  * document was dropped — mirroring the batch pipeline's separately
  * checkable stages.
  *
  * Scale shape: one registry probe (O(batch) pruned I/O), two shuffle-free
  * column passes, and a three-way join on the batch's own doc ids — the
  * batch is micro by construction, so the joins broadcast under AQE.
  */
object IngestCuration {

  /** One micro-batch step → verdicts
    * `(doc_id, is_dup, dup_of, predicted_lang, lang_ok, n_tokens,
    *   distinct_ratio, quality_ok, keep)`. */
  def processBatch(batch: DataFrame, registryDir: String,
                   allowedLangs: Set[String] = Set("en", "fr", "es"),
                   minTokens: Int = 5, minDistinctRatio: Double = 0.3,
                   bands: Int = 4, idCol: String = "doc_id"): DataFrame = {
    val dedup = IncrementalDedup.processBatch(batch, registryDir, bands, idCol)
    val quality = TextAnalysis.qualityMetrics(batch)
      .select(col(idCol), col("n_tokens"), col("distinct_ratio"))
      .withColumn("quality_ok",
        col("n_tokens") >= minTokens && col("distinct_ratio") >= minDistinctRatio)
    val lang = TextAnalysis.langId(batch)
      .select(col(idCol), col("predicted_lang"))
      .withColumn("lang_ok", col("predicted_lang").isInCollection(allowedLangs))
    dedup.join(quality, idCol).join(lang, idCol)
      .select(col(idCol), col("is_dup"), col("dup_of"),
        col("predicted_lang"), col("lang_ok"),
        col("n_tokens"), col("distinct_ratio"), col("quality_ok"),
        (!col("is_dup") && col("quality_ok") && col("lang_ok")).as("keep"))
  }

  /** Streaming face: wire a document stream through [[processBatch]],
    * appending full verdicts to `verdictDir`; a consumer keeps
    * `filter($"keep")`. `compactEvery` schedules the dedup registry's
    * compaction cadence exactly as [[IncrementalDedup.gate]] does. */
  def gate(docStream: DataFrame, registryDir: String, verdictDir: String,
           allowedLangs: Set[String] = Set("en", "fr", "es"),
           minTokens: Int = 5, minDistinctRatio: Double = 0.3,
           bands: Int = 4, idCol: String = "doc_id",
           compactEvery: Int = 0): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docStream.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        processBatch(batch, registryDir, allowedLangs, minTokens,
          minDistinctRatio, bands, idCol)
          .write.mode(SaveMode.Append).parquet(verdictDir)
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0) {
          graft.queue.Maintenance.compactParquet(batch.sparkSession,
            registryDir, partitionCols = Seq("band", "bucket"))
          ()
        }
    }
}
