package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Dedup at ingest: new documents are checked against the EXISTING corpus's
  * LSH buckets instead of re-clustering the corpus per batch — the
  * incremental form every growing training corpus needs (the batch battery's
  * q30-q34/q65 are its full-corpus twins).
  *
  * The corpus state is a durable bucket registry `(band, minhash,
  * rep_doc_id)` — plain parquet here, a Delta/Iceberg table in production,
  * hive-partitionable by `band`. Per micro-batch (foreachBatch, like every
  * other side-effecting sink in this engine):
  *
  *   1. the batch's MinHash band signatures are computed columnar
  *      (md5-derived, identical to [[Dedup.minhashSignatures]]);
  *   2. one equi-join against the registry flags documents whose ANY band
  *      bucket is already occupied — suspected near-dups, reported with the
  *      smallest colliding representative;
  *   3. signatures of the batch's NEW representatives append to the
  *      registry (append-only; at-least-once replay re-appends identical
  *      rows, and reads dedupe by distinct — idempotent effect).
  *
  * Cost per batch is O(batch × bands) join rows against a registry lookup —
  * never O(corpus), and the registry join key (band, minhash) is exactly
  * its partition layout.
  */
object IncrementalDedup {

  /** One micro-batch step. Returns the per-document verdicts
    * `(doc_id, is_dup, dup_of)` — `dup_of` is the smallest representative
    * across all colliding buckets, null for fresh documents.
    *
    * Shuffle discipline: the BATCH's signatures broadcast (a micro-batch is
    * small by construction); the registry only ever streams map-side
    * through the broadcast hash join — the corpus state is never shuffled,
    * grouped, or rewritten per batch. The replay duplicates an append-only
    * registry accumulates are absorbed by the doc-level min aggregate,
    * which is O(hits), not O(registry). */
  def processBatch(batch: DataFrame, registryDir: String,
                   bands: Int = 4, idCol: String = "doc_id"): DataFrame = {
    val spark = batch.sparkSession
    val sigs = Dedup.minhashSignatures(Dedup.shingles(batch, idCol = idCol), bands, idCol)
    val registry = readRegistry(spark, registryDir)
    val hits = registry.join(broadcast(sigs), Seq("band", "minhash"))
      .groupBy(col(idCol)).agg(min(col("rep_doc_id")).as("dup_of"))
    // verdicts capture the PRE-batch registry: their scan's file listing is
    // fixed here, before the append below, so a later materialization (the
    // caller's sink write) still judges against the state this batch saw.
    val verdicts = batch.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol), col("dup_of").isNotNull.as("is_dup"), col("dup_of"))
    // fresh documents' buckets become part of the corpus state
    sigs.join(hits, Seq(idCol), "left_anti")
      .select(col("band"), col("minhash"), col(idCol).as("rep_doc_id"))
      .write.mode(SaveMode.Append).parquet(registryDir)
    verdicts
  }

  /** The raw append-only registry. A production deployment lays it out
    * bucketed by (band, minhash prefix) so the per-batch probe prunes to
    * the buckets the batch actually touches. */
  def readRegistry(spark: SparkSession, registryDir: String): DataFrame = {
    val p = java.nio.file.Paths.get(registryDir)
    if (!java.nio.file.Files.exists(p) ||
        !java.nio.file.Files.list(p).findFirst().isPresent)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "band INT, minhash STRING, rep_doc_id BIGINT"))
    else spark.read.parquet(registryDir)
  }

  /** Streaming face: wire a document stream through [[processBatch]],
    * appending verdicts to `verdictDir`. Caller starts the query. */
  def gate(docStream: DataFrame, registryDir: String, verdictDir: String,
           bands: Int = 4, idCol: String = "doc_id"): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docStream.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, _: Long) =>
        processBatch(batch, registryDir, bands, idCol)
          .write.mode(SaveMode.Append).parquet(verdictDir)
    }
}
