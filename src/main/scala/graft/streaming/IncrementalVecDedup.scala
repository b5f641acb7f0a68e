package graft.streaming

import graft.functions.GraftFunctions
import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Embedding near-dup gating at ingest — the L2 twin of
  * [[IncrementalDedup]]: new vectors are checked against the EXISTING
  * corpus's hyperplane-LSH buckets instead of re-running the all-pairs
  * battery per batch.
  *
  * The semantic difference from the minhash twin: a shared (band, bucket)
  * is only a CANDIDATE here, not a verdict — candidates are exact-rescored
  * (codegen'd dot product, floor-quantized like every similarity in this
  * engine) against `minSimMillionths`, so a chance bucket collision between
  * unrelated vectors never flags anything.
  *
  * The corpus state is a durable registry `(band, bucket, rep_vec_id,
  * rep_emb)` hive-partitioned by `(band, bucket)`. The representative's
  * embedding is stored IN the bucket row — `planes/bandWidth` copies per
  * vector — deliberately: rescoring needs the rep's vector, and co-locating
  * it with the signature keeps the per-batch probe's I/O O(touched buckets).
  * The alternative (signature-only registry + one central embedding table)
  * stores each vector once but pays an O(registry) embedding-table scan or
  * a corpus-side shuffle per batch — exactly the cost this operator exists
  * to avoid. Bands× space for O(batch) probe time.
  *
  * Prune granularity is the bucket space itself: `planes/bandWidth` bands
  * × `2^bandWidth` buckets (64 partitions at the 16/4 default — each
  * holding corpus/64). The knob that refines it is the banding: more
  * bands, or wider bands, multiply the partitions (16 planes at width 8 →
  * 2×256) with the usual recall/selectivity tradeoff measured on
  * [[Similarity.lshNearDupPairs]]; the text twin's md5 bucket space is
  * 256 per band for the same reason.
  *
  * Per micro-batch, mirroring [[IncrementalDedup.processBatch]]:
  * signatures computed columnar (md5-derived planes, engine-portable);
  * registry scan pruned to the batch's touched partitions; batch broadcast
  * (corpus state never shuffles); intra-batch collisions self-joined and
  * rescored; verdicts report the smallest qualifying partner; fresh
  * vectors' bucket rows append. Self-matches are excluded from the probe,
  * so an at-least-once replay keeps a fresh vector's verdict fresh
  * (is_dup=false) instead of flipping it to dup-of-itself — the replay
  * re-appends identical registry rows, absorbed by the min aggregate, and
  * verdicts are fully idempotent.
  */
object IncrementalVecDedup {

  private val registrySchema: StructType = StructType.fromDDL(
    "band INT, bucket INT, rep_vec_id BIGINT, rep_emb ARRAY<FLOAT>")

  /** One micro-batch step → verdicts `(vec_id, is_dup, dup_of)`;
    * `dup_of` is the smallest partner (registry representative or earlier
    * same-batch vector) whose EXACT quantized similarity reaches
    * `minSimMillionths`, null for fresh vectors. */
  def processBatch(batch: DataFrame, registryDir: String,
                   minSimMillionths: Long,
                   planes: Int = 16, bandWidth: Int = 4, dims: Int = 64,
                   idCol: String = "vec_id", vecCol: String = "embedding",
                   pruneMaxBuckets: Int = 1024): DataFrame = {
    val spark = batch.sparkSession
    // signatures + the vector itself, materialized once (five consumers)
    val sigs = Similarity
      .lshBandSignatures(batch, planes, bandWidth, dims, idCol, vecCol)
      .join(batch.select(col(idCol), col(vecCol)), idCol)
      .localCheckpoint(true)
    val touched = sigs.select(col("band"), col("bucket")).distinct()
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    val registryAll = readRegistry(spark, registryDir)
    val registry =
      if (touched.isEmpty) registryAll.limit(0)
      else if (touched.length > pruneMaxBuckets) registryAll
      else registryAll.filter(touched.map { case (b, k) =>
        col("band") === b && col("bucket") === k }.reduce(_ || _))
    def sim(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      Similarity.quantize(GraftFunctions.vecDot(spark, a, b))
    // rep_vec_id =!= idCol: see IncrementalDedup — keeps replayed verdicts
    // idempotent instead of flipping fresh→dup-of-itself (sim 1.0 with its
    // own first-play registry row)
    val regHits = registry.join(broadcast(sigs), Seq("band", "bucket"))
      .filter(col("rep_vec_id") =!= col(idCol))
      .filter(sim(col(vecCol), col("rep_emb")) >= minSimMillionths)
      .groupBy(col(idCol)).agg(min(col("rep_vec_id")).as("dup_of_reg"))
    val intraHits = sigs.as("a")
      .join(broadcast(sigs.as("b")),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col(s"a.$idCol") > col(s"b.$idCol"))
      .filter(sim(col(s"a.$vecCol"), col(s"b.$vecCol")) >= minSimMillionths)
      .groupBy(col(s"a.$idCol").as(idCol))
      .agg(min(col(s"b.$idCol")).as("dup_of_intra"))
    val hits = regHits.join(intraHits, Seq(idCol), "full_outer")
      .select(col(idCol),
        least(col("dup_of_reg"), col("dup_of_intra")).as("dup_of"))
    val verdicts = batch.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol), col("dup_of").isNotNull.as("is_dup"), col("dup_of"))
    sigs.join(hits, Seq(idCol), "left_anti")
      .select(col("band"), col("bucket"), col(idCol).as("rep_vec_id"),
        col(vecCol).as("rep_emb"))
      .write.mode(SaveMode.Append).partitionBy("band", "bucket").parquet(registryDir)
    verdicts
  }

  /** Bulk-seed the registry from an EXISTING embedding corpus — the
    * bootstrap step before enabling the streaming gate: one signature
    * pass written straight into the probe's (band, bucket) layout, every
    * existing vector registering as its own representative. */
  def seedRegistry(vecs: DataFrame, registryDir: String,
                   planes: Int = 16, bandWidth: Int = 4, dims: Int = 64,
                   idCol: String = "vec_id", vecCol: String = "embedding"): Unit =
    Similarity.lshBandSignatures(vecs, planes, bandWidth, dims, idCol, vecCol)
      .join(vecs.select(col(idCol), col(vecCol)), idCol)
      .select(col("band"), col("bucket"), col(idCol).as("rep_vec_id"),
        col(vecCol).as("rep_emb"))
      .write.mode(SaveMode.Append).partitionBy("band", "bucket").parquet(registryDir)

  /** The raw append-only registry, schema supplied explicitly (no footer
    * inference; only filtered-to partitions are ever opened). */
  def readRegistry(spark: SparkSession, registryDir: String): DataFrame =
    // RegistryIO probes for band=* partition dirs specifically — the old
    // any-file probe would treat a stray root file as a readable registry
    RegistryIO.readOrEmpty(spark, registryDir, registrySchema, Some("band="))

  /** Streaming face: wire an embedding stream through [[processBatch]],
    * appending verdicts to `verdictDir`. Caller starts the query.
    * `compactEvery` schedules in-gate registry compaction every N batches —
    * see [[IncrementalDedup.gate]] for the file-growth rationale. */
  def gate(vecStream: DataFrame, registryDir: String, verdictDir: String,
           minSimMillionths: Long, planes: Int = 16, bandWidth: Int = 4,
           dims: Int = 64,
           compactEvery: Int = 0): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    vecStream.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        processBatch(batch, registryDir, minSimMillionths, planes, bandWidth, dims)
          .write.mode(SaveMode.Append).parquet(verdictDir)
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0) {
          graft.queue.Maintenance.compactParquet(batch.sparkSession,
            registryDir, partitionCols = Seq("band", "bucket"))
          ()
        }
    }
}
