package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Duplicated-span removal at ingest — the streaming twin of the batch
  * span-removal query (q92), as [[IncrementalDedup]] is of whole-document
  * dedup: each arriving document is split into disjoint `blockTokens`-token
  * blocks, blocks whose fingerprint has been seen in ANY OTHER document —
  * in the corpus so far (registry) or in the same micro-batch — are
  * removed as shared scaffolding, and the document is rebuilt from its
  * surviving blocks in order. The batch operator sees the whole corpus at
  * once, so "recurring" means ≥ 2 documents anywhere; at ingest the corpus
  * is only the past, so the FIRST document carrying a block keeps it and
  * later carriers lose it — the inherent asymmetry of any no-retraction
  * streaming gate (the same FCFS-vs-global choice [[DomainQuota]]
  * documents for quota).
  *
  * Corpus state is a durable block-fingerprint registry `(bucket,
  * block_md5, doc_id)` — one row per distinct (block, document) OCCURRENCE,
  * not per fingerprint, hive-partitioned by `bucket` (the fingerprint's
  * first hex byte, 256 buckets, the same discipline as
  * [[IncrementalDedup]]'s (band, bucket) layout). Storing the occurrence,
  * not just the fingerprint, is what makes replays exact: an
  * at-least-once REDELIVERY of a document finds its own blocks registered
  * under its own doc_id (excluded from "another document has this block")
  * but still sees every OTHER historical carrier — so a partial replay of
  * one document from an old batch reproduces its original verdict even
  * though its batch-mates are absent. Every block of every batch document
  * registers, including removed ones ("seen" must cover scaffolding
  * carriers, or re-ingested boilerplate would be re-evaluated forever).
  *
  * Scale shape: blocking is per-row algebra; the registry scan is PRUNED
  * to the batch's touched buckets (O(batch) I/O, `pruneMaxBuckets` full-
  * scan fallback exactly like [[IncrementalDedup.processBatch]]); the
  * batch side of every join is micro by construction and broadcasts; the
  * registry streams map-side through the probe join and is never shuffled,
  * grouped, or rewritten per batch. Reassembly groups batch rows only.
  */
object IncrementalSpanDedup {

  private val registrySchema: StructType = StructType.fromDDL(
    "bucket INT, block_md5 STRING, doc_id BIGINT")

  /** Partition bucket of a block fingerprint: its first hex byte, 0..255 —
    * a pure function of the probe key, so pruning never drops a match. */
  private def bucketOf(blockMd5: Column): Column =
    conv(substring(blockMd5, 1, 2), 16, 10).cast("int")

  /** One micro-batch step → per-document verdicts `(doc_id, n_blocks_kept,
    * n_blocks_removed, n_tokens_clean, clean_md5)` — the q92 reassembly
    * columns plus the removed-count audit. A document whose every block is
    * known scaffolding keeps 0 blocks and a null `clean_md5` (the batch
    * operator drops such documents; a streaming verdict must still report
    * them, so the consumer filters `n_blocks_kept > 0`). Emits one row per
    * DISTINCT batch doc_id. */
  def processBatch(batch: DataFrame, registryDir: String,
                   blockTokens: Int = 32, idCol: String = "doc_id",
                   textCol: String = "text",
                   // the bucket space is one hex byte (256): the default
                   // must sit BELOW it or the full-scan fallback (skip the
                   // isInCollection predicate once a big batch touches
                   // nearly every partition anyway) could never engage
                   pruneMaxBuckets: Int = 192): DataFrame = {
    val spark = batch.sparkSession
    // one materialization feeds the touched-set pull, the probe join, the
    // in-batch recurrence count, reassembly, and registration
    val blocks = TextAnalysis.chunk(
        batch.dropDuplicates(idCol), blockTokens, blockTokens, textCol, idCol)
      .withColumn("block_md5", md5(col("chunk_text")))
      .withColumn("bucket", bucketOf(col("block_md5")))
      .localCheckpoint(true)
    val touched = blocks.select(col("bucket")).distinct()
      .collect().map(_.getInt(0))
    val registryAll = readRegistry(spark, registryDir)
    val registry =
      if (touched.isEmpty) registryAll.limit(0)
      else if (touched.length > pruneMaxBuckets) registryAll
      else registryAll.filter(col("bucket").isInCollection(touched))
    // (doc, fingerprint) pairs with a DIFFERENT registered carrier: the
    // own-doc exclusion is what keeps replays exact (a redelivered doc's
    // first-play registration must not scaffold-flag itself)
    val seenElsewhere = registry
      .select(col("block_md5"), col("doc_id").as("reg_doc_id"))
      .join(broadcast(blocks.select(col("block_md5"), col(idCol)).distinct()),
        Seq("block_md5"))
      .filter(col("reg_doc_id") =!= col(idCol))
      .select(col(idCol), col("block_md5")).distinct()
    // fingerprints carried by ≥ 2 documents of THIS batch recur for all
    val batchRecurring = blocks.groupBy(col("block_md5"))
      .agg(countDistinct(col(idCol)).as("n_docs"))
      .filter(col("n_docs") >= 2)
      .select(col("block_md5"))
    val survivors = blocks
      .join(batchRecurring, Seq("block_md5"), "left_anti")
      .join(seenElsewhere, Seq(idCol, "block_md5"), "left_anti")
    val rebuilt = survivors.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_blocks_kept"),
        sum(col("n_chunk_tokens")).cast("long").as("n_tokens_clean"),
        md5(concat_ws(" ",
          transform(array_sort(collect_list(struct(col("chunk_id"), col("chunk_text")))),
            x => x.getField("chunk_text")))).as("clean_md5"))
    val totals = blocks.groupBy(col(idCol)).agg(count(lit(1)).as("n_blocks"))
    // verdicts capture the PRE-batch registry: materialize before the
    // registration append below mutates the scanned file listing
    val verdicts = totals
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_blocks_kept"), lit(0L)).as("n_blocks_kept"),
        (col("n_blocks") - coalesce(col("n_blocks_kept"), lit(0L))).as("n_blocks_removed"),
        coalesce(col("n_tokens_clean"), lit(0L)).as("n_tokens_clean"),
        col("clean_md5"))
      .localCheckpoint(true)
    // every distinct block occurrence registers, removed ones included; a
    // replay re-appends identical rows, absorbed by the distinct probe
    blocks.select(col("bucket"), col("block_md5"), col(idCol).as("doc_id"))
      .distinct()
      .write.mode(SaveMode.Append).partitionBy("bucket").parquet(registryDir)
    verdicts
  }

  /** Bulk-seed the registry from an EXISTING corpus — the bootstrap step
    * before enabling the gate: every document's blocks register as seen
    * occurrences (run the batch q92 first if the history itself must be
    * cleaned). */
  def seedRegistry(docs: DataFrame, registryDir: String,
                   blockTokens: Int = 32, idCol: String = "doc_id",
                   textCol: String = "text"): Unit =
    TextAnalysis.chunk(docs, blockTokens, blockTokens, textCol, idCol)
      .withColumn("block_md5", md5(col("chunk_text")))
      .select(bucketOf(col("block_md5")).as("bucket"), col("block_md5"),
        col(idCol).as("doc_id"))
      .distinct()
      .write.mode(SaveMode.Append).partitionBy("bucket").parquet(registryDir)

  /** The raw append-only occurrence registry ([[RegistryIO]] rules). */
  def readRegistry(spark: SparkSession, registryDir: String): DataFrame =
    RegistryIO.readOrEmpty(spark, registryDir, registrySchema, Some("bucket="))

  /** Erase documents from the registry — takedown/GDPR
    * ([[RegistryIO.eraseDocs]]). Semantics: the erased documents' block
    * occurrences stop existing, so a block THEY alone carried reads as
    * novel again (a future arrival keeps it instead of having it removed
    * as seen-elsewhere) and blocks other documents also carry are
    * unaffected. Emitted span verdicts naming the erased ids are the
    * consumer's stream to scrub; the registry holds fingerprints only. */
  def deleteDocs(spark: SparkSession, registryDir: String,
                 docIds: Seq[Long]): Long =
    RegistryIO.eraseDocs(readRegistry(spark, registryDir), registryDir,
      "bucket", docIds)

  /** Streaming face: wire a document stream through [[processBatch]],
    * appending verdicts to `verdictDir`; a consumer keeps
    * `filter($"n_blocks_kept" > 0)`. `compactEvery` schedules registry
    * compaction exactly as [[IncrementalDedup.gate]] does. */
  def gate(docStream: DataFrame, registryDir: String, verdictDir: String,
           blockTokens: Int = 32, idCol: String = "doc_id",
           textCol: String = "text",
           compactEvery: Int = 0): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docStream.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        processBatch(batch, registryDir, blockTokens, idCol, textCol)
          .write.mode(SaveMode.Append).parquet(verdictDir)
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0) {
          graft.queue.Maintenance.compactParquet(batch.sparkSession,
            registryDir, partitionCols = Seq("bucket"))
          ()
        }
    }
}
