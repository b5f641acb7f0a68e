package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Per-domain quota at ingest — the streaming twin of the batch domain cap
  * (q91): a growing corpus admits at most `cap` documents per source, with
  * admissions durable across batches and restarts. The batch operator
  * chooses the KEPT SET by content-hash rank over a complete corpus; at
  * ingest the corpus is never complete, so admission is first-come-first-
  * served across batches (deterministic content-hash order WITHIN a batch)
  * — the standard quota semantics of a streaming collector. Quota never
  * frees: the admitted set is append-only, like every registry in this
  * engine.
  *
  * Corpus state is a durable admitted-set registry `(sbucket, source,
  * doc_id)` — plain parquet, hive-partitioned by `sbucket` (a 256-way hash
  * bucket of the source, so millions of distinct domains cannot create
  * millions of partition directories, while probes still prune to the
  * batch's touched buckets). Per micro-batch:
  *
  *   1. the registry scan is PRUNED to the batch's touched sbuckets —
  *      per-batch I/O is O(touched domains), not O(registry);
  *   2. already-admitted batch docs (an at-least-once REPLAY) keep their
  *      admitted verdict without consuming quota again;
  *   3. genuinely-new docs rank per source by (md5(doc_id), doc_id) within
  *      the batch — the same deterministic key as q91 — and are admitted
  *      while `prior_admitted + rank <= cap`;
  *   4. newly admitted rows append to the registry (a replay re-appends
  *      identical rows; the distinct-count probe absorbs them).
  *
  * Rejected documents do NOT register — rejection must not consume quota —
  * so a re-ingested rejected document re-evaluates against the then-current
  * count and is re-rejected deterministically (the count only grows).
  *
  * Scale shape: the batch is micro by construction, so it broadcasts into
  * every join; the registry only ever streams map-side through the pruned
  * scan into one distinct-count aggregation whose output is one row per
  * TOUCHED domain. The ranking window partitions by source over batch rows
  * only. Nothing corpus-sized shuffles, and no giant domain is ever sorted
  * whole — the exact property q91's two-phase plan pins for batch.
  */
object DomainQuota {

  private val registrySchema: StructType = StructType.fromDDL(
    "sbucket INT, source STRING, doc_id BIGINT")

  private val tokenRegistrySchema: StructType = StructType.fromDDL(
    "sbucket INT, source STRING, doc_id BIGINT, n_tokens BIGINT")

  /** Partition bucket of a source: crc32 mod 256 — cheap, engine-stable,
    * and a pure function of the probe key, so pruning on it never drops a
    * matching row (the same contract as IncrementalDedup.bucketOf). */
  private def bucketOf(source: org.apache.spark.sql.Column) =
    (crc32(source) % 256).cast("int")

  /** One micro-batch step → verdicts `(doc_id, source, admitted,
    * prior_admitted)`; `prior_admitted` is the domain's admitted count
    * BEFORE this batch (an audit column, like IngestCuration's per-gate
    * flags). One verdict row per DISTINCT (source, doc) — intra-batch
    * redeliveries collapse before ranking. A null source reads as the ""
    * domain. */
  def processBatch(batch: DataFrame, registryDir: String, cap: Int,
                   idCol: String = "doc_id", sourceCol: String = "source"): DataFrame = {
    require(cap > 0, s"quota cap must be positive, got $cap — a zero cap " +
      "silently rejects every document in the stream")
    val spark = batch.sparkSession
    // null sources collapse to one "" domain (scraped metadata is often
    // missing the field; crashing the stream on it would wedge the batch),
    // and intra-batch redeliveries of the same (source, doc) collapse to
    // one row — otherwise each copy would take its own rank slot and
    // wrongly evict a later fresh document from the same batch
    val docs = batch
      .select(col(idCol), coalesce(col(sourceCol), lit("")).as("source"))
      .dropDuplicates("source", idCol)
      .withColumn("sbucket", bucketOf(col("source")))
      .localCheckpoint(true) // feeds probe, replay join, ranking, registration
    val touched = docs.select(col("sbucket")).distinct()
      .collect().map(_.getInt(0))
    val registryAll = readRegistry(spark, registryDir)
    val registry =
      if (touched.isEmpty) registryAll.limit(0)
      else registryAll.filter(col("sbucket").isInCollection(touched))
    // one row per touched domain; countDistinct absorbs replayed appends
    val priorCounts = registry.groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("prior_admitted"))
    // replay detection on the registry's FULL key (source, doc_id): a
    // doc_id admitted under one source must not mark a same-id row from a
    // DIFFERENT source as replayed — that row would then be admitted
    // without consuming its own domain's quota and never register
    val alreadyIn = registry.join(broadcast(docs),
        registry("source") === docs("source") &&
          registry("doc_id") === docs(idCol))
      .select(docs(idCol), docs("source")).distinct()
      .withColumn("replayed", lit(true))
    val w = Window.partitionBy(col("source"))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    val verdicts = docs
      .join(broadcast(alreadyIn), Seq(idCol, "source"), "left")
      .join(broadcast(priorCounts), Seq("source"), "left")
      .withColumn("prior_admitted", coalesce(col("prior_admitted"), lit(0L)))
      .withColumn("replayed", coalesce(col("replayed"), lit(false)))
      // replayed docs are already counted in prior_admitted and take no
      // rank slot; fresh docs rank among fresh docs only
      .withColumn("rank_new",
        when(col("replayed"), lit(0L))
          .otherwise(sum(when(col("replayed"), 0L).otherwise(1L))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
      .withColumn("admitted",
        col("replayed") || (col("prior_admitted") + col("rank_new") <= cap))
      .select(col(idCol), col("source"), col("sbucket"),
        col("admitted"), col("prior_admitted"), col("replayed"))
      // fix the verdict BEFORE the registration append below mutates the
      // registry this plan's scan lists (same discipline as IncrementalDedup)
      .localCheckpoint(true)
    verdicts.filter(col("admitted") && !col("replayed"))
      .select(col("sbucket"), col("source"), col(idCol).as("doc_id"))
      .write.mode(SaveMode.Append).partitionBy("sbucket").parquet(registryDir)
    verdicts.select(col(idCol), col("source"), col("admitted"), col("prior_admitted"))
  }

  /** Token-budgeted quota step — the at-ingest twin of the batch
    * token-weighted cap (q93), as [[processBatch]] is of the doc-count cap
    * (q91): each source admits documents while its cumulative TOKEN cost
    * stays ≤ `budget`. Within a batch the admitted set is the maximal
    * prefix, in (md5(doc_id), doc_id) order, whose fresh-token running sum
    * plus the domain's prior admitted tokens fits the budget — the running
    * sum is monotone, so this is the same stop-at-first-overflow prefix
    * q93 computes, just seeded with the registry's prior mass. Across
    * batches only ADMITTED tokens charge the budget: a rejected document
    * never registers, so its re-arrival in a later (lighter) batch
    * re-evaluates against the then-current mass and may then fit.
    *
    * Registry rows carry the admitted document's token cost
    * `(sbucket, source, doc_id, n_tokens)`; an at-least-once replay
    * re-appends identical rows, and the prior-mass aggregation collapses
    * to one row per (source, doc) BEFORE summing, so a replay never
    * double-charges tokens (the token-space form of the doc-count mode's
    * countDistinct). Same 256-way sbucket layout, pruned probe, and
    * verdict columns (`prior_tokens` replacing `prior_admitted`).
    *
    * `tokenCol` must be denominated in the engine-wide token unit — the
    * [[graft.operators.TextAnalysis.tokens]] contract (whitespace tokens;
    * [[graft.operators.TextAnalysis.chunkTokenCost]] is the canonical
    * producer) — budgets in mixed units are exactly what that contract
    * forbids. */
  def processBatchTokens(batch: DataFrame, registryDir: String, budget: Long,
                         tokenCol: String = "n_chars", idCol: String = "doc_id",
                         sourceCol: String = "source"): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget — a " +
      "non-positive budget silently rejects every document in the stream")
    val spark = batch.sparkSession
    val docs = batch
      .select(col(idCol), coalesce(col(sourceCol), lit("")).as("source"),
        col(tokenCol).cast("long").as("n_tokens"))
      .dropDuplicates("source", idCol)
      .withColumn("sbucket", bucketOf(col("source")))
      .localCheckpoint(true)
    val touched = docs.select(col("sbucket")).distinct()
      .collect().map(_.getInt(0))
    val registryAll = readTokenRegistry(spark, registryDir)
    val registry =
      if (touched.isEmpty) registryAll.limit(0)
      else registryAll.filter(col("sbucket").isInCollection(touched))
    // one row per (source, doc) FIRST (replayed appends collapse), then sum
    val priorTokens = registry.groupBy(col("source"), col("doc_id"))
      .agg(max(col("n_tokens")).as("n_tokens"))
      .groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("prior_tokens"))
    val alreadyIn = registry.join(broadcast(docs),
        registry("source") === docs("source") &&
          registry("doc_id") === docs(idCol))
      .select(docs(idCol), docs("source")).distinct()
      .withColumn("replayed", lit(true))
    val w = Window.partitionBy(col("source"))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    val verdicts = docs
      .join(broadcast(alreadyIn), Seq(idCol, "source"), "left")
      .join(broadcast(priorTokens), Seq("source"), "left")
      .withColumn("prior_tokens", coalesce(col("prior_tokens"), lit(0L)))
      .withColumn("replayed", coalesce(col("replayed"), lit(false)))
      // a replayed doc's tokens already sit inside prior_tokens and add
      // nothing to the batch's running sum; fresh docs accumulate among
      // fresh docs only
      .withColumn("cum_new",
        when(col("replayed"), lit(0L))
          .otherwise(sum(when(col("replayed"), 0L).otherwise(col("n_tokens")))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
      .withColumn("admitted",
        col("replayed") || (col("prior_tokens") + col("cum_new") <= budget))
      .select(col(idCol), col("source"), col("sbucket"), col("n_tokens"),
        col("admitted"), col("prior_tokens"), col("replayed"))
      .localCheckpoint(true)
    verdicts.filter(col("admitted") && !col("replayed"))
      .select(col("sbucket"), col("source"), col(idCol).as("doc_id"), col("n_tokens"))
      .write.mode(SaveMode.Append).partitionBy("sbucket").parquet(registryDir)
    verdicts.select(col(idCol), col("source"), col("admitted"), col("prior_tokens"))
  }

  /** Bulk-seed the admitted set from an EXISTING corpus (the bootstrap step
    * before enabling the gate): every existing document registers as
    * admitted — run the batch cap (q91) first if the history itself must be
    * capped. */
  def seedRegistry(docs: DataFrame, registryDir: String,
                   idCol: String = "doc_id", sourceCol: String = "source"): Unit =
    // same null-source normalization as processBatch: a null would land in
    // the hive default partition where the "" domain's pruned probe never looks
    docs.select(bucketOf(coalesce(col(sourceCol), lit(""))).as("sbucket"),
        coalesce(col(sourceCol), lit("")).as("source"), col(idCol).as("doc_id"))
      .write.mode(SaveMode.Append).partitionBy("sbucket").parquet(registryDir)

  /** The raw append-only admitted set, schema supplied explicitly
    * (`sbucket` comes from the directory names; no footer inference). */
  def readRegistry(spark: SparkSession, registryDir: String): DataFrame =
    readWithSchema(spark, registryDir, registrySchema)

  /** The token-mode admitted set ([[processBatchTokens]]'s state) — same
    * layout plus each admission's token cost. */
  def readTokenRegistry(spark: SparkSession, registryDir: String): DataFrame =
    readWithSchema(spark, registryDir, tokenRegistrySchema)

  private def readWithSchema(spark: SparkSession, registryDir: String,
                             schema: StructType): DataFrame =
    RegistryIO.readOrEmpty(spark, registryDir, schema, Some("sbucket="))

  /** Streaming face: wire a document stream through [[processBatch]],
    * appending verdicts to `verdictDir`; a consumer keeps
    * `filter($"admitted")`. `compactEvery` schedules registry compaction
    * exactly as [[IncrementalDedup.gate]] does. */
  def gate(docStream: DataFrame, registryDir: String, verdictDir: String,
           cap: Int, idCol: String = "doc_id", sourceCol: String = "source",
           compactEvery: Int = 0): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docStream.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        processBatch(batch, registryDir, cap, idCol, sourceCol)
          .write.mode(SaveMode.Append).parquet(verdictDir)
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0) {
          graft.queue.Maintenance.compactParquet(batch.sparkSession,
            registryDir, partitionCols = Seq("sbucket"))
          ()
        }
    }

  /** [[gate]]'s token-budgeted form, wiring [[processBatchTokens]]. */
  def gateTokens(docStream: DataFrame, registryDir: String, verdictDir: String,
                 budget: Long, tokenCol: String = "n_chars",
                 idCol: String = "doc_id", sourceCol: String = "source",
                 compactEvery: Int = 0): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docStream.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        processBatchTokens(batch, registryDir, budget, tokenCol, idCol, sourceCol)
          .write.mode(SaveMode.Append).parquet(verdictDir)
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0) {
          graft.queue.Maintenance.compactParquet(batch.sparkSession,
            registryDir, partitionCols = Seq("sbucket"))
          ()
        }
    }
}
