package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Corpus accounting at ingest — the streaming twin of the batch mix report
  * (q98): as documents arrive, a durable registry accumulates which
  * (source, lang) cell each admitted document landed in and its character
  * mass, so the data card's mix numbers are available DURING the crawl,
  * not only after a full-corpus pass.
  *
  * State is doc-GRAINED on purpose: an aggregate-valued registry (one
  * running counter per cell) cannot absorb at-least-once redelivery — a
  * replayed batch would double-count, and the error would be silent and
  * permanent. Storing `(sbucket, source, lang, doc_id, n_chars)` rows
  * makes idempotence structural: re-appended duplicates collapse in the
  * count/sum-DISTINCT aggregation, exactly the discipline of
  * [[DomainQuota]]'s admitted set (whose registry this layout mirrors,
  * 256-way source-hash `sbucket` hive partitioning included, so millions
  * of domains never become millions of directories and probes prune to
  * the batch's touched buckets).
  *
  * Per micro-batch: intra-batch redeliveries collapse, the registry scan
  * prunes to touched sbuckets, genuinely-new docs append, and the emitted
  * verdict reports each touched (source, lang) cell's POST-batch totals
  * (`n_docs`, `sum_chars`) plus how much this batch added — the live
  * feed a mix-monitoring dashboard tails. Per-batch I/O is O(touched
  * domains), not O(registry) (measured flat in SCALE.md like the other
  * registry probes).
  *
  * [[report]] then renders the full q98 grouping-sets data card from the
  * registry on demand — over exactly the documents ingested so far, with
  * the same gid/ALL/share-ppm shape, so a consumer can diff the live card
  * against a batch `corpusMixReport` run and see zero drift.
  */
object CorpusStats {

  private val registrySchema: StructType = StructType.fromDDL(
    "sbucket INT, source STRING, lang STRING, doc_id BIGINT, n_chars BIGINT")

  private val rollupSchema: StructType = StructType.fromDDL(
    "source STRING, lang STRING, n_docs BIGINT, sum_chars BIGINT")

  private def bucketOf(source: org.apache.spark.sql.Column) =
    (crc32(source) % 256).cast("int")

  /** One micro-batch step → per-cell verdicts `(source, lang, n_docs,
    * sum_chars, batch_docs, batch_chars)` with post-batch totals. Null
    * source/lang normalize to "" (the same missing-metadata rule as
    * [[DomainQuota.processBatch]]). Replayed documents add nothing: they
    * are detected against the registry's (source, doc_id) key and excluded
    * from both the append and the batch_* deltas. */
  def processBatch(batch: DataFrame, registryDir: String,
                   idCol: String = "doc_id", sourceCol: String = "source",
                   langCol: String = "lang", charsCol: String = "n_chars"): DataFrame = {
    val spark = batch.sparkSession
    val docs = batch
      .select(col(idCol).as("doc_id"),
        coalesce(col(sourceCol), lit("")).as("source"),
        coalesce(col(langCol), lit("")).as("lang"),
        // null chars normalize to 0 like null source/lang normalize to "":
        // a null riding into the registry would make sum() emit NULL for
        // an all-null cell and NPE every Long collect downstream (rollup
        // merge, self-heal, langMass)
        coalesce(col(charsCol).cast("long"), lit(0L)).as("n_chars"))
      .dropDuplicates("source", "doc_id")
      .withColumn("sbucket", bucketOf(col("source")))
      .localCheckpoint(true) // feeds probe, replay join, append, verdicts
    val touched = docs.select(col("sbucket")).distinct()
      .collect().map(_.getInt(0))
    val registryAll = readRegistry(spark, registryDir)
    val registry =
      if (touched.isEmpty) registryAll.limit(0)
      else registryAll.filter(col("sbucket").isInCollection(touched))
    val replayed = registry.join(broadcast(docs), Seq("source", "doc_id"))
      .select(col("source"), col("doc_id")).distinct()
      .withColumn("replayed", lit(true))
    val fresh = docs.join(broadcast(replayed), Seq("source", "doc_id"), "left")
      .filter(col("replayed").isNull)
      .select(col("sbucket"), col("source"), col("lang"),
        col("doc_id"), col("n_chars"))
      .localCheckpoint(true) // fix before the append mutates the scanned dir
    // prior totals for the batch's cells, replay-absorbing: distinct rows
    // first (a re-appended duplicate collapses), then count/sum
    val touchedCells = docs.select(col("source"), col("lang")).distinct()
    val prior = registry
      .join(broadcast(touchedCells), Seq("source", "lang"))
      .select(col("source"), col("lang"), col("doc_id"), col("n_chars"))
      .distinct()
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("prior_docs"), sum(col("n_chars")).as("prior_chars"))
    val delta = fresh.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("batch_docs"), sum(col("n_chars")).as("batch_chars"))
    val verdicts = touchedCells
      .join(broadcast(prior), Seq("source", "lang"), "left")
      .join(broadcast(delta), Seq("source", "lang"), "left")
      .select(col("source"), col("lang"),
        (coalesce(col("prior_docs"), lit(0L)) + coalesce(col("batch_docs"), lit(0L)))
          .as("n_docs"),
        (coalesce(col("prior_chars"), lit(0L)) + coalesce(col("batch_chars"), lit(0L)))
          .as("sum_chars"),
        coalesce(col("batch_docs"), lit(0L)).as("batch_docs"),
        coalesce(col("batch_chars"), lit(0L)).as("batch_chars"))
      .localCheckpoint(true)
    fresh.write.mode(SaveMode.Append).partitionBy("sbucket").parquet(registryDir)
    // maintain the O(strata) per-cell rollup (see [[readRollup]]); the
    // batch's exact delta is already in hand, so the merge costs one tiny
    // aggregate + swap, never a registry scan
    if (RegistryIO.hasData(rollupDir(registryDir), None)) {
      val merged = readRollup(spark, registryDir)
        .unionByName(delta.select(col("source"), col("lang"),
          col("batch_docs").as("n_docs"), col("batch_chars").as("sum_chars")))
        .groupBy(col("source"), col("lang"))
        .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_chars")).as("sum_chars"))
      writeRollup(merged, registryDir)
    } else rebuildRollup(spark, registryDir) // adoption: registry predates rollup
    // SELF-HEAL: the verdicts' post-batch totals were computed from the
    // registry (ground truth) for exactly this batch's touched cells; if
    // the merged rollup disagrees on any of them — the append-then-crash
    // window replaying, or any historical drift these cells expose — the
    // rollup is stale and one rebuild restores it. O(touched cells), so
    // the production path detects the documented crash window instead of
    // leaving it to an operator running rebuildRollup by hand.
    val verdictCells = verdicts
      .select(col("source"), col("lang"), col("n_docs"), col("sum_chars"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val rollupCells = readRollup(spark, registryDir)
      .join(broadcast(touchedCells), Seq("source", "lang"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // an absent rollup row means (0, 0), and a touched cell CAN total
    // zero legitimately (a replayed doc redelivered under a different
    // lang touches a cell with no registered mass) — comparing against
    // the zero default keeps that consistent state from triggering a
    // full rebuild on every such delivery
    val drifted = verdictCells.exists { case (k, v) =>
      rollupCells.getOrElse(k, (0L, 0L)) != v
    }
    if (drifted) rebuildRollup(spark, registryDir)
    verdicts
  }

  /** Compacted per-cell rollup `(source, lang, n_docs, sum_chars)` — the
    * O(strata) read path for [[report]] and [[MixBalance.rates]]. The
    * doc-grained registry stays the source of truth and the idempotence
    * substrate; the rollup is a derived cache kept exactly in sync by
    * [[processBatch]] (fresh-only deltas, so replays add nothing) via the
    * same rename-aside swap as registry compaction.
    *
    * Crash window: [[processBatch]] appends doc rows and THEN swaps the
    * merged rollup, so a process dying between the two leaves the rollup
    * stale by that batch — and the replay exclusion alone would never
    * repair it. processBatch therefore SELF-HEALS: after each merge it
    * compares the rollup's touched cells against the verdicts' registry-
    * derived post-batch totals (O(touched cells)) and rebuilds on any
    * mismatch — the crashed batch's replay touches exactly the stale
    * cells, so the window closes on the next delivery of that batch.
    * [[rebuildRollup]] remains the manual recovery for drift outside any
    * replayed batch's cells. */
  def readRollup(spark: SparkSession, registryDir: String): DataFrame =
    RegistryIO.readOrEmpty(spark, rollupDir(registryDir), rollupSchema, None)

  private def rollupDir(registryDir: String): String =
    registryDir.stripSuffix("/") + "_rollup"

  private def writeRollup(cells: DataFrame, registryDir: String): Unit = {
    val dir = rollupDir(registryDir)
    val p = java.nio.file.Paths.get(dir)
    // dot-prefixed staging sibling, then rename-aside swap (Maintenance's
    // compaction discipline) so readers never see a half-written rollup
    val tmp = p.resolveSibling("." + p.getFileName.toString + ".swap").toString
    cells.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
    graft.queue.Maintenance.replaceDir(tmp, dir)
  }

  /** THE ground-truth per-cell aggregate, defined once: distinct doc rows
    * (replay absorption), then count/sum per (source, lang). Every
    * doc-grained consumer — [[rebuildRollup]], the [[langMass]] and
    * [[report]] fallbacks — derives from this so the dedup discipline
    * cannot drift between them. */
  private def cellAggregate(spark: SparkSession, registryDir: String): DataFrame =
    readRegistry(spark, registryDir)
      .select(col("source"), col("lang"), col("doc_id"), col("n_chars"))
      .distinct()
      .groupBy(col("source"), col("lang"))
      // the per-row coalesce guards LEGACY registries written before
      // intake normalized null chars to 0: an all-null cell would sum to
      // NULL and NPE the Long collects downstream
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("n_chars"), lit(0L))).as("sum_chars"))

  /** Re-derive the rollup from the doc-grained registry: the adoption path
    * (a registry that predates rollups) and the crash-window recovery. One
    * full registry scan — O(corpus-count) metadata, run once, after which
    * every batch merge is O(strata). */
  def rebuildRollup(spark: SparkSession, registryDir: String): Unit =
    writeRollup(cellAggregate(spark, registryDir), registryDir)

  /** Per-lang character mass, O(strata) when the rollup exists; one
    * doc-grained aggregate otherwise (registry seeded/adopted before any
    * [[processBatch]] built the rollup). The [[MixBalance.rates]] pull. */
  def langMass(spark: SparkSession, registryDir: String): Map[String, Long] = {
    val cells =
      if (RegistryIO.hasData(rollupDir(registryDir), None))
        readRollup(spark, registryDir)
      else cellAggregate(spark, registryDir)
    cells.groupBy(col("lang")).agg(sum(col("sum_chars")).as("mass"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  /** Bulk-seed the registry from an existing corpus (migration path:
    * adopt live accounting over a crawl that predates it). Same
    * normalization as [[processBatch]]. */
  def seedRegistry(docs: DataFrame, registryDir: String,
                   idCol: String = "doc_id", sourceCol: String = "source",
                   langCol: String = "lang", charsCol: String = "n_chars"): Unit = {
    docs.select(bucketOf(coalesce(col(sourceCol), lit(""))).as("sbucket"),
        coalesce(col(sourceCol), lit("")).as("source"),
        coalesce(col(langCol), lit("")).as("lang"),
        col(idCol).as("doc_id"),
        coalesce(col(charsCol).cast("long"), lit(0L)).as("n_chars"))
      .write.mode(SaveMode.Append).partitionBy("sbucket").parquet(registryDir)
    // a blind append can duplicate and bypasses the delta merge: an
    // existing rollup must be re-derived, an absent one stays absent until
    // the first processBatch adopts the registry
    if (RegistryIO.hasData(rollupDir(registryDir), None))
      rebuildRollup(docs.sparkSession, registryDir)
  }

  /** The append-only accounting rows ([[RegistryIO]] empty-state rules). */
  def readRegistry(spark: SparkSession, registryDir: String): DataFrame =
    RegistryIO.readOrEmpty(spark, registryDir, registrySchema, Some("sbucket="))

  /** The q98 data card over everything ingested so far: same grouping
    * sets, gid arithmetic, ALL-coalescing, and double-division share-ppm
    * algebra as `TrainingDataQueries.corpusMixReport`, computed from the
    * registry (distinct rows first, so replayed appends don't skew it).
    * One registry pass, map-side combined like the batch query.
    *
    * Equivalence contract: equal to `corpusMixReportOn` over the ingested
    * documents WITH THIS OPERATOR'S NORMALIZATION applied (null
    * source/lang → "", the rule [[processBatch]] stores under). A raw
    * batch run over unnormalized docs would label a null-lang slice 'ALL'
    * (colliding with the aggregate rows' label, disambiguated only by
    * gid) where the live card shows the "" stratum — normalize first, as
    * CorpusStatsSpec's null-bearing equivalence case does. */
  def report(spark: SparkSession, registryDir: String): DataFrame = {
    // per-cell counts from the O(strata) rollup when maintained; the
    // doc-grained fallback covers adopted/seeded registries. The grouping
    // sets re-aggregate cells, so both inputs yield the identical card.
    val d =
      if (RegistryIO.hasData(rollupDir(registryDir), None))
        readRollup(spark, registryDir)
      else cellAggregate(spark, registryDir)
    val agg = d
      .groupingSets(
        Seq(Seq(col("lang"), col("source")), Seq(col("lang")),
          Seq(col("source")), Seq.empty),
        col("lang"), col("source"))
      .agg(sum(col("n_docs")).cast("long").as("n_docs"),
        sum(col("sum_chars")).cast("long").as("sum_chars"),
        (grouping(col("lang")) * 2 + grouping(col("source"))).cast("int").as("gid"))
    agg.crossJoin(d.agg(sum(col("sum_chars")).cast("long").as("total_chars")))
      .select(coalesce(col("lang"), lit("ALL")).as("lang"),
        coalesce(col("source"), lit("ALL")).as("source"),
        col("gid"), col("n_docs"), col("sum_chars"),
        floor(col("sum_chars").cast("double") / col("total_chars").cast("double") * 1e6)
          .cast("long").as("share_ppm"))
      .orderBy(col("gid"), col("lang"), col("source"))
  }

  /** Streaming face: wire a document stream through [[processBatch]],
    * appending per-cell verdicts to `verdictDir`; `compactEvery` schedules
    * registry compaction as the other registry gates do. */
  def feed(docStream: DataFrame, registryDir: String, verdictDir: String,
           idCol: String = "doc_id", sourceCol: String = "source",
           langCol: String = "lang", charsCol: String = "n_chars",
           compactEvery: Int = 0): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docStream.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        processBatch(batch, registryDir, idCol, sourceCol, langCol, charsCol)
          .write.mode(SaveMode.Append).parquet(verdictDir)
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0) {
          graft.queue.Maintenance.compactParquet(batch.sparkSession,
            registryDir, partitionCols = Seq("sbucket"))
          ()
        }
    }
}
