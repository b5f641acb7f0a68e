package graft.sources

import graft.functions.GraftFunctions
import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF (inverted-file) ANN index — the durable artifact a
  * retrieval/serving system consumes, beside the in-memory probe path
  * ([[graft.operators.Similarity.ivfTopK]]) the battery already gates.
  *
  * The reference has no vector surface at all (its core is CDC/webhook
  * plumbing — `/root/reference/src/cdc_webhook.c:153`); this is EXT training-data
  * surface, the index twin of the other persisted layouts
  * ([[VariantEventStore]] for semi-structured events, [[ShardWriter]] for
  * epoch schedules): build cost paid once at write time, query cost bounded
  * by the LAYOUT, not by operator discipline.
  *
  * Layout: inverted lists hive-partitioned by `centroid_id` (one directory
  * per list, `repartition(nlist, centroid_id)` bounding each to one task's
  * files), plus the KB-scale codebook under `_codebook/` — an
  * underscore-prefixed path, so partition discovery of the lists never
  * sees it.
  *
  * Why this is THE 100 TB shape: [[Similarity.ivfTopK]] must re-assign the
  * corpus on every query (fine inside one job where the assignment plan is
  * shared; useless as a serving artifact). Here a query
  *
  *   1. scores the query vector against the codebook — a driver-side
  *      read of nlist rows (KBs; the ONLY collect, bounded by nlist);
  *   2. turns the nprobe winning list ids into a LITERAL partition
  *      filter, so the parquet scan reads nprobe/nlist of the corpus —
  *      pruning enforced by the layout and pinned in IvfIndexStoreSpec;
  *   3. scans just those lists with the codegen'd
  *      [[graft.functions.FloatVectorDot]] and takes top-k — one
  *      TakeOrderedAndProject, no shuffle of anything corpus-sized.
  *
  * q112 gates the whole build→persist→prune→score chain against q53's
  * DuckDB oracle (same deterministic first-`nlist`-vectors codebook, same
  * query, same output shape), so index staleness bugs hash-fail.
  */
object IvfIndexStore {

  /** Build (or rebuild) the index at `dir`: one assignment pass over the
    * corpus ([[Similarity.ivfAssignWith]] — broadcast codebook, map-side
    * scoring, partial+final argmax), then one clustered write. `codebook`
    * defaults to the deterministic first-`nlist`-vectors sample (q53's);
    * pass [[Similarity.ivfTrain]]'s output for a trained index. */
  def build(emb: DataFrame, dir: String, nlist: Int = 16,
            codebook: Option[DataFrame] = None,
            idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val cents = codebook.getOrElse(
      emb.filter(col(idCol) < nlist)
        .select(col(idCol).cast("long").as("centroid_id"), col(vecCol).as("cvec")))
    // lists FIRST: their Overwrite clears the whole store dir (including
    // any previous _codebook), then the matching codebook lands beside
    // them. A crash between the two writes leaves a store that fails
    // loudly at serve time (no _codebook) rather than answering from a
    // codebook that doesn't match its lists. The bulk build is batch -1
    // of the ingest_batch partition level that [[sink]] appends into
    // (streaming batch ids start at 0, so no append can collide with it).
    Similarity.ivfAssignWith(emb, cents, idCol, vecCol)
      .select(col(idCol), col(vecCol), col("centroid_id"))
      .withColumn(BatchCol, lit(-1L))
      .repartition(nlist, col("centroid_id"))
      .write.mode(SaveMode.Overwrite)
      // STATIC overwrite, pinned: a rebuild must clear the WHOLE store
      // (including appended ingest_batch>=0 leaves). Under a session that
      // set partitionOverwriteMode=dynamic globally, the default would
      // only replace the batch -1 partitions and leave stale appends
      // serving duplicate vectors beside the fresh build.
      .option("partitionOverwriteMode", "static")
      .partitionBy("centroid_id", BatchCol).parquet(dir)
    // nlist rows — one file keeps the serving read a single footer fetch
    cents.coalesce(1).write.mode(SaveMode.Overwrite).parquet(dir + "/_codebook")
  }

  /** The persisted codebook: (centroid_id, cvec), nlist rows. */
  def codebook(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir + "/_codebook")

  /** The `nprobe` list ids whose centroids score highest against
    * `queryVec` — the driver-side probe-selection step. Quantized-dot
    * ordering with centroid-id ties, exactly [[Similarity.ivfTopK]]'s. */
  def probeLists(spark: SparkSession, dir: String, queryVec: Seq[Float],
                 nprobe: Int): Seq[Long] = {
    import spark.implicits._
    codebook(spark, dir)
      .select(col("centroid_id"), Similarity.quantize(
        GraftFunctions.vecDot(spark, col("cvec"), typedLit(queryVec))).as("cdot"))
      .orderBy(col("cdot").desc, col("centroid_id"))
      .limit(nprobe)
      .select(col("centroid_id")).as[Long].collect().toSeq
  }

  /** Serve one ANN query from the persisted index: probe selection on the
    * codebook, then top-k over ONLY the probed lists. The probe ids land
    * as literals in the scan's partition filter — the nprobe/nlist read
    * bound is visible in the plan, not just the prose. */
  def topK(spark: SparkSession, dir: String, queryVec: Seq[Float],
           k: Int, nprobe: Int = 2, idCol: String = "vec_id",
           vecCol: String = "embedding"): DataFrame = {
    val probes = probeLists(spark, dir, queryVec, nprobe)
    spark.read.parquet(dir)
      .filter(col("centroid_id").isin(probes: _*))
      .select(col(idCol), Similarity.quantize(
        GraftFunctions.vecDot(spark, col(vecCol), typedLit(queryVec))).as("sim_q"))
      .orderBy(col("sim_q").desc, col(idCol))
      .limit(k)
  }

  /** Serve a BATCH of ANN queries from the persisted index in ONE pruned
    * corpus pass — the retrieval-service shape ([[graft.operators
    * .Similarity.knnJoin]]'s batch discipline, answered from the store
    * instead of a full scan). [[topK]] serves one query; a service draining
    * a request queue must not pay one scan per query when their probed
    * lists overlap.
    *
    *   1. probe selection for ALL queries at once: the query batch joins
    *      the broadcast KB-scale codebook, and a per-query rank window
    *      (batch-sized input, nothing corpus-grained) keeps each query's
    *      `nprobe` best lists — quantized-dot ordering with centroid-id
    *      ties, exactly [[probeLists]]';
    *   2. the UNION of probed list ids (≤ min(nlist, |batch|·nprobe),
    *      a bounded driver pull like [[probeLists]]' codebook read) lands
    *      as literals in ONE scan's partition filter — the corpus read is
    *      the union of probed lists, shared across queries, not a scan per
    *      query;
    *   3. each scanned vector meets ONLY the queries that probed its list
    *      (broadcast hash join against the per-query probe table — q83's
    *      broadcast-query-batch discipline), is scored with the codegen'd
    *      [[graft.functions.FloatVectorDot]], and the per-query top-k is
    *      the bounded [[graft.operators.TopKAggregator]] — the shuffle
    *      carries O(queries·k) partial buffers, never the scanned lists.
    *
    * Output matches [[graft.operators.Similarity.knnJoin]]'s
    * `(query_id, rn, vec_id, sim_q)` — per query, the same rows a
    * [[topK]] call with the same parameters returns (IvfIndexStoreSpec
    * pins the equivalence; q115 hash-gates the chain against a DuckDB
    * replay of probe selection + scoring). */
  def topKBatch(spark: SparkSession, dir: String, queries: DataFrame,
                k: Int, nprobe: Int = 2, idCol: String = "vec_id",
                vecCol: String = "embedding", queryIdCol: String = "query_id",
                queryVecCol: String = "query_vec"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val rankW = Window.partitionBy(col(queryIdCol))
      .orderBy(col("cdot").desc, col("centroid_id"))
    // localCheckpoint(eager): the probe table feeds the driver-side list
    // pull AND the scan join; one materialization pins both to the same
    // probe selection
    val probes = queries
      .select(col(queryIdCol), col(queryVecCol))
      .crossJoin(broadcast(codebook(spark, dir)))
      .select(col(queryIdCol), col(queryVecCol), col("centroid_id"),
        Similarity.quantize(
          GraftFunctions.vecDot(spark, col("cvec"), col(queryVecCol))).as("cdot"))
      .withColumn("prn", row_number().over(rankW))
      .filter(col("prn") <= nprobe)
      .select(col(queryIdCol), col(queryVecCol), col("centroid_id"))
      .localCheckpoint(true)
    val probedLists = probes.select(col("centroid_id").cast("long"))
      .distinct().as[Long].collect().toSeq.sorted
    spark.read.parquet(dir)
      .filter(col("centroid_id").isin(probedLists: _*))
      .join(broadcast(probes), Seq("centroid_id"))
      .select(col(queryIdCol).cast("long").as(queryIdCol),
        col(idCol).cast("long").as(idCol),
        Similarity.quantize(
          GraftFunctions.vecDot(spark, col(vecCol), col(queryVecCol))).as("sim_q"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      // sim_q is integer millionths (|v| ≤ 1e6 · dims) — exact in Double
      .mapValues(t => graft.operators.ScoredId(t._3.toDouble, t._2))
      .agg(new graft.operators.TopKAggregator(k).toColumn.name("topk"))
      .flatMap { case (qid, top) =>
        top.zipWithIndex.map { case (s, i) => (qid, i + 1, s.id, s.score.toLong) }
      }
      .toDF(queryIdCol, "rn", idCol, "sim_q")
  }

  /** The sink's per-batch partition level under each list — the
    * replay-idempotence key ([[VariantEventStore.BatchCol]]'s discipline);
    * the bulk [[build]] is batch -1, below any streaming batch id. Serving never touches it: [[topK]]
    * prunes on `centroid_id` and scans every batch of the probed lists. */
  private[sources] val BatchCol = "ingest_batch"

  /** One micro-batch step of [[sink]], keyed by `batchId` — package-
    * private so the replay contract is testable without staging a crash. */
  private[sources] def appendBatch(batch: DataFrame, dir: String,
                                   batchId: Long, idCol: String = "vec_id",
                                   vecCol: String = "embedding"): Unit = {
    require(batch.columns.contains(idCol) && batch.columns.contains(vecCol),
      s"ivf sink: batch lacks '$idCol'/'$vecCol' (schema drift upstream?) " +
        s"— columns: ${batch.columns.mkString(", ")}")
    // the codebook is FROZEN at build time (standard IVF maintenance:
    // appends assign against the existing centroids; re-centering is an
    // offline rebuild) — a missing store fails loudly here
    val cents = codebook(batch.sparkSession, dir)
    // checkpoint the assignment so the rows VALIDATED below are the same
    // materialization as the rows WRITTEN — a foreachBatch source that
    // re-read differently between the two actions could otherwise pass
    // validation on one snapshot and file a different one
    val assigned = Similarity.ivfAssignWith(batch, cents, idCol, vecCol)
      .localCheckpoint()
    // a vector whose length differs from the codebook's dims (or a null
    // vector) dots to NULL against EVERY centroid — the argmax carries
    // that through as a null cdot_q. Fail loudly instead of filing
    // garbage under an arbitrary list.
    val bad = assigned.filter(col("cdot_q").isNull).count()
    require(bad == 0,
      s"ivf sink: $bad vector(s) in batch $batchId have null/mismatched " +
        "dims vs the store's codebook; appending would corrupt the lists")
    // dynamic partition overwrite on (list, batch): an at-least-once
    // replay re-derives the SAME deterministic assignment and REWRITES
    // its own (centroid_id, ingest_batch=N) partitions instead of
    // appending a second copy
    assigned
      .select(col(idCol), col(vecCol), col("centroid_id"))
      .withColumn(BatchCol, lit(batchId))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("centroid_id", BatchCol).parquet(dir)
  }

  /** Streaming face of [[build]]: assign each micro-batch of new vectors
    * against the store's frozen codebook and append them to their list
    * partitions, so the persisted index stays serveable while the corpus
    * grows — no rebuild, no corpus re-scan, O(batch · nlist) scoring work
    * per tick.
    *
    *   - REPLAY-SAFE: each batch lands in its own
    *     `centroid_id=&lt;list&gt;/ingest_batch=N` leaves via dynamic partition
    *     overwrite — a foreachBatch replay after a crash-before-checkpoint
    *     rewrites its own partitions (assignment is deterministic), never
    *     double-counts;
    *   - DRIFT-SAFE, fail-loud: a batch missing the id/vector columns, or
    *     carrying vectors whose dims don't match the codebook, aborts the
    *     query instead of filing garbage under an arbitrary list;
    *   - the codebook is frozen (appends never move existing vectors);
    *     recall drift under a shifting distribution is the documented
    *     trade — SCALE.md's recall curve is the instrument, rebuild the
    *     remedy.
    *
    * Caller starts the query and picks trigger/checkpoint options. */
  def sink(vecStream: DataFrame, dir: String, idCol: String = "vec_id",
           vecCol: String = "embedding")
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    vecStream.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        appendBatch(batch, dir, batchId, idCol, vecCol)
    }

  private val layoutMemo =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(SparkSession, String)]()

  /** Battery-entry helper ([[ShardWriter.layoutFor]]'s pattern): build the
    * index for (`sfDir`, `nlist`) once per session and return its path —
    * q112 runs three bench passes over one build. The memo records a
    * write only AFTER it succeeds; single-threaded callers only
    * (Verify/Bench run the battery sequentially). */
  def layoutFor(spark: SparkSession, sfDir: String, emb: DataFrame,
                nlist: Int): String = {
    val keyStr = s"$sfDir|nlist$nlist"
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(keyStr.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(4).map("%02x".format(_)).mkString
    val dir = "/tmp/graft-ivf-store/" + digest + "_" +
      (s"nlist${nlist}_" + sfDir).replaceAll("[^A-Za-z0-9._-]", "_")
    val key = (spark, keyStr)
    if (!layoutMemo.contains(key)) {
      build(emb, dir, nlist)
      layoutMemo.add(key)
    }
    dir
  }
}
