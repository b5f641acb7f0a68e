package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted VARIANT events layout — the storage-side half of q103.
  *
  * The query-side half ([[graft.queries.EventQueries.variantProps]])
  * decodes each `props` JSON string with `try_parse_json` at QUERY time:
  * right for ad-hoc exploration, but a pipeline that hits the same event
  * feed repeatedly re-pays the parse on every run. This store is the
  * [[BucketedCorpus]] move applied to semi-structured decoding: encode
  * ONCE at ingest, persist the binary variant column to parquet (Spark 4
  * writes VariantType natively), and every later query's field access is
  * a `variant_get` over the stored buffer — no JSON parse anywhere in the
  * query plan. And not merely shredding-READY: Spark 4.1 defaults
  * `spark.sql.variant.writeShredding.enabled` + `inferShreddingSchema` +
  * `pushVariantIntoScan` to true, so this layout writes each inferred
  * field as a typed Parquet subcolumn and a single-field read plans as
  * `ReadSchema: ...v:struct<k:int>` — the scan reads ONLY that subcolumn,
  * never the variant binary (VariantStoreSpec pins the pushed plan). At
  * 100 TB that is ordinary column pruning over semi-structured data.
  *
  * Malformed rows follow q103's own rule: `try_parse_json` stores a null
  * variant (the raw string is gone — callers that must audit originals
  * keep the raw feed beside the layout, the DocumentSource quarantine
  * discipline).
  */
object VariantEventStore {

  /** Encode `propsCol` once and persist the layout: all other columns
    * unchanged, `props_v VARIANT` replacing the JSON string. */
  def write(events: DataFrame, dir: String, propsCol: String = "props"): Unit =
    events
      .withColumn("props_v", try_parse_json(col(propsCol)))
      .drop(propsCol)
      .write.mode(SaveMode.Overwrite).parquet(dir)

  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  private val layoutMemo =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(SparkSession, String)]()

  /** The persisted layout for `sfDir`'s events feed, written ONCE per JVM
    * (first caller encodes + persists under /tmp, later callers — e.g.
    * Bench's three timing passes of q106 — reuse it). Overwrites whatever
    * a previous JVM left so a layout written by older code never leaks
    * into this run's results; the memo records the write only AFTER it
    * succeeds, so a failed first write is retried rather than leaving the
    * JVM silently reading the stale dir. The dir key carries an md5 of
    * the raw path beside the sanitized name — two sfDirs that sanitize
    * identically ("/a/b" vs "/a_b") must never share a layout. Single-
    * threaded callers only (Verify/Bench run the battery sequentially);
    * a racing second session would read a half-written dir. */
  def layoutFor(spark: SparkSession, sfDir: String,
                events: DataFrame): String = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(sfDir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(4).map("%02x".format(_)).mkString
    val dir = "/tmp/graft-variant-store/" + digest + "_" +
      sfDir.replaceAll("[^A-Za-z0-9._-]", "_")
    val key = (spark, sfDir)
    if (!layoutMemo.contains(key)) {
      write(events, dir)
      layoutMemo.add(key)
    }
    dir
  }

  /** The sink's per-batch partition column — the replay-idempotence key
    * (see [[sink]]); readers that want the raw event shape drop it. */
  private[sources] val BatchCol = "ingest_batch"

  private val sinkSchemaMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Map[String, String]]()

  private def shape(schema: org.apache.spark.sql.types.StructType) =
    schema.fields.filterNot(_.name == BatchCol)
      .map(f => f.name -> f.dataType.sql).toMap

  /** One micro-batch step of [[sink]], keyed by `batchId` — package-
    * private so the replay contract is testable without staging a crash. */
  private[sources] def appendBatch(batch: DataFrame, dir: String,
                                   propsCol: String, batchId: Long): Unit = {
    require(batch.columns.contains(propsCol),
      s"variant sink: batch has no '$propsCol' column (schema drift " +
        s"upstream?) — columns: ${batch.columns.mkString(", ")}")
    val enc = batch
      .withColumn("props_v", try_parse_json(col(propsCol)))
      .drop(propsCol)
    // memo only trusted while the dir still holds data — a deleted-and-
    // recreated layout legitimately starts a NEW shape and must not be
    // rejected against the old one (the on-disk state is the truth the
    // memo merely caches)
    val established =
      if (!graft.streaming.RegistryIO.hasData(dir, Some(BatchCol + "="))) None
      else Option(sinkSchemaMemo.get(dir)).orElse(
        Some(shape(batch.sparkSession.read.parquet(dir).schema)))
    established.foreach { have =>
      require(shape(enc.schema) == have,
        s"variant sink: batch schema drifted from the layout at $dir — " +
          s"layout: $have, batch: ${shape(enc.schema)}; appending would " +
          "leave mixed-schema files no reader can scan")
    }
    // dynamic partition overwrite on the batch id: an at-least-once
    // replay REWRITES its own ingest_batch=N partition instead of
    // appending a second copy — the same idempotence every other durable
    // sink in this engine provides (min-absorbed registry appends,
    // per-(source,doc) quota dedup), here by construction
    enc.withColumn(BatchCol, lit(batchId))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(BatchCol).parquet(dir)
    sinkSchemaMemo.put(dir, shape(enc.schema))
    ()
  }

  /** Streaming face of [[write]]: encode each micro-batch's `propsCol`
    * once and append the layout, so repeat-query pipelines read the
    * shredded parquet even while the feed is live.
    *
    *   - REPLAY-SAFE: each batch lands in its own `ingest_batch=N`
    *     partition via dynamic partition overwrite, so a foreachBatch
    *     replay after a crash-before-checkpoint rewrites the same
    *     partition instead of double-counting events;
    *   - DRIFT-SAFE the SchemaContract way — fail loudly, never write
    *     unreadable state: a batch without `propsCol`, or whose encoded
    *     shape (column name → type, order-insensitive, the batch column
    *     excluded) differs from the layout already on disk (first batch
    *     of a fresh dir establishes it; a restarted JVM re-reads it from
    *     the parquet footers once), aborts the query instead of appending
    *     mixed-schema files that would break every later reader.
    *
    * Caller starts the query and picks trigger/checkpoint options. */
  def sink(eventStream: DataFrame, dir: String, propsCol: String = "props")
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    eventStream.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        appendBatch(batch, dir, propsCol, batchId)
    }

  /** q103's aggregation over an already-decoded variant column — shared
    * with the query-time path so the two stay value-identical by
    * construction (VariantStoreSpec pins it; the DuckDB oracle pins the
    * query-time twin). */
  def propsAgg(events: DataFrame, variantCol: String = "props_v"): DataFrame =
    events
      .withColumn("k", expr(s"variant_get($variantCol, '$$.k', 'int')"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"),
        count_distinct(col("k")).as("n_distinct_k"),
        sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_null_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))
}
