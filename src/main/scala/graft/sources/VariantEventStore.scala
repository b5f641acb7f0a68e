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
    * into this run's results. Single-threaded callers only (Verify/Bench
    * run the battery sequentially); a racing second session would read a
    * half-written dir. */
  def layoutFor(spark: SparkSession, sfDir: String,
                events: DataFrame): String = {
    val dir = "/tmp/graft-variant-store/" +
      sfDir.replaceAll("[^A-Za-z0-9._-]", "_")
    if (layoutMemo.add((spark, sfDir))) write(events, dir)
    dir
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
