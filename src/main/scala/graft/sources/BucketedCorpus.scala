package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed corpus layout — the storage-side half of the shuffle story.
  *
  * Every per-document enrichment in this engine (dedup verdicts joining
  * back, curation columns, split assignments, chunk reassembly) is a join
  * on `doc_id`; at 100 TB each such join is a full corpus shuffle UNLESS
  * the data already lives hash-partitioned by the join key. `bucketBy`
  * writes exactly that layout once: both sides of a same-bucketing join
  * then plan WITHOUT an Exchange (pinned in BucketedCorpusSpec), so the
  * corpus is shuffled once at ingest instead of once per query.
  *
  * Spark's bucketing metadata lives in the CATALOG, not the files — with
  * the session-local in-memory catalog the layout survives the session
  * only. A production deployment points `spark.sql.warehouse.dir` +
  * metastore at durable storage (or uses a lakehouse table format, the
  * same upgrade path PendingStore documents for multi-writer commits);
  * the PLAN benefits here are identical either way.
  */
object BucketedCorpus {

  /** Write a relation bucketed (and sort-clustered) by `keyCol` as table
    * `name`. 16 buckets is a test-scale default — production sizing is
    * corpus-bytes / target-partition-bytes, fixed ONCE per corpus so every
    * enrichment table can match it (co-located joins need equal bucket
    * counts on both sides). */
  def write(df: DataFrame, name: String, keyCol: String = "doc_id",
            buckets: Int = 16): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keyCol).sortBy(keyCol)
      .saveAsTable(name)

  def read(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
