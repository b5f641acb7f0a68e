package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Epoch shard materialization — the write side of the training-schedule
  * family. q107 ([[graft.queries.TrainingDataQueries.epochShard]]) decides
  * WHERE every document goes (shard) and in WHAT ORDER (shard_pos); this
  * writer turns that narrow id-only assignment into the artifact a trainer
  * actually consumes: one parquet file per numbered shard whose physical
  * row order IS the schedule order, so an epoch is a sequential scan of
  * shard files with zero sort, shuffle, or join left at training time.
  *
  * Scale shape (the "shard writer" the q107/q110 scaladocs defer to):
  *  - the assignment stays (id, shard, pos)-narrow through the schedule
  *    machinery; the wide text payload is joined back by doc_id exactly
  *    ONCE, here — and that join needs no payload-side exchange when the
  *    corpus lives in the [[BucketedCorpus]] layout (same key);
  *  - `repartition(nshards, shard)` sends every shard WHOLLY to one task —
  *    a hash collision co-locates whole shards, never splits one — so
  *    `partitionBy(shard)` emits exactly one file per shard;
  *  - `sortWithinPartitions(shard, shard_pos)` is a per-task sort bounded
  *    by the shards that task holds (shard-file-sized by q107's nshards
  *    sizing rule: thousands of ~1 GiB shards at 100 TB), never global.
  *
  * ShardWriterSpec pins one-file-per-shard, in-file row order ==
  * schedule order, exactly-once corpus coverage, and the no-global-sort
  * plan; q111 oracle-gates the write→read round trip end-to-end against
  * the raw corpus.
  */
object ShardWriter {

  /** The pre-write frame, exposed so its plan is pinnable: payload joined
    * to the (doc_id, shard, shard_pos) assignment, clustered so each task
    * holds whole shards in schedule order. */
  def sharded(payload: DataFrame, assignment: DataFrame,
              nshards: Int): DataFrame =
    payload.join(assignment.select("doc_id", "shard", "shard_pos"), "doc_id")
      .repartition(nshards, col("shard"))
      .sortWithinPartitions(col("shard"), col("shard_pos"))

  /** Write one epoch: `assignment` is (doc_id, shard, shard_pos) — q107's
    * output shape; `payload` is any doc_id-keyed relation whose columns
    * ride into the shard files. */
  def writeEpoch(payload: DataFrame, assignment: DataFrame, dir: String,
                 nshards: Int): Unit =
    sharded(payload, assignment, nshards)
      .write.mode(SaveMode.Overwrite).partitionBy("shard").parquet(dir)

  /** Read the shard store back; `shard` returns as a partition column, so
    * a per-shard read prunes to one directory. */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  private val layoutMemo =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(SparkSession, String)]()

  /** Battery-entry helper ([[VariantEventStore.layoutFor]]'s twin):
    * materialize the shard store for (`sfDir`, `assignmentId`, `nshards`)
    * once per session and return its path — q111 runs three bench passes
    * over one write. `assignmentId` names the assignment that produced
    * `assignment` (e.g. its epoch/salt, "epoch3"); it and `nshards` are
    * part of BOTH the memo key and the on-disk dir name, so a second
    * caller in the same JVM with a different epoch or shard count gets
    * its own store instead of silently reusing this one. The memo records
    * a write only AFTER it succeeds, so a failed first write is retried.
    * Single-threaded callers only (Verify/Bench run the battery
    * sequentially); a racing second session sharing the fixed /tmp root
    * could read a half-written dir. */
  def layoutFor(spark: SparkSession, sfDir: String, payload: DataFrame,
                assignment: DataFrame, nshards: Int,
                assignmentId: String): String = {
    val keyStr = s"$sfDir|$assignmentId|$nshards"
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(keyStr.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(4).map("%02x".format(_)).mkString
    val dir = "/tmp/graft-shard-store/" + digest + "_" +
      (s"${assignmentId}_s${nshards}_" + sfDir)
        .replaceAll("[^A-Za-z0-9._-]", "_")
    val key = (spark, keyStr)
    if (!layoutMemo.contains(key)) {
      writeEpoch(payload, assignment, dir, nshards)
      layoutMemo.add(key)
    }
    dir
  }
}
