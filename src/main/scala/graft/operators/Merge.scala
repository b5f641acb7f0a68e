package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch MERGE / CDC-apply operators.
  *
  * The reference's only write-side merge is the credentials upsert
  * `INSERT … ON CONFLICT (schema,table,name) DO UPDATE`
  * (`/root/reference/cdc_webhook--1.0.sql:188-194`, SURVEY §2.1 S5). Spark
  * has no unique-key constraints, so the merge is an explicit plan:
  * anti-join the target against the source keys, then union the source —
  * the plain-Parquet equivalent of a Delta `MERGE WHEN MATCHED THEN UPDATE
  * WHEN NOT MATCHED THEN INSERT`.
  *
  * Scale shape: one shuffle of target+source on the key (or zero for the
  * target if the source is small enough to broadcast the anti-join — e.g.
  * the credentials dimension); `applyChanges` adds one window over the
  * change batch, partitioned by the same key, so the whole CDC-apply is
  * key-partitioned end-to-end and never materializes a cross product.
  */
object Merge {

  /** SCD-1 upsert: source rows replace target rows sharing their key;
    * source rows with new keys are inserted. Schemas must match. */
  def upsert(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame = {
    require(target.columns.sorted.sameElements(source.columns.sorted),
      s"upsert requires identical schemas, got ${target.columns.toSeq} vs ${source.columns.toSeq}")
    target.join(source.select(keys.map(col): _*).distinct(), keys, "left_anti")
      .unionByName(source)
  }

  /** Apply a CDC change batch to a snapshot: per key, keep only the latest
    * change (by `tsCol`, ties broken by `opCol` descending so UPDATE beats
    * INSERT at the same instant), then delete keys whose last op is DELETE
    * and upsert the last row image for the rest.
    *
    * `changes` must carry `keys`, `tsCol`, `opCol` ∈ {INSERT,UPDATE,DELETE},
    * and the snapshot's payload columns (the "new" row image — null for
    * DELETE, matching the reference envelope `event.data.new`,
    * `/root/reference/cdc_webhook--1.0.sql:274-277`). */
  def applyChanges(snapshot: DataFrame, changes: DataFrame, keys: Seq[String],
                   tsCol: String, opCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).desc, col(opCol).desc)
    val lastChange = changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val survivors = snapshot.join(
      lastChange.select(keys.map(col): _*).distinct(), keys, "left_anti")
    val upserts = lastChange
      .filter(col(opCol) =!= "DELETE")
      .select(snapshot.columns.map(col).toSeq: _*)
    survivors.unionByName(upserts)
  }
}
