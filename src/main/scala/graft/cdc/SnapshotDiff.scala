package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch CDC derivation: diff two snapshots of a table into INSERT / UPDATE /
  * DELETE change rows (SURVEY.md §2.3 J2 — the batch analog of the
  * reference's per-row trigger capture, `cdc_webhook--1.0.sql:266-277`).
  *
  * Shape: `old FULL OUTER JOIN new ON pk` → op classification → unchanged
  * rows dropped. Output schema: pk columns + `op` + `old`/`new` whole-row
  * structs (op-shaped nulls per the reference envelope: INSERT→old NULL,
  * DELETE→new NULL).
  *
  * Scale: this is a single co-partitioned shuffle on the primary key — at
  * 100 TB both sides hash-partition on pk and the join is a sort-merge with
  * no data-dependent skew (pk is unique on each side). If one snapshot is
  * small (dimension reload) Catalyst/AQE picks a broadcast join on its own.
  */
object SnapshotDiff {

  /** Null-safe "any of these columns differs" predicate — the reference's
    * OR-folded `NEW.c IS DISTINCT FROM OLD.c` checks
    * (`cdc_webhook--1.0.sql:204-212`). Spark's `<=>` is null-safe equality. */
  def anyColumnChanged(oldSide: String, newSide: String, cols: Seq[String]): Column =
    cols.map(c => !(col(s"$oldSide.$c") <=> col(s"$newSide.$c")))
      .reduceOption(_ || _)
      .getOrElse(lit(false))

  /** Diff `oldDf` → `newDf` keyed by `pk`. Both frames must share a schema. */
  def diff(oldDf: DataFrame, newDf: DataFrame, pk: Seq[String]): DataFrame = {
    val dataCols = oldDf.columns.filterNot(pk.contains).toSeq
    require(newDf.columns.sorted.sameElements(oldDf.columns.sorted),
      "snapshot schemas differ")

    // Whole-row images as structs, pk kept flat for the join + output key.
    val o = oldDf.select(pk.map(col) :+ struct(oldDf.columns.map(col): _*).as("old"): _*)
    val n = newDf.select(pk.map(col) :+ struct(newDf.columns.map(col): _*).as("new"): _*)

    val joined = o.join(n, pk, "full_outer")
    val op = when(col("old").isNull, "INSERT")
      .when(col("new").isNull, "DELETE")
      .otherwise("UPDATE")

    joined
      .withColumn("op", op)
      // drop no-op updates: whole-row null-safe equality on the data columns
      .filter(col("op") =!= "UPDATE" || anyColumnChanged("old", "new", dataCols))
  }
}
