package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines (SURVEY §2.9 EXT).
  *
  * `sample()`/`rand()` are seed- and partitioning-dependent — rerunning the
  * pipeline (or re-partitioning the input) changes which rows survive,
  * which is unacceptable for reproducible dataset builds. Hash sampling
  * decides per row from a content hash of the row's id: stable across
  * runs, engines, partitionings, and cluster sizes, and embarrassingly
  * parallel (a pure per-row filter, pushed into the scan — no shuffle, no
  * shared RNG state).
  */
object Sampling {

  /** First 16 bits of md5(id) as an int in [0, 65536). */
  def hash16(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 4), 16, 10).cast("int")

  /** Stratified hash sample: keep a row iff hash16(id) < rate(stratum)·2¹⁶.
    * Per-stratum rates downweight overrepresented strata (the classic
    * data-mixing knob: e.g. sample `en` at 0.5 but keep all of `fr`). */
  def stratified(df: DataFrame, idCol: String, stratumCol: String,
                 rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    df.withColumn("h16", hash16(col(idCol)))
      .filter(col("h16") < rate * lit(65536.0))
  }
}
