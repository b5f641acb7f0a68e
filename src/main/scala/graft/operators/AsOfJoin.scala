package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, attach the latest right row whose
  * timestamp is `<=` the left row's timestamp, per key.
  *
  * The CDC shape this serves (SURVEY §2.3): enrich every change event with
  * the version of a slowly-changing dimension (credentials/config snapshot,
  * prior event of another type) that was current when the event fired —
  * the temporal generalization of the reference's fire-time credentials
  * point-lookup (`/root/reference/cdc_webhook--1.0.sql:242-248`, which reads
  * "the row as of now").
  *
  * Implementation is union + running `last(ignoreNulls)` window, NOT a
  * non-equi join: both inputs are tagged, unioned, hash-partitioned by key
  * and sorted by (ts, side); a running last-right-payload then lands the
  * match on every left row in one pass. Cost at any scale is ONE shuffle of
  * |L|+|R| rows and a per-partition sort — there is no |L|×|R| candidate
  * blow-up and no range-condition nested loop, so the plan survives a 100×
  * scale-up unchanged (this is how Flink/KDB-style as-of joins are done on
  * shuffle engines).
  *
  * Right rows sort before left rows at equal timestamps (side 0 < 1), which
  * yields the inclusive `rightTs <= leftTs` bound. If several right rows
  * share (key, ts) the winner among them is order-nondeterministic — dedupe
  * the right side on (key, ts) first (e.g. keep the max id) when that can
  * occur.
  */
object AsOfJoin {

  /** @param matchedCol name of the output struct column holding the matched
    *                   right row's payload (null when no right row precedes);
    *                   payload = all right columns except `keyCol`/`rightTs`. */
  def backward(left: DataFrame, right: DataFrame, keyCol: String,
               leftTs: String, rightTs: String,
               matchedCol: String = "matched"): DataFrame = {
    val lCols = left.columns.toSeq
    val rPayload = right.columns.toSeq.filterNot(c => c == keyCol || c == rightTs)
    require(rPayload.nonEmpty, "right side needs at least one payload column")

    val lStruct = struct(lCols.map(col): _*)
    val rStruct = struct(rPayload.map(col): _*)
    val lType = left.select(lStruct.as("s")).schema("s").dataType
    val rType = right.select(rStruct.as("s")).schema("s").dataType

    val leftU = left.select(
      col(keyCol).as("__k"), col(leftTs).as("__ts"), lit(1).as("__side"),
      lStruct.as("__l"), lit(null).cast(rType).as("__r"))
    val rightU = right.select(
      col(keyCol).as("__k"), col(rightTs).as("__ts"), lit(0).as("__side"),
      lit(null).cast(lType).as("__l"), rStruct.as("__r"))

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    leftU.unionByName(rightU)
      .withColumn(matchedCol, last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(lCols.map(c => col(s"__l.$c")) :+ col(matchedCol): _*)
  }
}
