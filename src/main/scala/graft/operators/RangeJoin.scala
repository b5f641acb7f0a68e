package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (band) join: match fact rows to the dimension interval containing
  * their value. The reference has no range joins (SURVEY §2.3 "not in
  * reference") — this is EXT surface for the analytics tier.
  *
  * Scale shape: the bands side is structurally tiny (a banding scheme, a
  * rate card, a set of SLA windows), so the join is a broadcast
  * nested-loop with a range predicate — the fact side streams through
  * map-side with NO shuffle at any scale, and each fact row tests a
  * handful of in-memory intervals inside whole-stage codegen. A fact⋈fact
  * range join would instead need interval bucketing (bin both sides to
  * overlapping buckets, equi-join the bucket, re-filter) — not needed for
  * any query in this engine, so deliberately not built.
  */
object RangeJoin {

  /** Inner band join on `lo <= value < hi`. */
  def bands(fact: DataFrame, bandsDim: DataFrame, valueCol: String,
            loCol: String = "lo", hiCol: String = "hi"): DataFrame =
    fact.join(broadcast(bandsDim),
      col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
}
