package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY §7.4 note 8).
  *
  * A hash join shuffles both sides on the key, so one hot key (the
  * "celebrity user" in an events feed) lands an entire partition on one
  * task and the stage runs at the speed of that straggler. Salting widens
  * the join key: the big side adds a deterministic salt in [0, buckets)
  * derived from one of its own columns, the small side is replicated once
  * per salt value, and the join runs on (key, salt) — the hot key now
  * spreads over `buckets` tasks at the cost of replicating the small side
  * ×buckets (keep it the dimension side).
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`) does
  * this adaptively for sort-merge joins at runtime; this operator is the
  * explicit form for when the skew is known ahead of time or the join
  * shape falls outside AQE's reach.
  */
object SkewJoin {

  /** Inner equi-join on `key`, salted `buckets`-ways. `saltFrom` must be a
    * deterministic big-side column (e.g. its primary key) — NOT rand(),
    * which would re-roll per retry and break task re-execution. A null
    * `saltFrom` value salts to bucket 0 (pmod of null is null, which would
    * otherwise silently drop a row the plain join keeps). */
  def salted(big: DataFrame, small: DataFrame, key: String,
             saltFrom: Column, buckets: Int): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    val l = big.withColumn("__salt",
      coalesce(pmod(saltFrom, lit(buckets)).cast("int"), lit(0)))
    val r = small.withColumn("__salt", explode(lit((0 until buckets).toArray)))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
