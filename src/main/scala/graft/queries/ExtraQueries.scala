package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Coverage widening beyond the core battery: sliding windows (T6), pivot,
  * null-handling scalar functions, and the remaining window analytics. */
object ExtraQueries extends graft.QueryModule {
  import Determinism._
  type Q = (SparkSession, String) => DataFrame

  /** T6: sliding window (2-day length, 1-day slide) — every event lands in
    * two epoch-aligned windows. */
  def slidingWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy(window($"ts", "2 days", "1 day"), $"event_type")
      .agg(count(lit(1)).as("n"), dsum($"value").as("sum_value"))
      .select($"window.start".cast("date").as("window_day"), $"event_type",
        $"n", $"sum_value")
      .orderBy($"window_day", $"event_type")
  }

  /** Pivot: event_type columns per user decile — conditional aggregation
    * underneath, so the oracle expresses it portably. */
  def pivotCounts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .withColumn("user_decile", ($"user_id" % 10).cast("int"))
      .groupBy($"user_decile")
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .orderBy($"user_decile")
  }

  /** Null-handling scalar surface: nullif / coalesce / nvl2-style CASE. */
  def nullFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .select($"c_custkey",
        nullif($"c_mktsegment", lit("BUILDING")).as("seg_nb"),
        coalesce(nullif($"c_mktsegment", lit("BUILDING")), lit("(redacted)"))
          .as("seg_coalesced"),
        when($"c_acctbal" < 0, lit(null).cast("double")).otherwise($"c_acctbal")
          .as("bal_pos_or_null"),
        ($"c_acctbal".isNull || $"c_acctbal" < 0).as("is_missing_or_neg"))
      .orderBy($"c_custkey")
  }

  /** Window analytics beyond q8: lead, first/last value over explicit full
    * frames, dense_rank. */
  def windowExtras(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, dir)
      .filter($"o_custkey" % 10 === 0)
      .select($"o_custkey", $"o_orderkey",
        lead($"o_orderkey", 1).over(w).as("next_orderkey"),
        first($"o_orderkey").over(full).as("first_orderkey"),
        last($"o_orderkey").over(full).as("last_orderkey"),
        dense_rank().over(
          Window.partitionBy($"o_custkey").orderBy($"o_orderstatus", $"o_orderkey"))
          .as("status_rank"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  /** Distribution window functions (ntile / percent_rank / cume_dist) —
    * the one window family q8/q50 don't cover. */
  def windowDistribution(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice", $"o_orderkey")
    Tables.orders(s, dir)
      .filter($"o_custkey" % 20 === 0)
      .select($"o_orderpriority", $"o_orderkey",
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy($"o_orderpriority", $"o_orderkey")
  }

  /** The correlated-scalar-aggregate pattern decorrelated: customers above
    * their own segment's average balance. One window over the segment
    * partition replaces the per-row subquery (exact DECIMAL sum / count so
    * the average is partition-order-independent). */
  def aboveSegmentAvg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"c_mktsegment")
    Tables.customer(s, dir)
      .withColumn("seg_avg",
        (sum(dec($"c_acctbal")).over(w).cast("double") / count(lit(1)).over(w)))
      .filter($"c_acctbal" > $"seg_avg")
      .select($"c_custkey", $"c_mktsegment", $"c_acctbal", $"seg_avg")
      .orderBy($"c_custkey")
  }

  def queries: Map[String, Q] = Map(
    "q72_above_avg" -> aboveSegmentAvg,
    "q47_sliding_window" -> slidingWindow,
    "q48_pivot" -> pivotCounts,
    "q49_null_funcs" -> nullFuncs,
    "q50_window_extras" -> windowExtras,
    "q63_window_distribution" -> windowDistribution)

  def oracles: Map[String, String] = Map(
    "q47_sliding_window" ->
      """WITH slid AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS window_day, event_type, value FROM events
        |  UNION ALL
        |  SELECT CAST(date_trunc('day', ts) AS DATE) - 1 AS window_day, event_type, value FROM events
        |)
        |SELECT window_day, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM slid GROUP BY window_day, event_type
        |ORDER BY window_day, event_type""".stripMargin,
    "q48_pivot" ->
      """SELECT CAST(user_id % 10 AS INTEGER) AS user_decile,
        | count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        | count(CASE WHEN event_type = 'view' THEN 1 END) AS view,
        | count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        | count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        | count(CASE WHEN event_type = 'error' THEN 1 END) AS error
        |FROM events GROUP BY 1 ORDER BY user_decile""".stripMargin,
    "q49_null_funcs" ->
      """SELECT c_custkey,
        | nullif(c_mktsegment, 'BUILDING') AS seg_nb,
        | coalesce(nullif(c_mktsegment, 'BUILDING'), '(redacted)') AS seg_coalesced,
        | CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal_pos_or_null,
        | (c_acctbal IS NULL OR c_acctbal < 0) AS is_missing_or_neg
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q72_above_avg" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal, seg_avg FROM (
        |  SELECT c_custkey, c_mktsegment, c_acctbal,
        |    CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |      / count(*) OVER w AS seg_avg
        |  FROM customer
        |  WINDOW w AS (PARTITION BY c_mktsegment))
        |WHERE c_acctbal > seg_avg ORDER BY c_custkey""".stripMargin,
    "q63_window_distribution" ->
      """SELECT o_orderpriority, o_orderkey,
        | CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        | percent_rank() OVER w AS pct_rank,
        | cume_dist() OVER w AS cume
        |FROM orders WHERE o_custkey % 20 = 0
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,
    "q50_window_extras" ->
      """SELECT o_custkey, o_orderkey,
        | lead(o_orderkey, 1) OVER w AS next_orderkey,
        | first_value(o_orderkey) OVER wf AS first_orderkey,
        | last_value(o_orderkey) OVER wf AS last_orderkey,
        | CAST(dense_rank() OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderstatus, o_orderkey) AS INTEGER) AS status_rank
        |FROM orders WHERE o_custkey % 10 = 0
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin)
}
