package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function surface (SURVEY §2.5 W1/W2): ranking, analytic lag/lead,
  * running frames, last-image compaction, sessionization.
  *
  * Every window partitions by a key (user_id / custkey) — at scale that is
  * one hash shuffle per window spec and no global sort. Ties are always
  * broken by a unique column so results are order-deterministic.
  */
object WindowQueries extends graft.QueryModule {
  import Determinism._
  type Q = (SparkSession, String) => DataFrame

  /** W2: top-3 orders per customer by totalprice (rank + filter). */
  def topkPerGroup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"rn", $"o_orderkey", $"o_totalprice")
      .orderBy($"o_custkey", $"rn")
  }

  /** W1: row_number + lag + running sum over an explicit ROWS frame. */
  def runningAnalytics(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(s, dir)
      .select($"user_id", $"event_id",
        row_number().over(w).as("rn"),
        lag($"value", 1).over(w).as("prev_value"),
        sum(dec($"value")).over(w.rowsBetween(Window.unboundedPreceding, 0))
          .cast("double").as("running_value"))
      .orderBy($"user_id", $"event_id")
  }

  /** CDC "last image" compaction — the W2 pattern that turns a change feed
    * into current state: latest event per user. */
  def lastImage(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_id", $"event_type", $"value")
      .orderBy($"user_id")
  }

  /** Sessionization (gaps-and-islands, 30-min inactivity gap) — the batch
    * analog of T6 session windows, done with lag + running sum so DuckDB can
    * replay it exactly. Gap compare in integral microseconds (both engines
    * truncate the ns source to µs identically). */
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(s, dir)
      .withColumn("prev_us", lag(unix_micros($"ts"), 1).over(w))
      .withColumn("new_sess",
        when($"prev_us".isNull ||
          (unix_micros($"ts") - $"prev_us") > lit(1800L * 1000000L), 1L).otherwise(0L))
      .withColumn("session_id",
        sum($"new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"),
        min($"event_id").as("first_event"),
        max($"event_id").as("last_event"),
        dsum($"value").as("sum_value"))
      .orderBy($"user_id", $"session_id")
  }

  def queries: Map[String, Q] = Map(
    "q7_topk_per_group" -> topkPerGroup,
    "q8_running_analytics" -> runningAnalytics,
    "q9_last_image" -> lastImage,
    "q22_sessionize" -> sessionize)

  def oracles: Map[String, String] = Map(
    "q7_topk_per_group" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q8_running_analytics" ->
      """SELECT user_id, event_id,
        | CAST(row_number() OVER w AS INTEGER) AS rn,
        | lag(value, 1) OVER w AS prev_value,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin,
    "q9_last_image" ->
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT user_id, event_id, event_type, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q22_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, value, ts,
        |    CASE WHEN lag(epoch_us(ts), 1) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts), 1) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sess AS (
        |  SELECT user_id, event_id, value,
        |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(event_id) AS first_event, max(event_id) AS last_event,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin)
}
