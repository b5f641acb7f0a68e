package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function surface (SURVEY §2.6): string, date, math, array battery,
  * ordered string aggregation (A1), and the retry-backoff schedule (F12).
  *
  * Only cross-engine-deterministic functions appear in oracle-checked output:
  * sqrt is IEEE-correctly-rounded (safe); ln/exp/pow of arbitrary doubles are
  * libm-dependent and excluded. floor/ceil results are cast to double
  * explicitly because Spark returns LONG where DuckDB returns DOUBLE.
  */
object FunctionQueries extends graft.QueryModule {
  import Determinism._
  type Q = (SparkSession, String) => DataFrame

  /** String functions F6/F7-analog battery over part. */
  def stringFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.part(s, dir)
      .filter($"p_partkey" % 3 === 0)
      .select($"p_partkey",
        lower($"p_type").as("type_lower"),
        upper($"p_name").as("name_upper"),
        substring($"p_name", 1, 5).as("name_pfx"),
        length($"p_name").as("name_len"),
        concat_ws("-", $"p_brand", $"p_type").as("brand_type"),
        regexp_replace($"p_name", "[aeiou]", "").as("name_novowel"),
        lpad($"p_size".cast("string"), 4, "0").as("size_pad"),
        trim(lit("  pad  ")).as("trimmed"))
      .filter($"p_name".like("%bolt%"))
      .orderBy($"p_partkey")
  }

  /** Date/time functions (F2-analog surface + F16). */
  def dateFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .filter($"o_orderkey" % 50 === 0)
      .select($"o_orderkey",
        year($"o_orderdate").as("yr"),
        quarter($"o_orderdate").as("qtr"),
        month($"o_orderdate").as("mo"),
        dayofmonth($"o_orderdate").as("dom"),
        date_trunc("month", $"o_orderdate").cast("date").as("month_start"),
        datediff(lit("2002-01-01").cast("date"), $"o_orderdate".cast("date")).as("days_to_ref"))
      .orderBy($"o_orderkey")
  }

  /** Per-month order aggregation — date_trunc as a grouping key. */
  def monthlyOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy(year($"o_orderdate").as("yr"), month($"o_orderdate").as("mo"))
      .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("total"))
      .orderBy($"yr", $"mo")
  }

  /** Math battery (deterministic subset only). */
  def mathFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.supplier(s, dir)
      .select($"s_suppkey",
        abs($"s_acctbal").as("abs_bal"),
        floor($"s_acctbal").cast("double").as("floor_bal"),
        ceil($"s_acctbal").cast("double").as("ceil_bal"),
        sqrt(abs($"s_acctbal")).as("sqrt_bal"),
        signum($"s_acctbal").cast("int").as("sign_bal"),
        ($"s_suppkey" % 7).as("mod7"),
        greatest($"s_acctbal", lit(0.0)).as("pos_bal"),
        least($"s_acctbal", lit(0.0)).as("neg_bal"))
      .orderBy($"s_suppkey")
  }

  /** Array functions (F8/F9 analog surface) over the embedding vectors. */
  def arrayFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, dir)
      .filter($"vec_id" % 25 === 0)
      .select($"vec_id",
        size($"embedding").as("dim"),
        element_at($"embedding", 1).as("first_val"),
        array_min($"embedding").as("min_val"),
        array_max($"embedding").as("max_val"))
      .orderBy($"vec_id")
  }

  /** A1: ordered string aggregation (the reference's string_agg codegen step,
    * `cdc_webhook--1.0.sql:204-212`) — nations per region, comma-joined in
    * sorted order. */
  def stringAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir)), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name")
      .agg(concat_ws(",", array_sort(collect_list($"n_name"))).as("nations"),
        count(lit(1)).as("n_nations"))
      .orderBy($"r_name")
  }

  /** F12: retry-backoff schedule — LINEAR constant vs EXPONENTIAL
    * interval*2^n (reference delay calc `src/cdc_webhook.c:103-109`),
    * interval=2s, attempts 0..5. */
  def backoffSchedule(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val strategies = Seq("LINEAR", "EXPONENTIAL").toDF("strategy")
    val attempts = s.range(0, 6).select($"id".as("attempt"))
    strategies.crossJoin(attempts)
      .select($"strategy", $"attempt",
        when($"strategy" === "LINEAR", lit(2L))
          .otherwise((lit(2.0) * pow(lit(2.0), $"attempt")).cast("long")).as("delay_s"))
      .orderBy($"strategy", $"attempt")
  }

  def queries: Map[String, Q] = Map(
    "q17_string_funcs" -> stringFuncs,
    "q18_date_funcs" -> dateFuncs,
    "q19_math_funcs" -> mathFuncs,
    "q24_backoff_schedule" -> backoffSchedule,
    "q25_array_funcs" -> arrayFuncs,
    "q26_string_agg" -> stringAgg,
    "q29_monthly_orders" -> monthlyOrders)

  def oracles: Map[String, String] = Map(
    "q17_string_funcs" ->
      """SELECT p_partkey, lower(p_type) AS type_lower, upper(p_name) AS name_upper,
        | substring(p_name, 1, 5) AS name_pfx, CAST(length(p_name) AS INTEGER) AS name_len,
        | concat_ws('-', p_brand, p_type) AS brand_type,
        | regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel,
        | lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
        | trim('  pad  ') AS trimmed
        |FROM part WHERE p_partkey % 3 = 0 AND p_name LIKE '%bolt%'
        |ORDER BY p_partkey""".stripMargin,
    "q18_date_funcs" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS yr, CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
        | CAST(month(o_orderdate) AS INTEGER) AS mo, CAST(dayofmonth(o_orderdate) AS INTEGER) AS dom,
        | CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        | CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INTEGER) AS days_to_ref
        |FROM orders WHERE o_orderkey % 50 = 0 ORDER BY o_orderkey""".stripMargin,
    "q19_math_funcs" ->
      """SELECT s_suppkey, abs(s_acctbal) AS abs_bal,
        | floor(s_acctbal) AS floor_bal, ceil(s_acctbal) AS ceil_bal,
        | sqrt(abs(s_acctbal)) AS sqrt_bal,
        | CAST(sign(s_acctbal) AS INTEGER) AS sign_bal,
        | s_suppkey % 7 AS mod7,
        | greatest(s_acctbal, 0.0) AS pos_bal, least(s_acctbal, 0.0) AS neg_bal
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "q24_backoff_schedule" ->
      """SELECT s.strategy, g.attempt,
        | CASE WHEN s.strategy = 'LINEAR' THEN CAST(2 AS BIGINT)
        |      ELSE (CAST(2 AS BIGINT) << g.attempt) END AS delay_s
        |FROM (SELECT 'LINEAR' AS strategy UNION ALL SELECT 'EXPONENTIAL') s
        |CROSS JOIN (SELECT unnest(range(0, 6)) AS attempt) g
        |ORDER BY s.strategy, g.attempt""".stripMargin,
    "q25_array_funcs" ->
      """SELECT vec_id, CAST(len(embedding) AS INTEGER) AS dim,
        | embedding[1] AS first_val,
        | list_min(embedding) AS min_val, list_max(embedding) AS max_val
        |FROM embeddings WHERE vec_id % 25 = 0 ORDER BY vec_id""".stripMargin,
    "q26_string_agg" ->
      """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations,
        | count(*) AS n_nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q29_monthly_orders" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS yr, CAST(month(o_orderdate) AS INTEGER) AS mo, count(*) AS n,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
