package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** General relational surface (SURVEY.md §2.3-§2.6 EXT operators).
  *
  * Every query here is deterministic (stable ORDER BY, doubles rounded) so the
  * driver's DuckDB hash-compare is byte-stable. Aggregations are declarative
  * `groupBy().agg()` — Catalyst plans them partial+final (map-side combine)
  * which is the shape that survives a 100 TB scale-up; joins broadcast the
  * dimension side explicitly where the cardinality asymmetry is structural.
  */
object RelationalQueries extends graft.QueryModule {
  type Q = (SparkSession, String) => DataFrame

  import Determinism._

  /** TPC-H Q1-shaped pricing summary: scan → filter (pushed to parquet) →
    * partial+final hash agg on a low-cardinality key. At 100 TB the only
    * shuffle is the tiny post-combine agg exchange. */
  def pricingSummary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        sum(dec($"l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec($"l_discount")))
          .cast("double").as("sum_disc_price"),
        sum(dec($"l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec($"l_discount"))
          * (lit(1).cast("decimal(18,2)") + dec($"l_tax")))
          .cast("double").as("sum_charge"),
        (sum($"l_quantity") / count(lit(1))).as("avg_qty"),
        davg($"l_extendedprice").as("avg_price"),
        davg($"l_discount").as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** Projection + filter that must reach the parquet scan as PushedFilters +
    * a pruned ReadSchema. Per-row double arithmetic only (IEEE-deterministic,
    * no rounding — see Determinism). */
  def filterProject(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_quantity" > 45.0 && $"l_discount" >= 0.05)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity",
        ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("net_price"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  def queries: Map[String, Q] = Map(
    "q1_pricing_summary" -> pricingSummary,
    "q2_filter_project" -> filterProject)

  def oracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | sum(l_quantity) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
        | sum(l_quantity) / count(*) AS avg_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(l_extendedprice) AS avg_price,
        | CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(l_discount) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        | l_extendedprice*(1.0-l_discount) AS net_price
        |FROM lineitem WHERE l_quantity > 45.0 AND l_discount >= 0.05
        |ORDER BY l_orderkey, l_linenumber""".stripMargin)
}
