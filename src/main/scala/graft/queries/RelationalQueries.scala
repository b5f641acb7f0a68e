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

  /** Multiway fact⋈fact⋈dim join (SURVEY §2.3 J3): customer⋈orders⋈lineitem
    * shuffle on their keys; nation/region are broadcast — no shuffle for the
    * dimension sides at any scale. */
  def joinMultiway(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), $"c_custkey" === $"o_custkey")
      .join(Tables.lineitem(s, dir), $"o_orderkey" === $"l_orderkey")
      .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, dir)), $"n_regionkey" === $"r_regionkey")
      .filter($"r_name" === "ASIA" &&
        $"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1998-01-01").cast("timestamp"))
      .groupBy($"n_name")
      .agg(
        sum(dec($"l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec($"l_discount")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"n_name")
  }

  /** Broadcast hash join with an explicitly-hinted dimension (J1 shape: the
    * credentials point-lookup generalized — small side always broadcast). */
  def joinBroadcastDim(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)), $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand")
      .agg(sum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_price"),
        count(lit(1)).as("n_items"))
      .orderBy($"p_brand")
  }

  /** Left-semi join (EXISTS): customers having orders. */
  def joinSemi(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), $"c_custkey" === $"o_custkey", "left_semi")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"), dsum($"c_acctbal").as("sum_bal"))
      .orderBy($"c_mktsegment")
  }

  /** Left-anti join (NOT EXISTS): customers with no recent orders — the
    * filter keeps the result non-degenerate at every SF. */
  def joinAnti(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val recent = Tables.orders(s, dir)
      .filter($"o_orderdate" >= lit("2000-01-01").cast("timestamp"))
    Tables.customer(s, dir)
      .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy($"c_mktsegment")
  }

  /** ROLLUP hierarchy totals (A4). NULLS FIRST pinned explicitly — Spark and
    * DuckDB default null ordering differs. */
  def rollupAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .rollup($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("total"))
      .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
  }

  /** CUBE over two dims (A4). */
  def cubeAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .cube($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"), sum($"l_quantity").as("sum_qty"))
      .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
  }

  /** Exact distinct aggregation (A4): two COUNT(DISTINCT) in one agg —
    * Catalyst plans expand + two-phase distinct aggregation. */
  def distinctAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("n_parts"),
        countDistinct($"l_suppkey").as("n_supps"),
        count(lit(1)).as("n"))
      .orderBy($"l_returnflag")
  }

  /** approx_count_distinct (HLL++) — values are engine-specific by nature, so
    * rows-only checked; ApproxDistinctSpec pins the error bound vs exact. */
  def approxDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_partkey").as("approx_parts"),
        countDistinct($"l_partkey").as("exact_parts"))
      .orderBy($"l_returnflag")
  }

  /** Per-group top-k via the typed bounded [[graft.operators.TopKAggregator]]
    * — shuffles O(groups·k) partial buffers instead of sorting whole
    * partitions like the q7 window formulation; result set is identical
    * (same oracle). */
  def topkViaAggregator(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.{ScoredId, TopKAggregator}
    Tables.orders(s, dir)
      .select($"o_custkey", $"o_totalprice", $"o_orderkey")
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapValues(t => ScoredId(t._2, t._3))
      .agg(new TopKAggregator(3).toColumn.name("topk"))
      .flatMap { case (ck, top) =>
        top.zipWithIndex.map { case (sc, i) => (ck, i + 1, sc.id, sc.score) }
      }
      .toDF("o_custkey", "rn", "o_orderkey", "o_totalprice")
      .orderBy($"o_custkey", $"rn")
  }

  /** q3 re-planned with eager aggregation: lineitem revenue pre-aggregates
    * per order BEFORE joining (a rewrite Catalyst does not apply itself),
    * shrinking the big shuffle from one row per lineitem to one per order —
    * the difference between shuffling 100 TB and 25 TB at the north-star
    * scale. The pre-aggregation itself is PREFILTERED by a semi-join
    * against the date-qualified order keys, so it rolls up one row per
    * QUALIFYING order, not per order in the whole table (an unfiltered
    * eager agg shuffles the full fact table and loses to the plain q3
    * plan it is meant to beat). The key set is broadcast here; at a scale
    * where the qualifying keys outgrow broadcast, the same shape comes
    * from a bloom runtime filter (the q76 machinery) or a shuffle semi-join
    * whose l_orderkey partitioning the downstream groupBy then reuses.
    * Result is identical to q3 (same oracle text). */
  def joinMultiwayPreAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val qualifyingKeys = Tables.orders(s, dir)
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1998-01-01").cast("timestamp"))
      .select($"o_orderkey".as("l_orderkey"))
    val revPerOrder = Tables.lineitem(s, dir)
      .join(broadcast(qualifyingKeys), Seq("l_orderkey"), "left_semi")
      .groupBy($"l_orderkey")
      .agg(
        sum(dec($"l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec($"l_discount")))
          .as("rev"),
        count(lit(1)).as("items"))
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), $"c_custkey" === $"o_custkey")
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1998-01-01").cast("timestamp"))
      .join(revPerOrder, $"o_orderkey" === $"l_orderkey")
      .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, dir)), $"n_regionkey" === $"r_regionkey")
      .filter($"r_name" === "ASIA")
      .groupBy($"n_name")
      .agg(sum($"rev").cast("double").as("revenue"),
        sum($"items").as("n_items"))
      .orderBy($"n_name")
  }

  /** GROUPING SETS (A4): per-status and per-priority marginals + grand total
    * in one pass (Catalyst Expand → single shuffle). */
  def groupingSetsAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupingSets(
        Seq(Seq($"o_orderstatus"), Seq($"o_orderpriority"), Seq()),
        $"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("total"))
      .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
  }

  /** UNION / INTERSECT / EXCEPT in one tagged result (U1). */
  def setOps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hv  = Tables.customer(s, dir).filter($"c_acctbal" > 7000).select($"c_custkey")
    val bld = Tables.customer(s, dir).filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    hv.union(bld).distinct().withColumn("branch", lit("union"))
      .union(hv.intersect(bld).withColumn("branch", lit("intersect")))
      .union(hv.except(bld).withColumn("branch", lit("except")))
      .orderBy($"branch", $"c_custkey")
  }

  /** Global sort + limit (O1): TakeOrderedAndProject — no full sort at scale. */
  def topNGlobal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(25)
  }

  def queries: Map[String, Q] = Map(
    "q1_pricing_summary" -> pricingSummary,
    "q2_filter_project" -> filterProject,
    "q3_join_multiway" -> joinMultiway,
    "q4_join_broadcast_dim" -> joinBroadcastDim,
    "q5_join_semi" -> joinSemi,
    "q6_join_anti" -> joinAnti,
    "q13_rollup" -> rollupAgg,
    "q14_cube" -> cubeAgg,
    "q15_distinct_agg" -> distinctAgg,
    "q16_setops" -> setOps,
    "q27_topn_global" -> topNGlobal,
    "q28_approx_distinct" -> approxDistinct,
    "q44_grouping_sets" -> groupingSetsAgg,
    "q46_topk_aggregator" -> topkViaAggregator,
    "q68_preagg_join" -> joinMultiwayPreAgg)

  /** DuckDB-side mirror of Determinism.dsum. */
  private def dsumSql(c: String) = s"CAST(sum(CAST($c AS DECIMAL(18,2))) AS DOUBLE)"

  def oracles: Map[String, String] = Map(
    "q3_join_multiway" ->
      s"""SELECT n_name,
         | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
         | count(*) AS n_items
         |FROM customer, orders, lineitem, nation, region
         |WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
         |  AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
         |  AND r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q68_preagg_join" ->
      s"""SELECT n_name,
         | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
         | count(*) AS n_items
         |FROM customer, orders, lineitem, nation, region
         |WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
         |  AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
         |  AND r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q4_join_broadcast_dim" ->
      s"""SELECT p_brand, sum(l_quantity) AS sum_qty,
         | ${dsumSql("l_extendedprice")} AS sum_price, count(*) AS n_items
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q5_join_semi" ->
      s"""SELECT c_mktsegment, count(*) AS n_customers, ${dsumSql("c_acctbal")} AS sum_bal
         |FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q6_join_anti" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q13_rollup" ->
      s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n, ${dsumSql("o_totalprice")} AS total
         |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
         |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q14_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n, sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q15_distinct_agg" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT l_suppkey) AS n_supps, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q16_setops" ->
      """WITH hv AS (SELECT c_custkey FROM customer WHERE c_acctbal > 7000),
        | bld AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |SELECT c_custkey, branch FROM (
        |  SELECT c_custkey, 'union' AS branch FROM (SELECT c_custkey FROM hv UNION SELECT c_custkey FROM bld)
        |  UNION ALL
        |  SELECT c_custkey, 'intersect' AS branch FROM (SELECT c_custkey FROM hv INTERSECT SELECT c_custkey FROM bld)
        |  UNION ALL
        |  SELECT c_custkey, 'except' AS branch FROM (SELECT c_custkey FROM hv EXCEPT SELECT c_custkey FROM bld)
        |) ORDER BY branch, c_custkey""".stripMargin,
    "q27_topn_global" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin,
    "q44_grouping_sets" ->
      s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n, ${dsumSql("o_totalprice")} AS total
         |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q46_topk_aggregator" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
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
