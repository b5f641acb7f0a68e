package graft

import org.scalatest.funsuite.AnyFunSuite

/** The engine's SQL front door: the same ANSI text the DuckDB oracle runs
  * also parses and executes on Spark over temp views, and agrees with the
  * DataFrame-API formulation — a user can drive every covered operator from
  * `spark.sql` without touching the Scala API. */
class SqlSurfaceSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  private def withViews[A](body: => A): A = {
    // events goes through its loader (ns→µs normalization); a raw parquet
    // read of it fails schema inference outright
    Tables.all.filterNot(_ == "events")
      .foreach(t => Tables.load(spark, dir, t).createOrReplaceTempView(t))
    Tables.events(spark, dir).createOrReplaceTempView("events")
    try body
    finally Tables.all.foreach(t => spark.catalog.dropTempView(t))
  }

  private def sqlAgreesWithDataFrame(name: String): Unit = withViews {
    val fromSql = spark.sql(SparkEntry.oracleSql(name))
    val fromApi = SparkEntry.queries(name)(spark, dir)
    assert(fromSql.exceptAll(fromApi).isEmpty && fromApi.exceptAll(fromSql).isEmpty,
      s"$name: SQL and DataFrame results differ")
    assert(fromApi.count() > 0)
  }

  test("aggregation SQL (q1 pricing summary) matches the DataFrame plan") {
    sqlAgreesWithDataFrame("q1_pricing_summary")
  }

  test("EXISTS semi-join SQL (q5) matches the DataFrame plan") {
    sqlAgreesWithDataFrame("q5_join_semi")
  }

  test("ROLLUP SQL (q13) matches the DataFrame plan") {
    sqlAgreesWithDataFrame("q13_rollup")
  }

  test("window SQL (q46 top-k per group) matches the typed aggregator") {
    sqlAgreesWithDataFrame("q46_topk_aggregator")
  }
}
