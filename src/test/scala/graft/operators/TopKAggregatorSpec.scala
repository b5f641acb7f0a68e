package graft.operators

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKAggregatorSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("bounded top-k equals the window formulation on real data") {
    val dir = "/root/testdata/sf0.001"
    val viaAgg = graft.queries.RelationalQueries.topkViaAggregator(spark, dir)
      .as[(Long, Int, Long, Double)].collect().toSeq
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
    val viaWindow = Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
      .select($"o_custkey", $"rn", $"o_orderkey", $"o_totalprice")
      .orderBy($"o_custkey", $"rn")
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(viaAgg == viaWindow)
  }

  test("merge keeps only k and respects score-desc/id-asc ordering") {
    val agg = new TopKAggregator(2)
    val b = agg.merge(
      Seq(ScoredId(5.0, 9), ScoredId(3.0, 1)),
      Seq(ScoredId(5.0, 2), ScoredId(7.0, 4)))
    assert(b == Seq(ScoredId(7.0, 4), ScoredId(5.0, 2)))
  }
}
