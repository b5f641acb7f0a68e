package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The skew story has two halves: explicit salting (SkewJoinSpec) for known
  * hot keys, and AQE's runtime skew-join splitting for everything else.
  * This spec proves the AQE half actually engages: a 90%-hot-key join,
  * forced to sort-merge, must execute with the skewed partition split
  * (`skew=true` in the adaptive plan) and still produce exact results. */
class AqeSkewSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("AQE splits the hot partition of a skewed sort-merge join") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")

      // 200k rows, 90% on one key — one shuffle partition dwarfs the rest
      val big = spark.range(0, 200000)
        .select((when($"id" % 10 < 9, 0L).otherwise($"id")).as("k"), $"id".as("v"))
      val dim = spark.range(0, 1000).select($"id".as("k"), ($"id" * 2).as("w"))
      val joined = big.join(dim, "k")
      // collect() drives THIS QueryExecution, so the final adaptive plan
      // (post skew-split) is inspectable on it afterwards
      val n = joined.collect().length.toLong
      val expected = big.as[(Long, Long)].collect()
        .count { case (k, _) => k == 0L || k < 1000L }
      assert(n == expected)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("AdaptiveSparkPlan isFinalPlan=true"), plan.take(500))
      assert(plan.contains("skew=true"),
        s"AQE should have split the hot partition:\n${plan.take(3000)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
