package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** q62's sketch quantiles vs q61's exact order statistics: with accuracy
  * 10000 the rank error is ≤ n/10000, so on this data the approximate
  * values must land within a tight relative band of the exact ones. */
class ApproxQuantileSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("percentile_approx tracks exact p50/p90 per group") {
    val dir = "/root/testdata/sf0.01"
    val exact = TrainingDataQueries.percentiles(spark, dir)
      .select($"l_returnflag", $"p50", $"p90")
      .as[(String, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val approx = TrainingDataQueries.approxQuantiles(spark, dir)
      .select($"l_returnflag", $"approx_p50", $"approx_p90")
      .as[(String, Double, Double)].collect()
    assert(approx.nonEmpty && approx.length == exact.size)
    approx.foreach { case (flag, a50, a90) =>
      val (e50, e90) = exact(flag)
      assert(math.abs(a50 - e50) / e50 < 0.01, s"$flag p50: $a50 vs $e50")
      assert(math.abs(a90 - e90) / e90 < 0.01, s"$flag p90: $a90 vs $e90")
    }
  }
}
