package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val fact = Seq((1L, 5.0), (2L, 10.0), (3L, 99.9), (4L, 100.0))
    .toDF("id", "v")
  private val bands = Seq((1, 0.0, 10.0), (2, 10.0, 100.0), (3, 100.0, 1000.0))
    .toDF("band_id", "lo", "hi")

  test("assigns each value to its half-open [lo, hi) band") {
    val out = RangeJoin.bands(fact, bands, "v")
      .select($"id", $"band_id").as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 1, 2L -> 2, 3L -> 2, 4L -> 3))
  }

  test("plan broadcasts the bands side (fact side unshuffled)") {
    val plan = RangeJoin.bands(fact, bands, "v").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"bands dim must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"))
  }
}
