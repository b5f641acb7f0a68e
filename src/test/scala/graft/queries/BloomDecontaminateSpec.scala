package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** q76 (bloom-prefiltered decontamination) must be output-identical to q59
  * (exact) — false positives die in the exact overlap join — while its plan
  * carries the scan-side Bloom prefilter. */
class BloomDecontaminateSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  test("bloom-prefiltered result equals the exact decontamination") {
    val exact = TrainingDataQueries.decontaminate(spark, dir).collect().toSeq
    val bloom = TrainingDataQueries.bloomDecontaminate(spark, dir).collect().toSeq
    assert(bloom == exact)
    assert(exact.nonEmpty)
  }

  test("plan carries the literal Bloom prefilter below the overlap join") {
    val p = TrainingDataQueries.bloomDecontaminate(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("might_contain"), p)
  }
}
