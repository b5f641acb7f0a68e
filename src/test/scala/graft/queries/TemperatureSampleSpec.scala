package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** q95's invariants beyond the DuckDB hash check: the downsample-only
  * temperature realization (the smallest language keeps EVERYTHING — its
  * rate is exactly 1.0, no float wiggle) and the α = 0.5 flattening
  * direction (the corpus's real en-heavy skew must shrink, never grow, and
  * no stratum is upsampled). */
class TemperatureSampleSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  // row shape: (doc_id, source, lang, n_in_lang, rate)
  private def stats() =
    TrainingDataQueries.temperatureSample(spark, dir).collect()
      .groupBy(_.getString(2)).map { case (lang, rs) =>
        (lang, rs.head.getLong(3), rs.length.toLong, rs.head.getDouble(4))
      }.toSeq.sortBy(_._2)

  test("smallest language keeps everything at rate exactly 1.0") {
    val s = stats()
    // rate = sqrt(n_min/n_min) = 1.0 bit-exactly; h16 < 65536 always
    assert(s.head._4 == 1.0, s"smallest stratum rate must be exactly 1: $s")
    assert(s.head._2 == s.head._3, s"the smallest language must be fully kept: $s")
  }

  test("flattening direction: bigger languages thinned harder, none upsampled") {
    val s = stats()
    assert(s.last._2 > s.head._2, "corpus must be skewed or the test is vacuous")
    // rates are monotone non-increasing in stratum size, all within (0, 1]
    s.sliding(2).foreach {
      case Seq((_, n1, _, r1), (_, n2, _, r2)) =>
        assert(r1 >= r2 || n1 == n2, s"rate must not grow with size: $s")
      case _ => ()
    }
    assert(s.forall { case (_, n, kept, r) => r > 0 && r <= 1.0 && kept <= n })
    // the admitted mix is flatter than the raw mix: the kept-count ratio
    // between the largest and smallest language shrinks vs the raw ratio
    val rawRatio = s.last._2.toDouble / s.head._2
    val keptRatio = s.last._3.toDouble / s.head._3
    assert(keptRatio < rawRatio, s"temperature must flatten the mix: $s")
  }
}
