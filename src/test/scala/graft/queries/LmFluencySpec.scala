package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** q99's invariants beyond the DuckDB hash check: a plain-JVM replay of the
  * whole fit-then-score path (model counts, add-one smoothing, ppm
  * quantization, integer mean) matches every row exactly, and the model /
  * threshold behave like a fluency filter should — reference-slice docs
  * score higher on average than the corpus floor, and the flag binds
  * without flagging everything. */
class LmFluencySpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  private lazy val result =
    TrainingDataQueries.lmFluencyScore(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))

  private lazy val raw = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select($"doc_id", $"lang", $"source", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
  }

  test("plain-JVM replay of fit + score matches every row exactly") {
    val V = 27
    val counts = scala.collection.mutable.Map.empty[String, Long]
    raw.filter(_._3 == "src0").foreach { case (_, _, _, t) =>
      (0 until t.length - 1).foreach { i =>
        val bg = t.substring(i, i + 2)
        counts(bg) = counts.getOrElse(bg, 0L) + 1
      }
    }
    val ctx = counts.groupMapReduce(_._1.substring(0, 1))(_._2)(_ + _)
    def qp(bg: String): Long = counts.get(bg) match {
      case Some(c) => math.floor(1000000.0 * (c + 1) / (ctx(bg.substring(0, 1)) + V)).toLong
      case None => ctx.get(bg.substring(0, 1)) match {
        case Some(t) => math.floor(1000000.0 * 1 / (t + V)).toLong
        case None => math.floor(1000000.0 / V).toLong
      }
    }
    val expect = raw.filter(_._4.length >= 2).map { case (id, lang, _, t) =>
      val s = (0 until t.length - 1).map(i => qp(t.substring(i, i + 2))).sum
      val n = (t.length - 1).toLong
      val f = s / n
      (id, lang, n, f, f < 210000L)
    }.sortBy(_._1)
    assert(result.toSeq == expect.toSeq)
  }

  test("the filter discriminates and the threshold binds") {
    val flagged = result.filter(_._5)
    assert(flagged.nonEmpty, "at least one disfluent doc at sf0.001")
    assert(flagged.length < result.length / 10, "the gate must not flag the bulk")
    // the reference slice itself scores above the flagged tail on average
    val srcOf = raw.map(r => r._1 -> r._3).toMap
    val refScores = result.filter(r => srcOf(r._1) == "src0").map(_._4)
    assert(refScores.nonEmpty)
    val refMean = refScores.sum / refScores.length
    val flaggedMax = flagged.map(_._4).max
    assert(refMean > flaggedMax,
      s"reference mean $refMean must clear the flagged tail $flaggedMax")
  }
}
