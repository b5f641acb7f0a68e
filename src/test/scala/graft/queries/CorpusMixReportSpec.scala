package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** q98's invariants beyond the DuckDB hash check: the grouping-sets
  * report is internally additive (cells sum to their slices, slices to the
  * grand total) and the share column is exact at the anchors (the grand
  * total is floor(1.0 · 10⁶) = 10⁶ — sum/total of the SAME long is exactly
  * 1.0 in IEEE double, no wiggle). */
class CorpusMixReportSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  // row shape: (lang, source, gid, n_docs, sum_chars, share_ppm)
  private lazy val rows =
    TrainingDataQueries.corpusMixReport(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))

  test("grand total row is exact; no null keys escape") {
    val totals = rows.filter(_._3 == 3)
    assert(totals.length == 1)
    val t = totals.head
    assert(t._1 == "ALL" && t._2 == "ALL")
    assert(t._6 == 1000000L, s"grand-total share must be exactly 10^6: $t")
    assert(rows.forall(r => r._1 != null && r._2 != null))
  }

  test("cells are additive into slices and slices into the total") {
    val total = rows.find(_._3 == 3).get
    val cells = rows.filter(_._3 == 0)
    val langSlices = rows.filter(_._3 == 1)
    val srcSlices = rows.filter(_._3 == 2)
    assert(cells.nonEmpty && langSlices.length >= 2 && srcSlices.length >= 2)
    // per-lang slice == sum of its cells, for docs and chars
    langSlices.foreach { l =>
      val mine = cells.filter(_._1 == l._1)
      assert(mine.map(_._4).sum == l._4 && mine.map(_._5).sum == l._5, s"$l")
    }
    srcSlices.foreach { sl =>
      val mine = cells.filter(_._2 == sl._2)
      assert(mine.map(_._4).sum == sl._4 && mine.map(_._5).sum == sl._5, s"$sl")
    }
    assert(langSlices.map(_._4).sum == total._4)
    assert(srcSlices.map(_._5).sum == total._5)
    // shares are consistent: floor semantics means slice shares sum to
    // within |slices| ppm under the total
    val langShare = langSlices.map(_._6).sum
    assert(langShare <= 1000000L && langShare > 1000000L - langSlices.length - 1)
  }
}
