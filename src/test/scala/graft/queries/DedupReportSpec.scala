package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** q100/q101's invariants beyond the DuckDB hash check: the leakage audit's
  * cluster strategy is all-diagonal while the per-document strategy leaks
  * on the same corpus, and the savings report's masses are internally
  * consistent with the corpus. */
class DedupReportSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  test("q100: cluster split has zero off-diagonal cells; per-doc split leaks") {
    val rows = LlmQueries.splitLeakageAudit(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    val (cluster, perDoc) = rows.partition(_._1 == "cluster")
    assert(cluster.nonEmpty && perDoc.nonEmpty)
    assert(cluster.forall { case (_, a, b, _) => a == b },
      s"cluster strategy must never split a pair: ${cluster.toSeq}")
    assert(perDoc.exists { case (_, a, b, n) => a != b && n > 0 },
      "the per-doc strategy must show leakage on this corpus")
    // both strategies tag the same pair population
    assert(cluster.map(_._4).sum == perDoc.map(_._4).sum)
  }

  test("q101: masses are consistent and savings bind") {
    val rows = LlmQueries.dedupSavings(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.length >= 2)
    rows.foreach { case (lang, nDocs, nKept, total, kept, ppm) =>
      assert(nKept <= nDocs && kept <= total, s"$lang")
      assert(ppm >= 0 && ppm < 1000000L, s"$lang")
    }
    assert(rows.exists(r => r._3 < r._2),
      "at least one language must actually save docs (corpus has dups)")
    // per-lang doc totals cover the whole corpus exactly
    val corpus = graft.Tables.documents(spark, dir).count()
    assert(rows.map(_._2).sum == corpus)
  }
}
