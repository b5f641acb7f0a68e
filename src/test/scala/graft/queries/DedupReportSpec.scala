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

  test("q102 geometry knob: tighter bands shed the candidate floor, genuine positives survive") {
    import spark.implicits._
    // planted-dup corpus: near-orthogonal bases (distinct axes) + 10 dups
    // at sim ≈ 1 — the similarity profile where tightening bits-per-band is
    // FREE (the battery corpus's spread-sim 0.35 positives are not; see
    // contrastivePairsOn's scaladoc for the tradeoff contract)
    val rnd = new scala.util.Random(7)
    def noisy(axis: Int, eps: Double): Array[Float] = {
      val a = Array.fill(64)((rnd.nextGaussian() * eps).toFloat)
      a(axis) = 1f; a
    }
    val base = (0 until 60).map(i => (i.toLong, noisy(i % 64, 1e-6)))
    val dups = (0 until 10).map(i => (100L + i, noisy(i, 1e-6)))
    val emb = (base ++ dups).toDF("vec_id", "embedding")
    def posOf(planes: Int, bw: Int) =
      LlmQueries.contrastivePairsOn(emb, planes, bw)
        .filter($"pair_type" === "positive")
        .select($"vec_a", $"vec_b").as[(Long, Long)].collect().toSet
    val expected = (0 until 10).map(i => (i.toLong, 100L + i)).toSet
    assert(posOf(16, 4) == expected, "loose geometry finds the planted dups")
    assert(posOf(32, 8) == expected,
      "tight geometry keeps every genuine positive — near-identical vectors collide in every band")
    // the candidate relation itself sheds its random-collision floor
    val candLoose = graft.operators.Similarity.lshScoredCandidates(emb, 16, 4).count()
    val candTight = graft.operators.Similarity.lshScoredCandidates(emb, 32, 8).count()
    assert(candTight * 5 < candLoose,
      s"4x8 must cut the candidate relation >5x: $candLoose -> $candTight")
  }

  test("q102: positives are exactly the near-dup set; negatives capped and banded") {
    val rows = LlmQueries.contrastivePairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val (pos, hn) = rows.partition(_._4 == "positive")
    assert(pos.nonEmpty && hn.nonEmpty)
    val dupPairs = SharedStages.nearDupPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pos.map(p => (p._1, p._2)).toSet == dupPairs,
      "positives must be q36's verified near-dup set, nothing else")
    assert(pos.forall(_._3 >= 350000L))
    assert(hn.forall(p => p._3 >= 150000L && p._3 < 350000L))
    // at most 4 negatives per anchor, and they are the HARDEST ones: every
    // kept negative's sim >= every dropped candidate's sim for that anchor
    val byAnchor = hn.groupBy(_._1)
    assert(byAnchor.values.forall(_.length <= 4))
    val allHnBand = SharedStages.scoredCandidates(spark, dir)
      .filter(org.apache.spark.sql.functions.col("sim_q").between(150000L, 349999L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    allHnBand.groupBy(_._1).foreach { case (a, cands) =>
      val kept = byAnchor.getOrElse(a, Array.empty)
      assert(kept.nonEmpty, s"anchor $a has band candidates but no mined negative")
      val minKept = kept.map(_._3).min
      val dropped = cands.filterNot(c => kept.exists(k => k._2 == c._2))
      assert(dropped.forall(_._3 <= minKept),
        s"anchor $a kept a softer negative than it dropped")
    }
  }
}
