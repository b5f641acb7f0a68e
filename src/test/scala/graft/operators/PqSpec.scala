package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Product quantization: training converges (k-means objective
  * non-increasing and below the seed), codes are well-formed and 32×
  * smaller, and ADC retrieval's recall against brute force is measured —
  * the explicit compression/recall trade every PQ deployment signs. */
class PqSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private lazy val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("training: quantization MSE non-increasing per iteration, below the seed") {
    val objs = (0 to 3).map { it =>
      ProductQuantizer.quantizationMse(emb,
        ProductQuantizer.train(emb, m = 8, ksub = 16, iters = it))
    }
    objs.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9, s"MSE increased: $objs")
    }
    assert(objs.last < objs.head, s"training must improve on the seed: $objs")
  }

  test("encode: m codes per vector, each in [0, ksub); map-side plan (no exchange)") {
    val cb = ProductQuantizer.train(emb, m = 8, ksub = 16, iters = 2)
    val codes = ProductQuantizer.encode(emb, cb)
    val rows = codes.as[(Long, Seq[Int])].collect()
    assert(rows.length == emb.count())
    assert(rows.forall(_._2.length == 8))
    assert(rows.forall(_._2.forall(c => c >= 0 && c < 16)))
    // 64 float32 = 256 B raw; 8 nibble-range codes pack to 8 B (or 4 B):
    // the 32x compression is the operator's reason to exist
    val p = codes.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") && !p.contains("Join"),
      s"encoding must be map-side only:\n$p")
  }

  test("ADC retrieval: self-retrieval at rank 1 and measured recall@10 vs brute force") {
    val cb = ProductQuantizer.train(emb, m = 8, ksub = 16, iters = 3)
    val codes = ProductQuantizer.encode(emb, cb).localCheckpoint(true)
    def brute(qid: Long) = Similarity.topK(emb, qid, k = 10)
      .as[(Long, Long)].collect().map(_._1).toSet
    def adc(qid: Long) = ProductQuantizer.adcTopK(emb, codes, cb, qid, k = 10,
      refine = 8)
      .as[(Long, Long)].collect()
    val recalls = (0L until 5L).map { qid =>
      val a = adc(qid)
      // exact rescore puts the query itself first (sim quantizes to ~1.0)
      assert(a.head._1 == qid && a.head._2 >= 999000L, s"query $qid: ${a.head}")
      val r = (a.map(_._1).toSet & brute(qid)).size / 10.0
      r
    }
    val mean = recalls.sum / recalls.size
    // deterministic (no RNG anywhere); this corpus is near-random unit
    // vectors — the hardest regime for ADC ranking (neighbor similarities
    // cluster tightly). Measured 0.68 at refine=4, 0.84 at refine=8: the
    // refine knob IS the recall dial, and the floor guards against silent
    // regressions, not noise.
    assert(mean >= 0.75, s"mean recall@10 $mean (per-query: $recalls)")
  }

  test("ADC candidate cut is partition-invariant (quantized ordering is total)") {
    // the cut ranks by (floor-millionths approx dot DESC, id ASC) — a TOTAL
    // order, so the refined set and the final top-k cannot depend on which
    // partition a row lands in (and q90's DuckDB oracle can replay the cut)
    val cb = ProductQuantizer.train(emb, m = 8, ksub = 16, iters = 0)
    val base = ProductQuantizer.encode(emb, cb)
    val layouts = Seq(base.repartition(1), base.repartition(7, col("vec_id")),
      base.repartition(32))
    val results = layouts.map { codes =>
      ProductQuantizer.adcTopK(emb, codes, cb, queryId = 3L, k = 10, refine = 4)
        .as[(Long, Long)].collect().toSeq
    }
    assert(results.distinct.size == 1,
      s"partition-dependent ADC result: ${results.distinct}")
  }

  test("sampled training (trainFraction): full-corpus MSE within tolerance of full training") {
    // same knob as ivfTrain's: Lloyd over a deterministic md5 half-sample,
    // then one full-corpus encode — the 100 TB training shape. All values
    // deterministic (hash-sample + seeded Lloyd): measured sampled 0.588 vs
    // full 0.575, seed 0.752
    val seedMse = ProductQuantizer.quantizationMse(emb,
      ProductQuantizer.train(emb, iters = 0))
    val fullMse = ProductQuantizer.quantizationMse(emb,
      ProductQuantizer.train(emb, iters = 2))
    val sampledMse = ProductQuantizer.quantizationMse(emb,
      ProductQuantizer.train(emb, iters = 2, trainFraction = 0.5))
    assert(sampledMse < seedMse, s"sampled training must beat the seed: $sampledMse vs $seedMse")
    assert(sampledMse <= fullMse * 1.1,
      s"sampled training must land near full training: $sampledMse vs $fullMse")
  }

  test("training weights duplicate subvectors by multiplicity, not distinct value") {
    // 9 exact copies of a + one nearby c in a's cluster: the one-step mean
    // must be (9a + c)/10. A value-keyed argmin would collapse the copies
    // and yield (a + c)/2 — the bias this test pins out.
    val a = Array.tabulate(16)(i => 0.1f * (i % 4 + 1))
    val b = Array.fill(16)(5f)
    val c = a.map(_ + 0.4f)
    val rows = Seq((0L, a.toSeq), (1L, b.toSeq)) ++
      (2L to 9L).map(i => (i, a.toSeq)) :+ (10L, c.toSeq)
    val df = rows.toDF("vec_id", "embedding")
    val cb = ProductQuantizer.train(df, m = 2, ksub = 2, iters = 1, dims = 16)
    val expected = a.zip(c).map { case (x, y) => ((9.0 * x + y) / 10.0).toFloat }
    for (s <- 0 until 2) {
      val got = cb.cents(s)(0)
      val exp = expected.slice(s * 8, s * 8 + 8)
      got.zip(exp).foreach { case (g, e) =>
        assert(math.abs(g - e) < 1e-6f, s"sub $s: ${got.toSeq} vs ${exp.toSeq}")
      }
    }
  }

  test("IVF-PQ composition: full probe + full refine recovers brute force exactly") {
    // with nprobe = nlist (no list pruned) and refine covering the corpus,
    // the exact rescore sees every vector — the composed pipeline must
    // reduce to brute force, proving no stage silently loses rows
    val cb = ProductQuantizer.train(emb, m = 8, ksub = 16, iters = 2)
    val codes = ProductQuantizer.encode(emb, cb).localCheckpoint(true)
    val ivfCb = Similarity.ivfTrain(emb, nlist = 8, iters = 2)
    val n = emb.count().toInt
    val brute = Similarity.topK(emb, queryId = 1L, k = 10)
      .as[(Long, Long)].collect().toSeq
    val full = ProductQuantizer.ivfPqTopK(emb, codes, cb, ivfCb,
      queryId = 1L, k = 10, nprobe = 8, refine = n)
      .as[(Long, Long)].collect().toSeq
    assert(full == brute)
    // narrow probe still self-retrieves: the query's own list is always
    // the nearest centroid's, and its own code is its best ADC match
    val narrow = ProductQuantizer.ivfPqTopK(emb, codes, cb, ivfCb,
      queryId = 1L, k = 10, nprobe = 1, refine = 8)
      .as[(Long, Long)].collect()
    assert(narrow.head._1 == 1L && narrow.head._2 >= 999000L)
  }
}
