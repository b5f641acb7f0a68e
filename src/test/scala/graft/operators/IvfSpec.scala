package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class IvfSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private lazy val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("ivfAssign gives every vector exactly one centroid from the codebook") {
    val a = IvfFixture.assigned(spark)
    assert(a.count() == emb.count())
    assert(a.select($"vec_id").distinct().count() == emb.count())
    val cents = a.select($"centroid_id").distinct().as[Long].collect()
    assert(cents.forall(c => c >= 0 && c < 8))
  }

  test("full probe (nprobe = nlist) recovers the exact brute-force top-k") {
    val brute = Similarity.topK(emb, queryId = 0L, k = 5)
      .as[(Long, Long)].collect().toSeq
    val ivfAll = Similarity.ivfTopK(emb, queryId = 0L, k = 5, nlist = 8, nprobe = 8)
      .as[(Long, Long)].collect().toSeq
    assert(ivfAll == brute)
  }

  test("narrow probe still finds the query vector itself (sim = 1)") {
    val top = Similarity.ivfTopK(emb, queryId = 0L, k = 5, nlist = 8, nprobe = 1)
      .as[(Long, Long)].collect()
    assert(top.nonEmpty && top.head._1 == 0L)
    // cosine of a vector with itself quantizes to ~1.0 (embeddings are unit-normalized)
    assert(top.head._2 >= 999000L)
  }

  test("Lloyd training: coherence non-decreasing per iteration and above the seed") {
    // objective = mean max-dot (spherical k-means coherence); each full
    // Lloyd step cannot decrease it, up to float summation jitter
    val objs = (0 to 3).map { it =>
      Similarity.ivfCoherence(emb, Similarity.ivfTrain(emb, nlist = 8, iters = it))
    }
    objs.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a - 1e-6, s"coherence decreased: $objs")
    }
    // floor, not strict improvement: a seed already at (or within float
    // jitter of) a Lloyd fixed point legitimately cannot improve — strict
    // monotonicity is pinned by the sliding check above
    assert(objs.last >= objs.head - 1e-6,
      s"training must not regress below the sampled seed: $objs")
  }

  test("sampled training (trainFraction): Lloyd reads the hash-sample, lands near full training") {
    import org.apache.spark.sql.functions._
    // the knob's contract: a deterministic md5 hash-sample (engine/partition
    // stable), so each Lloyd pass scans O(sample) — at 100 TB the difference
    // between 5 corpus scans and 5 sample scans before the single full
    // assignment pass
    val n = emb.count()
    val sampleN = emb.filter(Sampling.hash16(col("vec_id")) < lit(0.5 * 65536.0)).count()
    assert(sampleN == 250L && n == 500L, s"hash-sample must be deterministic: $sampleN of $n")
    val seed = Similarity.ivfCoherence(emb, Similarity.ivfTrain(emb, nlist = 8, iters = 0))
    val full = Similarity.ivfCoherence(emb, Similarity.ivfTrain(emb, nlist = 8, iters = 2))
    val sampled = Similarity.ivfCoherence(emb,
      Similarity.ivfTrain(emb, nlist = 8, iters = 2, trainFraction = 0.5))
    // full-corpus coherence of the half-sample-trained codebook: clearly
    // above the seed, within a pinned tolerance of full-corpus training
    // (measured 0.240 vs full 0.255, seed 0.187 — deterministic fixture)
    assert(sampled > seed, s"sampled training must beat the seed: $sampled vs $seed")
    assert(sampled >= full - 0.03,
      s"sampled training must land near full training: $sampled vs $full")
  }

  test("recall@10 vs brute force is monotone in nprobe and exact at full probe") {
    val trained = Similarity.ivfTrain(emb, nlist = 8, iters = 2)
    val queries = Seq(0L, 7L, 42L, 99L, 123L)
    val brute = queries.map { qid =>
      qid -> Similarity.topK(emb, qid, k = 10)
        .as[(Long, Long)].collect().map(_._1).toSet
    }.toMap
    val rec = Seq(1, 2, 4, 8).map { np =>
      val r = queries.map { qid =>
        val ivf = Similarity.ivfTopK(emb, qid, k = 10, nlist = 8, nprobe = np,
          codebook = Some(trained)).as[(Long, Long)].collect().map(_._1).toSet
        (brute(qid) & ivf).size.toDouble / brute(qid).size
      }
      np -> r.sum / r.size
    }
    // a brute-top-k hit found under nprobe=n survives every wider probe
    // (candidate supersets can only add items that rank below it), so the
    // curve cannot fall; SCALE.md publishes the sf0.1 curve
    rec.sliding(2).foreach { case Seq((_, a), (np, b)) =>
      assert(b >= a - 1e-9, s"recall fell at nprobe=$np: $rec")
    }
    assert(rec.last._2 == 1.0, s"nprobe = nlist must be exact: $rec")
    assert(rec.head._2 > 0.0, s"nprobe=1 must find home-list neighbors: $rec")
  }

  test("trained codebook: full probe stays exact; assignment covers every vector") {
    val trained = Similarity.ivfTrain(emb, nlist = 8, iters = 2)
    assert(trained.count() == 8)
    val a = Similarity.ivfAssignWith(emb, trained)
    assert(a.count() == emb.count())
    val brute = Similarity.topK(emb, queryId = 0L, k = 5)
      .as[(Long, Long)].collect().toSeq
    val ivfAll = Similarity.ivfTopK(emb, queryId = 0L, k = 5, nlist = 8,
      nprobe = 8, codebook = Some(trained))
      .as[(Long, Long)].collect().toSeq
    assert(ivfAll == brute, "nprobe = nlist must recover brute force under any codebook")
  }
}

private object IvfFixture {
  def assigned(spark: org.apache.spark.sql.SparkSession) =
    Similarity.ivfAssign(graft.Tables.embeddings(spark, "/root/testdata/sf0.001"), nlist = 8)
}
