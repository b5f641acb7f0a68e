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
