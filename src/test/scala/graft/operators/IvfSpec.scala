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
}

private object IvfFixture {
  def assigned(spark: org.apache.spark.sql.SparkSession) =
    Similarity.ivfAssign(graft.Tables.embeddings(spark, "/root/testdata/sf0.001"), nlist = 8)
}
