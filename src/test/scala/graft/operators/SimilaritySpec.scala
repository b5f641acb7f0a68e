package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val emb = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.0f, 1.0f, 0.0f)),
    (2L, Array(1.0f, 0.0f, 0.0f)),   // identical to 0
    (3L, Array(0.6f, 0.8f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("dot product is exact for known vectors") {
    val d = emb.filter($"vec_id" === 3L)
      .select(Similarity.dot($"embedding", $"embedding").as("d"))
      .as[Double].head()
    // float32 inputs: 0.6f/0.8f carry ~1e-8 representation error
    assert(math.abs(d - 1.0) < 1e-6)
  }

  test("codegen'd vec_dot equals the portable HOF dot on real embeddings") {
    val real = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = real.filter($"vec_id" === 0).select($"embedding".as("qv"))
    val both = real.crossJoin(q).select(
      Similarity.dot($"embedding", $"qv").as("hof"),
      graft.functions.GraftFunctions.vecDot(spark, $"embedding", $"qv").as("native"))
    // identical accumulation order ⇒ bit-identical doubles
    assert(both.filter($"hof" =!= $"native").count() == 0)
  }

  test("topK ranks the identical vector first (after the query itself)") {
    val top = Similarity.topK(emb, queryId = 0L, k = 3)
      .as[(Long, Long)].collect()
    assert(top.map(_._1).take(2).toSet == Set(0L, 2L)) // both sim=1.0, id tiebreak
    assert(top.head._2 == 1000000L)
    assert(top(2)._1 == 3L && top(2)._2 == 600000L) // 0.6 quantized, floor
  }

  test("nearDupPairs finds exactly the identical pair at high threshold") {
    val pairs = Similarity.nearDupPairs(emb, minSimMillionths = 990000L)
      .select($"vec_a", $"vec_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 2L)))
  }

  test("lshBuckets: identical vectors land in the same bucket, 8-bit range") {
    val b = Similarity.lshBuckets(emb, planes = 8).as[(Long, Int)].collect().toMap
    assert(b(0L) == b(2L))
    assert(b.values.forall(v => v >= 0 && v < 256))
  }

  test("lshTopK returns the query and its duplicate from the same bucket") {
    val ids = Similarity.lshTopK(emb, queryId = 0L, k = 5)
      .select($"vec_id").as[Long].collect().toSet
    assert(ids.contains(0L) && ids.contains(2L))
  }
}
