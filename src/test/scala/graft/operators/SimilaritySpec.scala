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

  test("lshNearDupPairs: recall 1 vs brute force on a corpus with true near-dups") {
    // Real embeddings + an injected near-duplicate of each (first component
    // nudged by 1e-4, renormalized → sim ≥ 0.9999). At TRUE near-dup
    // similarity the banding is sound; the spec pins recall = 1 there.
    val base = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val dups = base.map { case (id, v) =>
      val w = v.clone(); w(0) = w(0) + 1e-4f
      val n = math.sqrt(w.map(x => x.toDouble * x).sum)
      (id + 100000L, w.map(x => (x / n).toFloat))
    }
    val corpus = spark.createDataFrame(base ++ dups).toDF("vec_id", "embedding")
    val exact = Similarity.nearDupPairs(corpus, minSimMillionths = 999000L)
      .select($"vec_a", $"vec_b").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshNearDupPairs(corpus, minSimMillionths = 999000L,
      planes = 16, bandWidth = 4)
      .select($"vec_a", $"vec_b").as[(Long, Long)].collect().toSet
    assert(exact.size >= base.length, "every injected dup must pair with its source")
    assert(lsh == exact, s"missed ${(exact -- lsh).size} of ${exact.size} pairs")
  }

  test("lshNearDupPairs plans an equi-join candidate stage, never a cartesian product") {
    val plan = Similarity.lshNearDupPairs(
      graft.Tables.embeddings(spark, "/root/testdata/sf0.001"),
      minSimMillionths = 350000L, planes = 16, bandWidth = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"candidate generation must be bucket-confined:\n$plan")
  }
}
