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

  test("knnJoin: per query-batch results equal the single-query topK; no window shuffle") {
    val real = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = real.filter($"vec_id" < 3)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val batched = Similarity.knnJoin(real, queries, k = 5)
    val got = batched.select($"query_id", $"rn", $"vec_id", $"sim_q")
      .as[(Long, Int, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(t => (t._3, t._4)).toSeq).toMap
    (0L until 3L).foreach { qid =>
      val single = Similarity.topK(real, queryId = qid, k = 5)
        .as[(Long, Long)].collect().toSeq
      assert(got(qid) == single, s"query $qid: batched != single-query topK")
    }
    // scale shape: the corpus is scored map-side against the broadcast query
    // batch and reduced by the bounded aggregator — no Window operator, no
    // exchange keyed on the corpus id; the only hash exchange is per-query
    val plan = batched.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"knnJoin must not window-sort the corpus:\n$plan")
    assert(plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("hashpartitioning(vec_id"),
      s"corpus rows must never shuffle on vec_id:\n$plan")
  }

  test("knnJoin: integral ids widen to long; non-integral ids fail fast") {
    val real = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    // smallint corpus + int queries: every integral width must widen
    val intCorpus = real.select($"vec_id".cast("smallint").as("vec_id"), $"embedding")
    val queries = real.filter($"vec_id" < 2)
      .select($"vec_id".cast("int").as("query_id"), $"embedding".as("query_vec"))
    val got = Similarity.knnJoin(intCorpus, queries, k = 3)
    assert(got.schema("vec_id").dataType.simpleString == "bigint")
    assert(got.count() == 6)
    val strCorpus = real.select(concat(lit("d"), $"vec_id").as("vec_id"), $"embedding")
    val err = intercept[IllegalArgumentException] {
      Similarity.knnJoin(strCorpus, queries, k = 3)
    }
    assert(err.getMessage.contains("integral"), err.getMessage)
  }

  test("lshNearDupPairs at the 0.9 threshold regime: recall ~1 AND real pruning") {
    // The 'tighten or accept' claim made empirical: at TRUE near-dup
    // thresholds (>=0.9) the 4x4 banding is simultaneously high-recall and
    // selective. Corpus = normalized base embeddings + for each a partner at
    // EXACTLY cosine 0.95 (w = 0.95 v + sqrt(1-0.95^2) u with u ⊥ v, both
    // unit — the dot product is 0.95 by construction, deterministic).
    val c = 0.95f
    val s = math.sqrt(1 - c.toDouble * c).toFloat
    val base = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
      .map { case (id, v) =>
        val n = math.sqrt(v.map(x => x.toDouble * x).sum)
        (id, v.map(x => (x / n).toFloat))
      }
    val partners = base.map { case (id, v) =>
      val r = Array.tabulate(v.length)(i => (((id * 31 + i * 17) % 7) - 3).toFloat)
      val proj = r.zip(v).map { case (a, b) => a * b }.sum
      val u0 = r.zip(v).map { case (a, b) => a - proj * b }
      val un = math.sqrt(u0.map(x => x.toDouble * x).sum)
      val u = u0.map(x => (x / un).toFloat)
      (id + 100000L, v.zip(u).map { case (a, b) => c * a + s * b })
    }
    val corpus = spark.createDataFrame(base ++ partners).toDF("vec_id", "embedding")
    val threshold = 900000L
    val exact = Similarity.nearDupPairs(corpus, threshold)
      .select($"vec_a", $"vec_b").as[(Long, Long)].collect().toSet
    assert(exact.size >= base.length, "every injected 0.95 partner must qualify at 0.9")
    val lsh = Similarity.lshNearDupPairs(corpus, threshold, planes = 16, bandWidth = 4)
      .select($"vec_a", $"vec_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact), "rescore must kill every sub-threshold candidate")
    val recall = lsh.size.toDouble / exact.size
    // 16 planes / 4-band expectation at sim 0.95: p_bit = 1 - acos(.95)/pi
    // = 0.899, band hit = p^4 = 0.653, miss all 4 bands = 0.347^4 = 1.5%
    assert(recall >= 0.95, f"recall $recall%.3f at threshold 0.9 (expected ~0.985)")
    // pruning factor: candidate pairs (threshold disabled) vs all pairs
    val n = 2L * base.length
    val candidates = Similarity.lshNearDupPairs(corpus, Long.MinValue,
      planes = 16, bandWidth = 4).count()
    val pruning = candidates.toDouble / (n * (n - 1) / 2)
    assert(pruning < 0.25,
      f"banding must prune the candidate space, got $pruning%.3f of all pairs")
    info(f"threshold 0.9 regime: recall = $recall%.3f, candidates = $pruning%.3f of all pairs")
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
