package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class DedupClusterSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val docs = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L).toDF("doc_id")

  test("chains, pairs and singletons resolve to min-id representatives") {
    // 1-2-3-4 is a diameter-3 chain (needs >1 propagation round), 10-11 a
    // pair, 20 a singleton
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("doc_a", "doc_b")
    val got = Dedup.clusterPairs(docs, pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("no pairs means every document represents itself") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val got = Dedup.clusterPairs(docs, empty).as[(Long, Long)].collect().toMap
    assert(got.forall { case (d, r) => d == r } && got.size == 7)
  }

  test("a long shuffled chain contracts in far fewer rounds than its diameter") {
    // a 60-node path: plain neighbor propagation would need ~59 rounds —
    // past the maxIter backstop — so this fixture FAILS if star
    // contraction's O(log²) round behavior regresses toward
    // diameter-rounds (ids shuffled so nothing rides chain order;
    // worst-case drift chains look exactly like this)
    val n = 60
    val perm = new scala.util.Random(7).shuffle((0L until n).toVector)
    val chainDocs = perm.toDF("doc_id")
    val chainPairs = (0 until n - 1)
      .map(i => (perm(i), perm(i + 1))).toDF("doc_a", "doc_b")
    val got = Dedup.clusterPairs(chainDocs, chainPairs)
      .as[(Long, Long)].collect().toMap
    assert(got.size == n && got.values.toSet == Set(0L))
  }

  test("an unconverged maxIter exit throws instead of returning truncated labels") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("doc_a", "doc_b")
    val e = intercept[IllegalStateException] {
      Dedup.clusterPairs(docs, pairs, maxIter = 1).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("merging two clusters through a bridge edge converges") {
    // two triangles joined by one edge — all seven nodes end at label 1
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (10L, 4L),
      (4L, 20L), (3L, 10L)).toDF("doc_a", "doc_b")
    val got = Dedup.clusterPairs(docs, pairs).as[(Long, Long)].collect().toMap
    assert(got.values.toSet == Set(1L))
  }
}
