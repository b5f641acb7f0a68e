package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

case class RDoc(doc_id: Long, text: String)

/** Sparse retrieval + fusion ([[Retrieval]]): BM25's rare-term lift,
  * length normalization, tf saturation, and exact quantized scoring on a
  * constructed corpus; RRF's integer-exact arithmetic and fusion
  * semantics. */
class RetrievalSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("bm25: rare-term lift, length normalization, and absent docs never rank") {
    val docs = Seq(
      RDoc(1L, "rare common filler1 filler2"),          // rare term, short
      RDoc(2L, "common " + (1 to 20).map(i => s"f$i").mkString(" ")), // common only, long
      RDoc(3L, "common pad1 pad2"),                     // common only, short
      RDoc(4L, "none of these words match at all")      // no query term
    ).toDF()
    val got = Retrieval.bm25TopK(docs, Seq("rare", "common"), k = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 4 never ranks; doc 1 wins on the discriminative term
    assert(got.map(_._2).toSeq == Seq(1L, 3L, 2L), s"got ${got.mkString(", ")}")
    assert(!got.exists(_._2 == 4L))
    assert(got.head._3 == 2L) // doc 1 hit both terms
    // length normalization: same tf of 'common', shorter doc 3 > longer doc 2
    val s3 = got.find(_._2 == 3L).get._4
    val s2 = got.find(_._2 == 2L).get._4
    assert(s3 > s2, s"length normalization inverted: $s3 <= $s2")
  }

  test("bm25: exact quantized score on a hand-checkable corpus; tf saturates") {
    // 2 docs, 1 term; every quantity below is small enough to compute here
    val docs = Seq(
      RDoc(1L, "t a b c"),          // tf=1, dl=4
      RDoc(2L, "t t t t a b c d")   // tf=4, dl=8
    ).toDF()
    val got = Retrieval.bm25TopK(docs, Seq("t"), k = 10)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    val n = 2.0; val df = 2.0; val avgdl = 6.0
    val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    def score(tf: Double, dl: Double): Long =
      math.floor(idf * (tf * (1.2 + 1.0)) /
        (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) * 1000000.0).toLong
    assert(got(1L) == score(1.0, 4.0), s"got ${got(1L)} want ${score(1.0, 4.0)}")
    assert(got(2L) == score(4.0, 8.0), s"got ${got(2L)} want ${score(4.0, 8.0)}")
    // saturation: 4x the term frequency buys well under 4x the score
    assert(got(2L) < 4L * got(1L) && got(2L) > got(1L))
  }

  test("bm25: k bounds the result and ranking ties break by doc id") {
    val docs = (1L to 30L).map(i => RDoc(i, "same text for all")).toDF()
    val got = Retrieval.bm25TopK(docs, Seq("same"), k = 5)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(got.map(_._2).toSeq == (1L to 5L).toSeq, s"got ${got.mkString(", ")}")
    assert(got.map(_._1).toSeq == (1 to 5).toSeq)
  }

  test("rrf: integer-exact contributions, fusion across lists, singles rank below doubles") {
    val a = Seq((1, 101L), (2, 102L), (3, 103L)).toDF("rnk", "doc_id")
    val b = Seq((1, 102L), (2, 101L), (3, 104L)).toDF("rnk", "doc_id")
    val got = Retrieval.rrfFuse(Seq(a, b), k = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val c = (r: Int) => 1000000L / (60L + r) // exact for these divisors
    val want = Map(
      101L -> (c(1) + c(2)), 102L -> (c(2) + c(1)),
      103L -> c(3), 104L -> c(3))
    got.foreach { case (_, id, _, s) => assert(s == want(id), s"id $id: $s != ${want(id)}") }
    // 101 and 102 tie exactly (symmetric ranks) — id breaks it; the
    // single-list docs tie below and break by id too
    assert(got.map(_._2).toSeq == Seq(101L, 102L, 103L, 104L), s"got ${got.mkString(", ")}")
    assert(got.map(_._3).toSeq == Seq(2L, 2L, 1L, 1L))
  }

  test("rrf: k bound and a single-list degenerate fuse is that list's order") {
    val a = Seq((1, 7L), (2, 9L), (3, 5L)).toDF("rnk", "doc_id")
    val got = Retrieval.rrfFuse(Seq(a), k = 2)
      .collect().map(r => r.getLong(1)).toSeq
    assert(got == Seq(7L, 9L))
  }
}
