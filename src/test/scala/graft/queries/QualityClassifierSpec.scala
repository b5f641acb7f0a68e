package graft.queries

import java.security.MessageDigest

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** q104's invariants beyond the DuckDB hash check: a plain-JVM replay of
  * the whole train-then-score path (deterministic token shuffle, hashed
  * n-gram counts, smoothed quantized weights, exact integer sums) matches
  * every row, and the learned scorer behaves like a quality classifier —
  * scrambled text scores far below real text, the reference slice scores
  * above the corpus, and the threshold binds without flagging the bulk. */
class QualityClassifierSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"
  private val Dim = 1024

  private lazy val result =
    TrainingDataQueries.qualityClassifier(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4)))

  private lazy val raw = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select($"doc_id", $"lang", $"source", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
  }

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def shuffle(text: String): String =
    text.split(" ", -1).map(t => md5hex(t) + ":" + t).sorted
      .map(_.substring(33)).mkString(" ")

  private def bucket(g: String): Int =
    Integer.parseInt(md5hex(g).substring(0, 4), 16) % Dim

  private def gramBuckets(t: String): Seq[Int] =
    (0 to t.length - 3).map(i => bucket(t.substring(i, i + 3)))

  private lazy val weights: Array[Long] = {
    val posTexts = raw.filter(_._3 == "src0").map(_._4).filter(_.length >= 3)
    val negTexts = raw.filter(_._3 == "src0").map(r => shuffle(r._4))
      .filter(_.length >= 3)
    def counts(ts: Seq[String]) = {
      val m = scala.collection.mutable.Map.empty[Int, Long]
      ts.foreach(t => gramBuckets(t).foreach(b => m(b) = m.getOrElse(b, 0L) + 1))
      (m, m.values.sum)
    }
    val (pc, pt) = counts(posTexts.toSeq)
    val (nc, nt) = counts(negTexts.toSeq)
    Array.tabulate(Dim) { b =>
      math.floor(1000000.0 * (pc.getOrElse(b, 0L) + 1) / (pt + Dim)).toLong -
        math.floor(1000000.0 * (nc.getOrElse(b, 0L) + 1) / (nt + Dim)).toLong
    }
  }

  test("plain-JVM replay of train + score matches every row exactly") {
    val expect = raw.filter(_._4.length >= 3).map { case (id, lang, _, t) =>
      val bs = gramBuckets(t)
      val wSum = bs.map(b => weights(b)).sum
      val q = wSum.toDouble / bs.length
      (id, lang, bs.length.toLong, q, q < -200.0)
    }.sortBy(_._1)
    assert(result.toSeq == expect.toSeq)
  }

  test("the learned scorer discriminates: shuffled text craters, reference rises, threshold binds") {
    val scoreOf = result.map(r => r._1 -> r._4).toMap
    // scoring the SHUFFLED corpus under the same weights must crater —
    // word order is the signal the training destroyed in its negatives
    val shuffledScores = raw.map(r => shuffle(r._4)).filter(_.length >= 3)
      .map { t => val bs = gramBuckets(t); bs.map(weights).sum.toDouble / bs.length }
    val realMean = scoreOf.values.sum / scoreOf.size
    val shufMean = shuffledScores.sum / shuffledScores.length
    assert(realMean - shufMean > 200.0,
      s"real $realMean must clear shuffled $shufMean by a wide margin")
    // the reference slice itself scores above the corpus mean
    val srcOf = raw.map(r => r._1 -> r._3).toMap
    val refScores = result.filter(r => srcOf(r._1) == "src0").map(_._4)
    assert(refScores.sum / refScores.length > realMean,
      "src0 must score above the corpus mean")
    // the flag binds on a small tail, never the bulk
    val flagged = result.count(_._5)
    assert(flagged > 0 && flagged < result.length / 10,
      s"flagged $flagged of ${result.length}")
    // and 9 in 10 scrambled docs would be caught by the same threshold
    assert(shuffledScores.count(_ < -200.0) * 10 >= shuffledScores.length * 8,
      "the threshold must catch the vast majority of scrambled text")
  }

  test("native codegen scorer equals the HOF reference, non-ASCII and astral rows included") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "abc"),
      (3L, "ab"), // sub-n: dropped by both paths
      (4L, "héllo wörld — ünïcode text"),
      (5L, "日本語のテキストです"),
      (6L, "mixed ascii and 𝔘𝔫𝔦 astral 𝕥𝕖"),
      (7L, ""),
      (8L, "aaa aaa aaa")).toDF("doc_id", "text")
    def run(f: (org.apache.spark.sql.DataFrame, Array[Long], String, Int)
        => org.apache.spark.sql.DataFrame) =
      f(docs, weights, "text", 3).orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    val native = run(graft.operators.QualityClassifier.score)
    val hof = run(graft.operators.QualityClassifier.scoreHof)
    assert(native.toSeq == hof.toSeq, "native and HOF scorers must agree row-exactly")
    assert(native.map(_._1).toSeq == Seq(1L, 2L, 4L, 5L, 6L, 8L),
      "sub-n and empty docs drop; everything else scores")
  }

  test("shuffleTokens is a permutation: same token multiset, md5 order, deterministic") {
    import spark.implicits._
    val t = "the quick brown fox jumps over the lazy dog"
    val out = Seq(Tuple1(t)).toDF("text")
      .select(graft.operators.QualityClassifier.shuffleTokens($"text"))
      .as[String].collect().head
    assert(out == shuffle(t), "Spark and JVM shuffles agree")
    assert(out != t, "order must actually change")
    assert(out.split(" ", -1).sorted.toSeq == t.split(" ", -1).sorted.toSeq,
      "token multiset preserved")
  }

  test("withScore: sub-n-char docs score null IN PLACE, never drop") {
    import spark.implicits._
    val weights = graft.operators.QualityClassifier.fit(
      Seq("the quick brown fox jumps over the lazy dog").toDF("text"))
    val docs = Seq((1L, "a fluent enough sentence"), (2L, "ab"), (3L, ""))
      .toDF("doc_id", "text")
    val scored = graft.operators.QualityClassifier.withScore(docs, weights)
    // the column form's contract for fused pipelines: every input row
    // survives (score's universe is length >= n docs only), short docs
    // carry a null score the LEFT-gate coalesce reads as pass
    assert(scored.count() == 3)
    val byId = scored.select($"doc_id", $"quality_score")
      .as[(Long, Option[Double])].collect().toMap
    assert(byId(1L).isDefined && byId(2L).isEmpty && byId(3L).isEmpty, byId)
    // and the scoreable row equals the batch operator exactly
    val batch = graft.operators.QualityClassifier.score(docs, weights)
      .filter($"quality_score".isNotNull)
      .select($"doc_id", $"quality_score").as[(Long, Double)].collect().toMap
    assert(byId(1L) == batch.get(1L), (byId, batch))
  }
}
