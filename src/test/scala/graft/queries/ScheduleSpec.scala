package graft.queries

import graft.SparkTestSession
import org.apache.spark.sql.functions.{array_distinct, col, size}
import org.scalatest.funsuite.AnyFunSuite

/** q107/q108/q109's invariants beyond the DuckDB hash checks.
  *
  * q107 (epoch shard): the whole result — shard assignment, within-shard
  * order, contiguous positions — replayed in plain JVM md5 arithmetic,
  * row-exact; determinism is the operator's entire point.
  *
  * q109 (mix schedule): the battery corpora are uniform and below the
  * keep-all threshold at every SF, so the oracle never exercises the h16
  * prefilter's THINNING branch — this spec drives the core with a skewed
  * synthetic corpus where it does bind, and pins the result row-identical
  * to the unfiltered brute force (the prefix property that makes survivor
  * ranks global ranks).
  *
  * q108 (keep-best rep): membership, maximality, and tiebreak of the
  * chosen representative verified against independently collected
  * clusters. */
class ScheduleSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q107: plain-JVM replay is row-exact — shard, order, contiguous positions") {
    val got = TrainingDataQueries.epochShard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3))).toSeq
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val keyed = docs.map { case (id, src) =>
      val k = md5hex(s"epoch3:$id")
      (id, src, Integer.parseInt(k.substring(0, 4), 16) % 8, k)
    }
    // lowercase-hex string order == Spark's binary UTF8 order (pure ASCII)
    val want = keyed.groupBy(_._3).toSeq.flatMap { case (_, rows) =>
      rows.sortBy(r => (r._4, r._1)).zipWithIndex
        .map { case ((id, src, sh, _), i) => (id, src, sh, i + 1) }
    }.sortBy(r => (r._3, r._4))
    assert(got == want)
    assert(got.map(_._1).distinct.length == docs.length,
      "every document must land in exactly one shard slot")
  }

  test("q109: prefilter is row-identical to the unfiltered brute force where it thins") {
    import spark.implicits._
    // src0 (rate 1) and src7 (rate 8) large enough that the h16 cut binds
    // (n > 1.5 · 4000/r at take=100: 800·1.5=1200 and 100·1.5=150 resp.);
    // src2 (rate 4, need 200) stays below keep-all threshold (n=50)
    val docs = ((1 to 2000).map(i => (i.toLong, "src0")) ++
      (10001 to 12000).map(i => (i.toLong, "src7")) ++
      (20001 to 20050).map(i => (i.toLong, "src2")))
      .toDF("doc_id", "source")
    val take = 100
    val fast = TrainingDataQueries.mixScheduleOf(docs, take)
      .collect().map(_.toSeq).toSeq
    val brute = TrainingDataQueries.mixScheduleOf(docs, take, prefilter = false)
      .collect().map(_.toSeq).toSeq
    assert(fast == brute)
    assert(fast.size == take)
    // rate semantics: the rate-1 source occupies ~8× the slots of a rate-8
    // source in any schedule prefix
    val bySrc = fast.groupBy(_(1).asInstanceOf[String])
      .view.mapValues(_.size).toMap
    assert(bySrc("src0") >= 7 * bySrc.getOrElse("src7", 1),
      s"interleave must track rates: $bySrc")
  }

  test("q109: battery entry emits a duplicate-free, key-ordered prefix") {
    val rows = TrainingDataQueries.mixSchedule(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    val keys = rows.map(_.getLong(3))
    assert(keys.sameElements(keys.sorted), "schedule must be in slot order")
  }

  test("q110: per-source repeats, per-copy shard replayed in plain JVM; copies scatter") {
    val got = TrainingDataQueries.upsampleShard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3))).toSeq
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val reps = Map("src1" -> 2, "src2" -> 4).withDefaultValue(1)
    val want = docs.toSeq.flatMap { case (id, src) =>
      (1 to reps(src)).map { c =>
        val k = md5hex(s"epoch3:$id#$c")
        (id, src, c, Integer.parseInt(k.substring(0, 4), 16) % 8)
      }
    }.sortBy(r => (r._1, r._3))
    assert(got == want)
    // copies of one document scatter across shards like unrelated docs:
    // some 4-copy doc must land in at least two distinct shards (all-same
    // has probability 8^-3 per doc; the corpus has 25 such docs)
    val scattered = got.filter(_._2 == "src2").groupBy(_._1)
      .exists { case (_, copies) => copies.map(_._4).distinct.length >= 2 }
    assert(scattered, "upsampled copies must not clump in one shard")
  }

  test("q108: chosen rep is a member with maximal distinct-token count, min-id tiebreak") {
    val best = LlmQueries.keepBestRep(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    val clusters = SharedStages.dupClusters(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nd = graft.Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(array_distinct(graft.operators.TextAnalysis.tokens(col("text")))).as("nd"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val byCluster = clusters.groupBy(_._2)
    assert(best.length == byCluster.size)
    best.foreach { case (rep, nMembers, bestNd, bestDoc) =>
      val members = byCluster(rep).map(_._1)
      assert(members.length.toLong == nMembers, s"cluster $rep size")
      assert(members.contains(bestDoc), s"cluster $rep: $bestDoc not a member")
      val maxNd = members.map(nd).max
      assert(bestNd == maxNd, s"cluster $rep: $bestNd != max $maxNd")
      assert(bestDoc == members.filter(nd(_) == maxNd).min,
        s"cluster $rep: tiebreak must keep the smallest id")
    }
    assert(best.map(_._2).sum == nd.size.toLong,
      "cluster sizes must cover the corpus exactly once")
  }
}
