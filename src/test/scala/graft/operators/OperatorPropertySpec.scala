package graft.operators

import java.sql.Timestamp

import graft.SparkTestSession
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property pins for the round-2 operators against brute-force Scala
  * models: the as-of join (easy to get the boundary/tie/missing-key cases
  * wrong) and CDC-apply (last-write-wins map semantics). Raw ScalaCheck
  * runner, same pattern as [[graft.PropertySpecs]]. */
class OperatorPropertySpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def check(p: Prop, n: Int = 20): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private def ts(s: Long) = new Timestamp(1700000000000L + s * 1000L)

  test("AsOfJoin.backward equals the brute-force latest-at-or-before model") {
    val genLeft = Gen.listOfN(25,
      for { k <- Gen.choose(0, 4); t <- Gen.choose(0L, 50L) } yield (k, t))
    val genRight = Gen.listOfN(25,
      for { k <- Gen.choose(0, 4); t <- Gen.choose(0L, 50L) } yield (k, t))
    check(Prop.forAll(genLeft, genRight) { (ls, rs) =>
      // unique (key, ts) on the right — the operator's documented precondition
      val rClean = rs.distinctBy(r => (r._1, r._2))
      val left = ls.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, s"k$k", ts(t)) }
        .toDF("lid", "k", "t")
      val right = rClean.zipWithIndex
        .map { case ((k, t), i) => (s"k$k", ts(t), i.toLong) }
        .toDF("k", "rt", "rid")
      val got = AsOfJoin.backward(left, right, "k", "t", "rt")
        .select($"lid", $"matched.rid".as("rid"))
        .as[(Long, Option[Long])].collect().toMap
      val model = ls.zipWithIndex.map { case ((k, t), i) =>
        val cands = rClean.zipWithIndex
          .filter { case ((rk, rtm), _) => rk == k && rtm <= t }
        val best = if (cands.isEmpty) None
                   else Some(cands.maxBy { case ((_, rtm), _) => rtm }._2.toLong)
        i.toLong -> best
      }.toMap
      got == model
    })
  }

  test("Merge.applyChanges equals the last-write-wins map model") {
    val genSnap = Gen.listOfN(12, Gen.choose(0, 9)).map(_.distinct)
    val genChanges = Gen.listOfN(18, for {
      k <- Gen.choose(0, 14)
      t <- Gen.choose(0L, 30L)
      op <- Gen.oneOf("INSERT", "UPDATE", "DELETE")
      v <- Gen.choose(0, 999)
    } yield (k, t, op, v))
    check(Prop.forAll(genSnap, genChanges) { (snapKeys, chs) =>
      // unique (key, ts) — the window's deterministic-winner precondition
      val changes = chs.distinctBy(c => (c._1, c._2))
      val snapshot = snapKeys.map(k => (k.toLong, k * 10)).toDF("k", "v")
      val changeDf = changes
        .map { case (k, t, op, v) => (k.toLong, op, ts(t), v) }
        .toDF("k", "op", "ts", "v")
      val got = Merge.applyChanges(snapshot, changeDf, Seq("k"), "ts", "op")
        .as[(Long, Int)].collect().toMap
      val model = changes.groupBy(_._1).foldLeft(
        snapKeys.map(k => k.toLong -> k * 10).toMap) {
        case (acc, (k, versions)) =>
          val (_, _, op, v) = versions.maxBy { case (_, t, o, _) => (t, o) }
          if (op == "DELETE") acc - k.toLong else acc + (k.toLong -> v)
      }
      got == model
    })
  }

  test("lshNearDupPairs is a subset of exact pairs with identical scores (precision 1)") {
    val genVecs = Gen.listOfN(30, Gen.listOfN(8, Gen.choose(-100, 100)))
    check(Prop.forAll(genVecs) { raw =>
      val vecs = raw.zipWithIndex.collect {
        case (v, i) if v.exists(_ != 0) =>
          val n = math.sqrt(v.map(x => x.toDouble * x).sum)
          (i.toLong, v.map(x => (x / n).toFloat).toArray)
      }
      val df = vecs.toDF("vec_id", "embedding")
      val exact = Similarity.nearDupPairs(df, 300000L, vecCol = "embedding")
        .as[(Long, Long, Long)].collect().toMap2
      val lsh = Similarity.lshNearDupPairs(df, 300000L,
        planes = 16, bandWidth = 4, dims = 8, vecCol = "embedding")
        .as[(Long, Long, Long)].collect().toMap2
      lsh.keySet.subsetOf(exact.keySet) &&
        lsh.forall { case (k, s) => exact(k) == s }
    }, n = 10)
  }

  test("lshCandidatesCapped: cap >= corpus equals uncapped; raising the cap only adds pairs") {
    val genDocs = Gen.listOfN(20, for {
      vocab <- Gen.choose(0, 3) // few vocabularies → real shared buckets
      words <- Gen.listOfN(6, Gen.choose(0, 5))
    } yield words.map(w => s"v${vocab}w$w").mkString(" "))
    check(Prop.forAll(genDocs) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val sigs = Dedup.minhashSignatures(Dedup.shingles(docs), bands = 4)
      def capped(k: Int): Set[(Long, Long)] =
        Dedup.lshCandidatesCapped(sigs, k)._1.as[(Long, Long)].collect().toSet
      val uncapped = Dedup.lshCandidates(sigs).as[(Long, Long)].collect().toSet
      val c2 = capped(2); val c5 = capped(5); val cAll = capped(texts.length + 1)
      cAll == uncapped && c2.subsetOf(c5) && c5.subsetOf(cAll)
    }, n = 10)
  }

  test("QualityClassifierScore equals the brute-force code-point model on arbitrary unicode") {
    // the native expression's contract: for every code-point trigram, sum
    // weights[(first 16 bits of md5(UTF-8 bytes)) % dim] — byte fast path,
    // memo table, and char loop must all agree with this model, on ASCII,
    // 2/3-byte BMP, and astral (surrogate-pair) text alike
    val weights = Array.tabulate(1024)(b => (b * 37 - 512).toLong)
    def model(s: String): Option[(Long, Double)] = {
      val cps = s.codePoints().toArray
      if (cps.length < 3) None
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        var acc = 0L
        (0 to cps.length - 3).foreach { i =>
          val g = new String(cps.slice(i, i + 3).flatMap(Character.toChars))
          md.reset()
          val h = md.digest(g.getBytes("UTF-8"))
          acc += weights((((h(0) & 0xff) << 8) | (h(1) & 0xff)) % 1024)
        }
        val n = (cps.length - 2).toLong
        Some((n, acc.toDouble / n))
      }
    }
    val cp = Gen.frequency(
      9 -> Gen.choose(32, 126), // ASCII (byte fast path + memo)
      2 -> Gen.choose(0xC0, 0x24F), // 2-byte UTF-8
      1 -> Gen.choose(0x4E00, 0x4FFF), // 3-byte UTF-8
      1 -> Gen.choose(0x1F300, 0x1F3FF)) // astral: 4-byte, surrogate pair
    val genText = Gen.choose(0, 40)
      .flatMap(n => Gen.listOfN(n, cp))
      .map(cps => new String(cps.toArray.flatMap(Character.toChars(_))))
    check(Prop.forAll(Gen.listOfN(8, genText)) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = QualityClassifier.score(docs, weights)
        .select($"doc_id", $"n_grams", $"quality_score")
        .as[(Long, Long, Double)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      val expect = texts.zipWithIndex.flatMap { case (t, i) =>
        model(t).map(i.toLong -> _)
      }.toMap
      got == expect
    }, n = 15)
  }

  private implicit class TripleOps(rows: Array[(Long, Long, Long)]) {
    def toMap2: Map[(Long, Long), Long] =
      rows.map { case (a, b, s) => (a, b) -> s }.toMap
  }
}
