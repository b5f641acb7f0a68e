package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private lazy val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")

  test("rate 1.0 keeps everything, rate 0.0 keeps nothing") {
    val n = docs.count()
    assert(Sampling.stratified(docs, "doc_id", "lang", Map.empty, 1.0).count() == n)
    assert(Sampling.stratified(docs, "doc_id", "lang", Map.empty, 0.0).count() == 0)
  }

  test("sampling is deterministic and partitioning-independent") {
    val a = Sampling.stratified(docs, "doc_id", "lang", Map("en" -> 0.5), 1.0)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val b = Sampling.stratified(docs.repartition(7), "doc_id", "lang", Map("en" -> 0.5), 1.0)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b && a.nonEmpty)
  }

  test("per-stratum rate applies only to its stratum") {
    val sampled = Sampling.stratified(docs, "doc_id", "lang", Map("en" -> 0.0), 1.0)
    assert(sampled.filter($"lang" === "en").count() == 0)
    assert(sampled.count() == docs.filter($"lang" =!= "en").count())
  }

  test("sample rate lands near the requested fraction") {
    val n = docs.count().toDouble
    val k = Sampling.stratified(docs, "doc_id", "lang", Map.empty, 0.5).count().toDouble
    assert(k / n > 0.35 && k / n < 0.65) // 16-bit hash, n~500: loose CI
  }

  test("split: exhaustive, near the fractions, and growth never moves a row") {
    val fr = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)
    val full = Sampling.split(docs, "doc_id", fr)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(full.size == docs.count())
    val shares = full.groupBy(_._2).view.mapValues(_.size.toDouble / full.size)
    assert(shares("train") > 0.8 && shares("val") < 0.15 && shares("test") < 0.15)
    // adding documents (here: a subset standing in for an older corpus
    // version) assigns every pre-existing row identically
    val subset = Sampling.split(docs.filter($"doc_id" % 3 === 0), "doc_id", fr)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(subset.forall { case (id, s) => full(id) == s })
  }

  test("split: different salts give independent assignments") {
    val fr = Seq("a" -> 0.5, "b" -> 0.5)
    val s1 = Sampling.split(docs, "doc_id", fr, salt = "x")
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    val s2 = Sampling.split(docs, "doc_id", fr, salt = "y")
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    val agree = s1.count { case (id, s) => s2(id) == s }.toDouble / s1.size
    assert(agree > 0.3 && agree < 0.7, s"salted splits should be independent: $agree")
  }

  test("topFractionCutoffs: ⌈frac·n⌉-th largest score, keep-all-ties") {
    // group g: scores 9,8,7,7,7,3,2,1,1,0 (n=10, frac .4 → 4th largest = 7)
    val rows = Seq(9, 8, 7, 7, 7, 3, 2, 1, 1, 0).zipWithIndex
      .map { case (sc, i) => (i.toLong, "g", sc) } ++
      // group h: all ties (n=4, any cutoff keeps everything)
      (100 to 103).map(i => (i.toLong, "h", 5))
    val df = rows.toDF("id", "grp", "score")
    val cuts = Sampling.topFractionCutoffs(df, "grp", "score", frac = 0.4)
      .as[(String, Int)].collect().toMap
    assert(cuts == Map("g" -> 7, "h" -> 5))
    // keep-all-ties: score >= 7 keeps 5 rows (≥ ⌈0.4·10⌉ = 4, ties intact)
    val kept = df.join(cuts.toSeq.toDF("grp", "cutoff"), "grp")
      .filter($"score" >= $"cutoff")
    assert(kept.filter($"grp" === "g").count() == 5)
    assert(kept.filter($"grp" === "h").count() == 4)
    // the ranking window runs over the HISTOGRAM, not documents: its
    // input is the (grp, score) aggregate
    val plan = Sampling.topFractionCutoffs(df, "grp", "score", frac = 0.4)
      .queryExecution.optimizedPlan.toString
    val winIdx = plan.indexOf("Window")
    val aggIdx = plan.indexOf("Aggregate", winIdx)
    assert(winIdx >= 0 && aggIdx > winIdx,
      s"window must sit above the histogram aggregate:\n$plan")
  }
}
