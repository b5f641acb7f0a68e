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
}
