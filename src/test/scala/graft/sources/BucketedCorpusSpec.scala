package graft.sources

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bucketed layout's contract: a doc_id join between two tables
  * bucketed the same way plans with ZERO shuffle exchanges (the corpus
  * shuffles once at write time, not once per query), and the data round
  * trips exactly. */
class BucketedCorpusSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("same-bucketing join plans without an exchange; data round trips") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"lang", $"n_chars")
    val enrich = docs.select($"doc_id", ($"n_chars" * 2).as("weight"))
    BucketedCorpus.write(docs, "graft_bkt_docs")
    BucketedCorpus.write(enrich, "graft_bkt_enrich")
    // disable auto-broadcast: at test scale the enrich side is tiny and
    // Spark would broadcast it (fine, but then nothing exercises the
    // bucketing); the production case this layout exists for is two
    // CORPUS-sized sides, where the planner picks SortMergeJoin and the
    // bucket metadata must erase both exchanges
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val joined = BucketedCorpus.read(spark, "graft_bkt_docs")
        .join(BucketedCorpus.read(spark, "graft_bkt_enrich"), "doc_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"),
        s"a co-bucketed join must not shuffle either side:\n$plan")
      // values survive the bucketed round trip exactly
      val n = docs.count()
      assert(joined.count() == n)
      assert(joined.filter($"weight" =!= $"n_chars" * 2).count() == 0)
    } finally {
      spark.conf.set(key, prev)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_docs")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_enrich")
    }
  }

  test("mismatched bucket counts fall back to a correct (shuffled) join") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"lang")
    BucketedCorpus.write(docs, "graft_bkt_a", buckets = 16)
    BucketedCorpus.write(docs.select($"doc_id"), "graft_bkt_b", buckets = 8)
    try {
      val joined = BucketedCorpus.read(spark, "graft_bkt_a")
        .join(BucketedCorpus.read(spark, "graft_bkt_b"), "doc_id")
      assert(joined.count() == docs.count(), "correctness never depends on layout")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    }
  }
}
