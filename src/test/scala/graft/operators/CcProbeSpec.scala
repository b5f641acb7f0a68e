package graft.operators
import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
class CcProbeSpec extends AnyFunSuite with SparkTestSession {
  test("probe q88 rounds") {
    val dir = "/root/testdata/sf0.1"
    val pairs = graft.queries.SharedStages.nearDupPairs(spark, dir)
      .select(org.apache.spark.sql.functions.col("vec_a").as("doc_a"),
        org.apache.spark.sql.functions.col("vec_b").as("doc_b")).cache()
    println("EDGES=" + pairs.count())
    val docs = graft.Tables.embeddings(spark, dir)
      .select(org.apache.spark.sql.functions.col("vec_id").as("doc_id"))
    val t0 = System.nanoTime()
    val (labels, rounds) = Dedup.clusterPairsWithRounds(docs, pairs, "doc_id")
    labels.write.format("noop").mode("overwrite").save()
    println(f"ROUNDS=$rounds TIME=${(System.nanoTime()-t0)/1e9}%.2f")
  }
}
