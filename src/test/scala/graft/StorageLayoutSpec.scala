package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-layout techniques that carry the engine to cluster scale:
  * bucketing (co-located fact⋈fact joins with no exchange — the Spark
  * analog of the reference's indexed queue scans, SURVEY §4) and partition
  * pruning (the `event_log` dispatcher reads only the PENDING partition).
  */
class StorageLayoutSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  test("matching bucketed tables sort-merge join with zero shuffle exchanges") {
    val d = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
    Tables.orders(spark, d).write
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", tmp("graft_bkt_o")).saveAsTable("orders_b")
    Tables.customer(spark, d).write
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .option("path", tmp("graft_bkt_c")).saveAsTable("customer_b")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val j = spark.table("orders_b")
        .join(spark.table("customer_b"), $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment").count()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      // bucketing co-locates both sides: the only exchange is the tiny
      // post-aggregation one, never on the join keys
      assert(!plan.contains("hashpartitioning(o_custkey") &&
        !plan.contains("hashpartitioning(c_custkey"),
        s"join must not re-shuffle bucketed sides:\n$plan")
      assert(j.collect().map(_.getLong(1)).sum == Tables.orders(spark, d).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  test("hive-partitioned layout prunes partitions at scan time") {
    val dir = tmp("graft_part")
    val d = "/root/testdata/sf0.001"
    Tables.events(spark, d).write.partitionBy("event_type").parquet(s"$dir/events")
    val clicks = spark.read.parquet(s"$dir/events")
      .filter($"event_type" === "click")
    val scan = clicks.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("event_type"),
      s"filter must prune partitions, not scan+filter:\n$scan")
    assert(clicks.count() ==
      Tables.events(spark, d).filter($"event_type" === "click").count())
  }

  test("status-partitioned queue layout: dispatcher scan touches only PENDING") {
    val dir = tmp("graft_queue")
    Seq(("e1", "PENDING"), ("e2", "DELIVERED"), ("e3", "PENDING"), ("e4", "FAILED"))
      .toDF("event_id", "status")
      .write.partitionBy("status").parquet(s"$dir/q")
    val due = spark.read.parquet(s"$dir/q").filter($"status" === "PENDING")
    val scan = due.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("PENDING"))
    assert(due.count() == 2)
  }
}
