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

  private def queueRow(id: String, status: String, dueAt: Long) =
    graft.queue.EventLog.QueueRow(
      id = id, trigger_schema = "public", trigger_table = "t",
      trigger_name = "tr", webhook_url = "http://127.0.0.1:1/hook",
      headers = "{}", payload = "{}", timeout = 10, status = status,
      attempt_count = 0, attempts_time = Seq.empty, attempts_status = Seq.empty,
      attempts_response = Seq.empty,
      next_attempt = new java.sql.Timestamp(dueAt), retry_number = 2,
      retry_interval = 2, retry_backoff = "EXPONENTIAL",
      created_at = new java.sql.Timestamp(dueAt),
      updated_at = new java.sql.Timestamp(dueAt))

  test("dispatcher due scan reads only the PENDING store and pushes next_attempt") {
    val dir = tmp("graft_queue_prune") + "/q"
    val t0 = 1700000000000L
    // terminal history in hive partitions; live PENDING rows via the store
    Seq(queueRow("e2", "DELIVERED", t0), queueRow("e3", "FAILED", t0))
      .toDS().write.partitionBy("status").parquet(dir)
    graft.queue.PendingStore.spool(
      Seq(queueRow("e1", "PENDING", t0), queueRow("e4", "PENDING", t0 + 60000)).toDF(), dir)
    val due = graft.queue.Dispatcher.dueScan(spark, dir, new java.sql.Timestamp(t0))
    val scan = due.queryExecution.executedPlan.toString
    // the scan's file paths live under the .pending store — the terminal
    // status=* partitions are physically outside every path it can touch
    assert(scan.contains(".pending"),
      s"due scan must read through the PENDING store:\n$scan")
    assert(!scan.contains("status=DELIVERED") && !scan.contains("status=FAILED"),
      s"due scan must not reference terminal partitions:\n$scan")
    assert(scan.contains("PushedFilters") && scan.contains("next_attempt"),
      s"next_attempt predicate must push to the parquet reader:\n$scan")
    assert(due.count() == 1)
  }

  test("dispatcher cycle never reads terminal partitions (poisoned DELIVERED ignored)") {
    val dir = tmp("graft_queue_poison") + "/q"
    val t0 = 1700000000000L
    // A delivered row, then its file replaced by garbage: any scan touching
    // status=DELIVERED would throw. The cycle must not.
    Seq(queueRow("e1", "DELIVERED", t0))
      .toDS().write.partitionBy("status").parquet(dir)
    graft.queue.PendingStore.spool(
      Seq(queueRow("e2", "PENDING", t0 + 60000)).toDF(), dir)
    val deliveredDir = java.nio.file.Paths.get(dir, "status=DELIVERED")
    Files.list(deliveredDir).filter(_.getFileName.toString.endsWith(".parquet"))
      .forEach(p => Files.write(p, "not parquet".getBytes))
    // the poison is potent: the full-history reader throws on it
    intercept[Exception] {
      graft.queue.EventLog.read(spark, dir)
        .filter($"status" === "DELIVERED").count()
    }
    val stats = graft.queue.Dispatcher.runOnce(spark, dir,
      now = new java.sql.Timestamp(t0)) // nothing due → no HTTP attempted
    assert(stats.due == 0)
    assert(graft.queue.Dispatcher.hasPending(spark, dir))
    assert(graft.queue.Dispatcher.pendingScan(spark, dir).count() == 1)
  }
}
