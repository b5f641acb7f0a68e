package graft.sources

import graft.SparkTestSession
import graft.queries.TrainingDataQueries
import org.apache.spark.sql.functions.monotonically_increasing_id
import org.scalatest.funsuite.AnyFunSuite

/** [[ShardWriter]]'s file-level contract — the properties q111's SQL
  * manifest cannot observe: how many FILES a shard is, and the physical
  * ROW ORDER inside each one (a trainer streams shard files sequentially;
  * the order on disk IS the schedule). */
class ShardWriterSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"
  private lazy val out = {
    val d = java.nio.file.Files.createTempDirectory("graft_shardwriter").toString
    ShardWriter.writeEpoch(graft.Tables.documents(spark, dir),
      TrainingDataQueries.epochAssignment(spark, dir), d, nshards = 8)
    d
  }

  test("exactly one parquet file per shard — a shard never splits across tasks") {
    val dirs = new java.io.File(out).listFiles.toSeq
      .filter(_.getName.startsWith("shard=")).sortBy(_.getName)
    assert(dirs.map(_.getName).sorted == (0 to 7).map(i => s"shard=$i").sorted)
    dirs.foreach { d =>
      val files = d.listFiles.filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1,
        s"${d.getName}: one file per shard, got ${files.length}")
    }
  }

  test("in-file physical row order is the schedule order") {
    (0 to 7).foreach { sh =>
      val f = new java.io.File(out, s"shard=$sh").listFiles
        .filter(_.getName.endsWith(".parquet")).head
      // one small file → one input partition, so monotonically_increasing_id
      // numbers rows in file order
      val pos = spark.read.parquet(f.toString)
        .withColumn("rid", monotonically_increasing_id())
        .collect().sortBy(_.getAs[Long]("rid"))
        .map(_.getAs[Int]("shard_pos")).toSeq
      assert(pos == (1 to pos.length), s"shard $sh: rows out of schedule order")
    }
  }

  test("a per-shard read prunes to one partition directory") {
    val one = ShardWriter.read(spark, out)
      .filter(org.apache.spark.sql.functions.col("shard") === 3)
    val p = one.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(shard"), p)
    assert(p.contains("= 3)"), p)
    // and the pruned read returns exactly that shard's schedule
    val pos = one.collect().map(_.getAs[Int]("shard_pos")).sorted.toSeq
    assert(pos == (1 to pos.length), "pruned shard must still be complete")
  }

  test("round trip: exactly-once coverage, payload columns intact") {
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    val docs = graft.Tables.documents(spark, dir).select(cols.head, cols.tail: _*)
    val back = ShardWriter.read(spark, out).select(cols.head, cols.tail: _*)
    assert(back.exceptAll(docs).isEmpty, "rows not in the corpus")
    assert(docs.exceptAll(back).isEmpty, "corpus rows missing from the store")
  }

  test("bucketed payload: the write's join erases the payload-side exchange") {
    val docs = graft.Tables.documents(spark, dir)
      .select("doc_id", "text", "n_chars")
    BucketedCorpus.write(docs, "graft_shard_payload")
    // disable auto-broadcast so the plan exercises the production shape:
    // both sides corpus-scale, SortMergeJoin, bucketing must erase the
    // payload shuffle (the BucketedCorpusSpec rationale)
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      def nExchanges(payload: org.apache.spark.sql.DataFrame): Int =
        "Exchange".r.findAllIn(ShardWriter.sharded(payload,
          TrainingDataQueries.epochAssignment(spark, dir), nshards = 8)
          .queryExecution.executedPlan.toString).length
      val bucketedPlan = ShardWriter.sharded(
        BucketedCorpus.read(spark, "graft_shard_payload"),
        TrainingDataQueries.epochAssignment(spark, dir), nshards = 8)
        .queryExecution.executedPlan.toString
      assert(bucketedPlan.contains("Bucketed: true"), bucketedPlan)
      assert("Exchange".r.findAllIn(bucketedPlan).length == nExchanges(docs) - 1,
        s"the bucketed payload must shed exactly its own join shuffle:\n$bucketedPlan")
    } finally {
      spark.conf.set(key, prev)
      spark.sql("DROP TABLE IF EXISTS graft_shard_payload")
    }
  }

  test("write plan: shard-clustered exchange, per-task sorts only, no global sort") {
    val p = ShardWriter.sharded(graft.Tables.documents(spark, dir),
      TrainingDataQueries.epochAssignment(spark, dir), nshards = 8)
      .queryExecution.executedPlan.toString
    assert(p.contains("hashpartitioning(shard"), p)
    // executedPlan prints global sorts as "Sort [...], true, 0"
    assert(!p.contains("], true, 0"), p)
  }

  test("layoutFor keys the store on (sfDir, assignmentId, nshards)") {
    val docs = graft.Tables.documents(spark, dir)
    val asg = TrainingDataQueries.epochAssignment(spark, dir)
    val base = ShardWriter.layoutFor(spark, dir, docs, asg, nshards = 8,
      assignmentId = "epoch3")
    // same key → same dir, and the memo skips the rewrite (mtime unchanged)
    val mtime0 = new java.io.File(base, "_SUCCESS").lastModified
    assert(ShardWriter.layoutFor(spark, dir, docs, asg, nshards = 8,
      assignmentId = "epoch3") == base)
    assert(new java.io.File(base, "_SUCCESS").lastModified == mtime0)
    // a different epoch or shard count must NOT reuse this store
    val otherEpoch = ShardWriter.layoutFor(spark, dir, docs, asg, nshards = 8,
      assignmentId = "epoch4")
    val otherShards = ShardWriter.layoutFor(spark, dir, docs, asg, nshards = 4,
      assignmentId = "epoch3")
    assert(otherEpoch != base && otherShards != base && otherEpoch != otherShards)
    // each distinct key got its own completed write (shard values still
    // come from the ASSIGNMENT — writeEpoch's nshards only sizes tasks)
    Seq(otherEpoch, otherShards).foreach(d =>
      assert(new java.io.File(d, "_SUCCESS").exists, d))
  }
}
