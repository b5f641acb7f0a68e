package graft.queue

import java.nio.file.Files

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class MaintenanceSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def parquetFiles(dir: String): Seq[java.nio.file.Path] = {
    val p = java.nio.file.Paths.get(dir)
    val it = Files.walk(p).iterator()
    val out = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
    while (it.hasNext) { val f = it.next(); if (f.toString.endsWith(".parquet")) out += f }
    out.toSeq
  }

  test("compaction shrinks the file count and preserves rows + layout") {
    val dir = Files.createTempDirectory("graft_compact").toString + "/q"
    // simulate many micro-batch appends: 3 writes x 8 partitions
    (1 to 3).foreach { b =>
      (1 to 400).map(i => (s"e$b-$i", if (i % 2 == 0) "PENDING" else "DELIVERED"))
        .toDF("event_id", "status")
        .repartition(8).write.mode("append").partitionBy("status").parquet(dir)
    }
    val before = parquetFiles(dir).size
    val rows = Maintenance.compactParquet(spark, dir,
      partitionCols = Seq("status"), targetFilesPerPartition = 1)
    val after = parquetFiles(dir).size
    assert(rows == 1200)
    assert(before > 8 && after <= 2, s"files before=$before after=$after")
    val re = spark.read.parquet(dir)
    assert(re.count() == 1200)
    // partition layout survives → status pruning still works
    val scan = re.filter($"status" === "PENDING").queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("PENDING"))
    assert(re.filter($"status" === "PENDING").count() == 600)
  }

  test("compacting one hive partition never exposes its staging dir to the parent scan") {
    // StreamingDispatcher compacts terminal partitions IN PLACE under the
    // queueDir: the staging rewrite must be invisible to hive partition
    // discovery over queueDir, or concurrent EventLog reads see doubled
    // history rows under a bogus 'status=DELIVERED.compact' partition.
    val qdir = Files.createTempDirectory("graft_compact_part").toString + "/q"
    Seq(("e1", "ok"), ("e2", "ok")).toDF("event_id", "body")
      .write.parquet(qdir + "/status=DELIVERED")
    Seq(("e3", "ok")).toDF("event_id", "body")
      .write.parquet(qdir + "/status=PENDING")
    // crashed-compaction leftover at the staging path (worst case: doubled rows)
    val p = java.nio.file.Paths.get(qdir + "/status=DELIVERED")
    val staging = p.resolveSibling("." + p.getFileName.toString + ".compact")
    Seq(("e1", "ok"), ("e1", "ok"), ("e2", "ok"), ("e2", "ok"))
      .toDF("event_id", "body").write.parquet(staging.toString)
    val seen = spark.read.parquet(qdir)
    assert(seen.count() == 3, "dot-prefixed staging dir must be invisible")
    assert(seen.select("status").distinct().as[String].collect().toSet ==
      Set("DELIVERED", "PENDING"))
    // a re-run compaction overwrites the leftover and swaps in cleanly
    val rows = Maintenance.compactParquet(spark, qdir + "/status=DELIVERED")
    assert(rows == 2)
    assert(spark.read.parquet(qdir).count() == 3)
    assert(!Files.exists(staging), "staging dir must be consumed by the swap")
  }

  test("compaction heals a crash between its swap renames (aside restored)") {
    val dir = Files.createTempDirectory("graft_compact_heal").toString + "/q"
    (1 to 100).map(i => (s"e$i", i)).toDF("event_id", "n")
      .repartition(4).write.parquet(dir)
    // inject the between-renames crash state: live dir moved aside, no
    // replacement in place
    val p = java.nio.file.Paths.get(dir)
    val aside = p.resolveSibling("." + p.getFileName.toString + ".old")
    Files.move(p, aside, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    val rows = Maintenance.compactParquet(spark, dir)
    assert(rows == 100, "healed compaction must see all pre-crash rows")
    assert(!Files.exists(aside) && Files.exists(p))
    assert(spark.read.parquet(dir).count() == 100)
  }
}
