package graft.queue

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dataset maintenance for streaming sinks.
  *
  * Every micro-batch of the capture/enqueue path appends one parquet file
  * per partition (S2's `mode("append")` write) — after a day of 1-second
  * triggers that is ~86k files, and scan planning starts to cost more than
  * scanning. Periodic compaction rewrites a dataset directory into few
  * right-sized files, preserving the partition layout (so the dispatcher's
  * status pruning keeps working). Same snapshot-swap discipline as
  * [[Dispatcher]]: the live directory is renamed aside before the compacted
  * one moves into place, so a crash at any step leaves a complete snapshot
  * restorable at a deterministic path (single maintenance writer; a
  * lakehouse table format — Delta/Iceberg OPTIMIZE — replaces this and
  * closes the remaining not-found window for concurrent readers).
  */
object Maintenance {

  /** Rewrite `dir` into `targetFilesPerPartition` files (per partition dir
    * when `partitionCols` is non-empty). Returns the row count rewritten. */
  def compactParquet(spark: SparkSession, dir: String,
                     partitionCols: Seq[String] = Nil,
                     targetFilesPerPartition: Int = 1): Long = {
    require(targetFilesPerPartition >= 1, "need at least one output file")
    // Heal swap()'s between-renames crash window first: a prior compaction
    // that died there left the live dir missing with the aside present.
    Dispatcher.healAside(Paths.get(dir))
    val df = spark.read.parquet(dir)
    val n = df.count()
    val tmp = dir.stripSuffix("/") + ".compact"
    val repartitioned =
      if (partitionCols.nonEmpty)
        df.repartition(targetFilesPerPartition,
          partitionCols.map(org.apache.spark.sql.functions.col): _*)
      else df.repartition(targetFilesPerPartition)
    val writer = repartitioned.write.mode("overwrite")
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(tmp)
    replaceDir(tmp, dir)
    n
  }

  // Same rename-aside protocol — and the same lock — as Dispatcher.swapDirs,
  // so a concurrent reader's healAside never un-does an in-flight swap.
  // Public: registry migration reuses it for its swap-in step.
  def replaceDir(tmp: String, target: String): Unit = Dispatcher.swapLock.synchronized {
    val t = Paths.get(target)
    val aside = t.resolveSibling("." + t.getFileName.toString + ".old")
    deleteRec(aside)
    val hadOld = Files.exists(t)
    if (hadOld)
      Files.move(t, aside, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    try Files.move(Paths.get(tmp), t, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    catch { case e: Throwable =>
      if (hadOld)
        Files.move(aside, t, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      throw e
    }
    deleteRec(aside)
  }

  private def deleteRec(p: java.nio.file.Path): Unit = if (Files.exists(p)) {
    Files.walk(p).sorted(java.util.Comparator.reverseOrder())
      .forEach(f => Files.delete(f))
  }
}
