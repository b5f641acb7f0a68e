package graft.queue

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import graft.queue.EventLog.QueueRow
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned, manifest-committed store for the queue's PENDING set.
  *
  * The reference gets queue atomicity from Postgres MVCC — enqueue commits
  * with the user's transaction and the worker's scan sees a consistent
  * snapshot (`cdc_webhook--1.0.sql:296-324`). Plain hive-partitioned parquet
  * cannot give concurrent readers that: the previous layout snapshot-swapped
  * `status=PENDING` with a pair of directory renames, and a reader poll
  * racing the swap could list files the swap had just invalidated (it had to
  * retry). This store closes that window the way lakehouse table formats do,
  * scaled down to one moving part: every reader-visible state transition is
  * ONE atomic rename of ONE small manifest file.
  *
  * Layout, all under `queueDir/.pending/` (dot-prefixed, so the hive reader
  * of the terminal `status=*` partitions never lists it):
  *
  *   inbox/<uuid>/   enqueue spools — written to a dot-prefixed temp dir and
  *                   atomically renamed in, so they are complete-on-arrival;
  *                   immutable once visible
  *   v<N>/           snapshot N of the pending rows (not-yet-due ∪
  *                   rescheduled), written once by the cycle that created it
  *   _current        the manifest: one line with the live snapshot version,
  *                   then one line per inbox dir that snapshot has already
  *                   absorbed ("consumed")
  *
  * Readers resolve `_current` once, then read snapshot ∪ (inbox ∖ consumed)
  * — two immutable file sets. The manifest-then-inbox order means a flip
  * racing a reader yields a CONSISTENT older state, never a doubled row
  * (the reverse order could see an inbox spool and the snapshot that
  * absorbed it). No reader retry loop exists or is needed.
  *
  * Enqueue never coordinates with the dispatcher at all: a spool landing
  * mid-cycle is not in the cycle's captured dir list, so it simply becomes
  * next cycle's work — the rename-swap layout could lose an enqueue that
  * raced the swap's rewrite.
  *
  * Crash heal is "ignore unreferenced dirs + GC": a commit that dies before
  * its manifest flip leaves an orphan `v<N>` the manifest never points to
  * (the next commit overwrites it); one that dies after the flip leaves
  * stale dirs the next commit's GC sweeps; an enqueue that dies mid-write
  * leaves a dot-prefixed `.spool-*` temp that the stale sweep removes once
  * it is demonstrably dead (no mtime progress past the grace). There is no
  * state a restart must repair before reading — the manifest is always
  * either the old or the new one.
  *
  * Retention grace: a commit keeps its predecessor snapshot, and inbox GC
  * runs only AFTER the manifest flip — so the dirs being deleted were
  * absorbed by the PREVIOUS snapshot and only a reader two or more flips
  * stale could still reference them. Deletion is tombstone-renamed first
  * (one atomic rename removes the dir from every listing) so even such a
  * reader sees the whole spool or none of it, never a partial file set.
  * Readers more than one flip stale read with `ignoreMissingFiles` and may
  * observe an older-but-consistent state — they are polls by construction.
  * Single dispatcher writer per queue, as before (a lakehouse table format
  * with optimistic concurrency is the multi-writer upgrade path).
  *
  * Durability model: the manifest temp file is fsynced and the `.pending`
  * directory is fsynced after the commit rename, so the flip itself survives
  * power loss, not just process kills. The parquet data files beneath it are
  * as durable as Spark's committer + the filesystem make them — on a
  * power-fail-strict deployment the store belongs on a filesystem ordering
  * data writes before the rename (ext4 default), same as every lakehouse
  * manifest design.
  */
object PendingStore {

  /** `version` = live snapshot number (0 = none yet); `consumed` = inbox
    * dirs whose rows snapshot `version` already absorbed. */
  final case class Manifest(version: Long, consumed: Seq[String])

  /** A point-in-time view: the manifest plus the non-consumed inbox dirs
    * captured by name. One capture feeds a whole dispatcher cycle — scan,
    * rewrite, and commit all agree on exactly which files are "the batch". */
  final case class Capture(manifest: Manifest, inbox: Seq[String])

  private def root(queueDir: String): Path = Paths.get(queueDir, ".pending")
  private def inboxRoot(queueDir: String): Path = root(queueDir).resolve("inbox")
  private def versionDir(queueDir: String, v: Long): Path =
    root(queueDir).resolve(s"v$v")
  private def manifestPath(queueDir: String): Path = root(queueDir).resolve("_current")

  def manifest(queueDir: String): Manifest = {
    val p = manifestPath(queueDir)
    if (!Files.exists(p)) Manifest(0L, Nil)
    else {
      val lines = Files.readAllLines(p)
      Manifest(lines.get(0).trim.toLong,
        (1 until lines.size()).map(lines.get(_).trim).filter(_.nonEmpty).toSeq)
    }
  }

  def listInbox(queueDir: String): Seq[String] = {
    val d = inboxRoot(queueDir)
    if (!Files.exists(d)) Nil
    else {
      val s = Files.list(d)
      try {
        val it = s.iterator(); val b = Seq.newBuilder[String]
        while (it.hasNext) {
          val n = it.next().getFileName.toString
          if (!n.startsWith(".")) b += n
        }
        b.result().sorted
      } finally s.close()
    }
  }

  def capture(queueDir: String): Capture = {
    val m = manifest(queueDir)
    Capture(m, listInbox(queueDir).filterNot(m.consumed.toSet))
  }

  /** Atomic enqueue: write the rows to a hidden temp dir, then one rename
    * makes the complete spool visible. Concurrent spools use distinct
    * uuids; nothing contends. */
  def spool(rows: DataFrame, queueDir: String): Unit = {
    Files.createDirectories(inboxRoot(queueDir))
    val name = java.util.UUID.randomUUID().toString
    val tmp = root(queueDir).resolve(".spool-" + name)
    rows.write.mode("overwrite").parquet(tmp.toString)
    Files.move(tmp, inboxRoot(queueDir).resolve(name), StandardCopyOption.ATOMIC_MOVE)
  }

  /** The live PENDING set as of a fresh capture. */
  def read(spark: SparkSession, queueDir: String): DataFrame =
    readAt(spark, queueDir, capture(queueDir))

  /** The PENDING set a given capture saw: snapshot ∪ captured inbox, schema
    * supplied explicitly (no footer inference). `ignoreMissingFiles` covers
    * readers more than one flip stale whose files GC already swept. */
  def readAt(spark: SparkSession, queueDir: String, snap: Capture): DataFrame = {
    val schema = org.apache.spark.sql.Encoders.product[QueueRow].schema
    val paths =
      (if (snap.manifest.version > 0L) Seq(versionDir(queueDir, snap.manifest.version))
       else Nil) ++ snap.inbox.map(inboxRoot(queueDir).resolve)
    val existing = paths.filter(Files.exists(_)).map(_.toString)
    if (existing.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else
      spark.read.schema(schema).option("ignoreMissingFiles", "true")
        .parquet(existing: _*)
  }

  /** Commit `newPending` as the next snapshot and retire the capture's inbox
    * dirs. The only reader-visible instant is step 2's single-file rename;
    * every other step touches dirs no live manifest references.
    *
    * `onStep` is a test seam: PendingStoreSpec kills the writer after each
    * step and asserts readers never observe a missing or doubled row.
    *
    *   1. write `v<N+1>` beside the live snapshot (mode=overwrite sweeps the
    *      orphan a predecessor's crash may have left at the same number);
    *   2. flip `_current` — THE commit point, one atomic rename; the new
    *      manifest consumes this capture's inbox plus every previously
    *      consumed dir that still exists (a failed GC keeps its name alive
    *      so it stays excluded until it is actually gone);
    *   3. GC the previous manifest's consumed inbox dirs — post-flip, they
    *      are referenced only by manifests two or more flips stale, outside
    *      the retention grace. Each dir is tombstone-renamed (atomic
    *      disappearance from listings) before its contents are deleted, so
    *      no lister can observe a partially-deleted spool;
    *   4. GC snapshots, keeping the new one and its predecessor (the
    *      one-flip reader grace), then sweep demonstrably-dead enqueue
    *      temps (`.spool-*` / `._current.tmp` with no mtime progress past
    *      `staleGraceMs` — a live spool writer touches its files constantly).
    */
  def commit(newPending: DataFrame, queueDir: String, snap: Capture,
             onStep: String => Unit = _ => (),
             staleGraceMs: Long = 15 * 60 * 1000L): Unit = {
    val prev = snap.manifest
    val vNew = prev.version + 1
    newPending.write.mode("overwrite").parquet(versionDir(queueDir, vNew).toString)
    onStep("snapshot-written")
    val carried = prev.consumed.filter(n => Files.exists(inboxRoot(queueDir).resolve(n)))
    writeManifest(queueDir, Manifest(vNew, (snap.inbox ++ carried).distinct))
    onStep("manifest-flipped")
    sweepTombstones(queueDir) // a crashed step-3 leaves '.<name>.gc' dirs; clear first
    carried.foreach(gcInboxDir(queueDir, _))
    onStep("inbox-gc")
    val keep = Set(s"v$vNew", s"v${prev.version}")
    listVersionDirs(queueDir).filterNot(keep).foreach { n =>
      try deleteRec(root(queueDir).resolve(n))
      catch { case _: java.io.IOException => () }
    }
    onStep("versions-gc")
    sweepStaleTemps(queueDir, staleGraceMs)
  }

  /** Tombstone-then-delete an inbox dir: the rename removes it from every
    * directory listing in one atomic step, so a reader that lists the inbox
    * mid-GC sees the whole spool or none of it — never the partial file set
    * a file-by-file delete exposes. Contents are deleted from the hidden
    * tombstone afterwards. */
  private def gcInboxDir(queueDir: String, name: String): Unit = {
    val d = inboxRoot(queueDir).resolve(name)
    if (Files.exists(d)) {
      val tomb = inboxRoot(queueDir).resolve("." + name + ".gc")
      try {
        Files.move(d, tomb, StandardCopyOption.ATOMIC_MOVE)
        deleteRec(tomb)
      } catch { case _: java.io.IOException => () } // stays carried; retried next commit
    }
  }

  /** Remove tombstones a crashed GC left behind (dot-prefixed, so they were
    * never reader-visible). */
  private def sweepTombstones(queueDir: String): Unit = {
    val d = inboxRoot(queueDir)
    if (Files.exists(d)) {
      val s = Files.list(d)
      try {
        val it = s.iterator()
        while (it.hasNext) {
          val p = it.next()
          val n = p.getFileName.toString
          if (n.startsWith(".") && n.endsWith(".gc"))
            try deleteRec(p) catch { case _: java.io.IOException => () }
        }
      } finally s.close()
    }
  }

  /** Sweep enqueue temps whose writer is demonstrably dead: a `.spool-*`
    * dir (crash between parquet write and the visibility rename) or a
    * `._current.tmp` (crash between manifest write and flip) with no mtime
    * progress anywhere in its tree for `graceMs`. A live spool writer
    * touches its task files continuously, so mtime staleness — not mere
    * existence — is the death signal; without this sweep a crashed enqueue
    * leaks its temp dir forever. */
  private def sweepStaleTemps(queueDir: String, graceMs: Long): Unit = {
    val r = root(queueDir)
    if (!Files.exists(r)) return
    val cutoff = System.currentTimeMillis() - graceMs
    val s = Files.list(r)
    try {
      val it = s.iterator()
      while (it.hasNext) {
        val p = it.next()
        val n = p.getFileName.toString
        if (n.startsWith(".spool-") || n == "._current.tmp") {
          val newest =
            try {
              val w = Files.walk(p)
              try w.mapToLong(f => Files.getLastModifiedTime(f).toMillis).max.orElse(0L)
              finally w.close()
            } catch { case _: java.io.IOException => Long.MaxValue } // racing writer: skip
          if (newest < cutoff)
            try deleteRec(p) catch { case _: java.io.IOException => () }
        }
      }
    } finally s.close()
  }

  /** Write-then-rename with real durability: the temp file's channel is
    * forced before the rename and the `.pending` directory is forced after
    * it, so the flip survives power loss, not just process kills. The
    * directory force is best-effort (some filesystems refuse directory
    * handles); on the tested platform it maps to fsync(2) of the dirent. */
  private def writeManifest(queueDir: String, m: Manifest): Unit = {
    import java.nio.file.StandardOpenOption._
    val tmp = root(queueDir).resolve("._current.tmp")
    val bytes = (m.version.toString +: m.consumed).mkString("\n").getBytes
    val ch = java.nio.channels.FileChannel.open(tmp, CREATE, WRITE, TRUNCATE_EXISTING)
    try { ch.write(java.nio.ByteBuffer.wrap(bytes)); ch.force(true) } finally ch.close()
    Files.move(tmp, manifestPath(queueDir), StandardCopyOption.ATOMIC_MOVE)
    try {
      val dch = java.nio.channels.FileChannel.open(root(queueDir), READ)
      try dch.force(true) finally dch.close()
    } catch { case _: java.io.IOException => () }
  }

  private def listVersionDirs(queueDir: String): Seq[String] = {
    val r = root(queueDir)
    if (!Files.exists(r)) Nil
    else {
      val s = Files.list(r)
      try {
        val it = s.iterator(); val b = Seq.newBuilder[String]
        while (it.hasNext) {
          val n = it.next().getFileName.toString
          if (n.matches("v\\d+")) b += n
        }
        b.result()
      } finally s.close()
    }
  }

  private def deleteRec(p: Path): Unit = if (Files.exists(p)) {
    Files.walk(p).sorted(java.util.Comparator.reverseOrder())
      .forEach(f => Files.delete(f))
  }
}
