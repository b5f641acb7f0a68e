package graft.sources

import graft.operators.{Retrieval, TextAnalysis}
import graft.streaming.{IncrementalContainment, RegistryIO}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Persisted inverted index (postings store) — the SPARSE serving twin of
  * [[IvfIndexStore]]: [[graft.operators.Retrieval.bm25TopK]] must
  * re-tokenize the corpus on every query (fine inside one job; useless as
  * a serving artifact), while here the build cost is paid once and a
  * query's read is bounded by the LAYOUT. EXT surface: the reference has
  * no retrieval (its core is CDC/webhook plumbing —
  * `/root/reference/src/cdc_webhook.c:153`).
  *
  * Layout (the occurrence-registry discipline of
  * [[graft.streaming.IncrementalContainment]], carried over terms):
  *
  *   - `ingest_batch=N/tbucket=B/` — postings `(tok, doc_id, tf, dl)`,
  *     one row per distinct (document, term), hive-partitioned by the
  *     term fingerprint's first hex byte (256 buckets) under the batch,
  *     files SORTED by `tok` so a pushed `In(tok, …)` prunes at
  *     ROW-GROUP level on footer stats (no parquet bloom filters, for
  *     the measured reasons on `IncrementalContainment.writeOccurrences`).
  *     The document's token count `dl` is DENORMALIZED onto every posting
  *     — BM25's length normalization needs no corpus-sized doc-length
  *     join at serve time, exactly as the containment registry
  *     denormalizes `set_size`.
  *   - `_stats/ingest_batch=N/` — ONE `(n_docs, total_len)` row per
  *     batch (underscore-prefixed: invisible to postings scans). Serving
  *     sums this KB-scale relation for N and avgdl; a replayed batch
  *     OVERWRITES its own row, so corpus stats are derived state that
  *     cannot drift — the
  *     [[graft.streaming.IncrementalQualityCut]] rollup rule.
  *   - `_compacted_through` — highest batch id folded by [[compact]];
  *     [[appendBatch]] REFUSES a batch at or below it (loud, not a
  *     silent double count — see the compaction contract below).
  *
  * Per-term document frequency is deliberately NOT a stored aggregate:
  * serving counts df from the probed postings themselves — exact under
  * append, erasure, and compaction, with nothing to reconcile.
  *
  * Why this is the 100 TB shape: a query for `t` terms reads
  * ≤ `t` of 256 term buckets (partition filter) and, within them,
  * row groups whose sorted key range covers a query term (pushed In) —
  * I/O is O(matched postings + footers), never the corpus. Stats is one
  * KB-scale scan. The only corpus-keyed shuffle in serving is the
  * per-document sum over matched postings, bounded by the query terms'
  * df. [[compact]] bounds the footer tier (batches fold into one).
  *
  * Replay/maintenance contract: [[appendBatch]] is idempotent (a
  * replayed micro-batch overwrites its own `ingest_batch=N` subtree and
  * `_stats` row). A batch folded by [[compact]] is refused on replay
  * rather than double-counted — compaction inside a live `foreachBatch`
  * is safe only AFTER the sink's checkpoint commits, so [[sink]]'s
  * `compactEvery` documents that the post-crash replay of a
  * just-compacted batch fails loudly for the operator to resolve (the
  * store itself is intact and correct). A torn append (postings
  * written, crash before stats) is detected at serve time by the
  * batch-set equality gate, not served silently.
  *
  * Crash-window discipline (every window is HEALED or LOUD, never a
  * silent wrong answer):
  *
  *   - the whole-root swap ([[compact]]) and every leaf swap share
  *     `replaceDir`'s one non-atomic window; every public face heals
  *     the root aside on entry (`Maintenance.healAside`), and a crashed
  *     erase's leaf/stats asides heal in its recovery pass;
  *   - [[deleteDocs]] tombstones first, then stages an `_erase_inflight`
  *     marker recording the ids and touched leaves BEFORE any rewrite,
  *     and removes it last; serving and compaction REFUSE while it
  *     exists, and the next [[deleteDocs]] call COMPLETES the recorded
  *     erase first (heals asides, replays the leaf rewrites, recomputes
  *     the touched batches' stats rows from their surviving postings —
  *     exact by construction, so a crash between a batch's leaf rewrites
  *     and its stats rewrite can never leave drifted corpus stats);
  *   - erased ids land in a `_erased/` TOMBSTONE registry consulted by
  *     every append: an upstream replay of a pre-erase batch re-registers
  *     only the survivors, so a checkpoint replay cannot resurrect a
  *     takedown. This is deliberately stronger than the dedup
  *     registries' "novel again" erase semantics
  *     ([[graft.streaming.IncrementalContainment.deleteDocs]]): a
  *     SERVING store must not let a replay undo a legal takedown, so
  *     the tombstones filter every future append until the takedown is
  *     lifted by clearing `_erased/`. The tombstone set is
  *     takedown-request-sized by contract, broadcast-joined at append.
  */
object PostingsStore {

  private val postingsSchema: StructType = StructType.fromDDL(
    "tok STRING, doc_id BIGINT, tf BIGINT, dl BIGINT, " +
      "ingest_batch BIGINT, tbucket INT")

  private val statsSchema: StructType = StructType.fromDDL(
    "n_docs BIGINT, total_len BIGINT, ingest_batch BIGINT")

  /** Term bucket: first hex byte of md5(tok), 0..255 — a pure function
    * of the probe key, so pruning never drops a match (the
    * [[graft.streaming.IncrementalContainment]] bucketing). */
  private def bucketCol(tok: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(tok), 1, 2), 16, 10).cast("int")

  /** Driver-side twin of [[bucketCol]] for query terms. */
  private[graft] def bucketOf(term: String): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(term.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d(0) & 0xff
  }

  /** Bulk build — batch -1 of the layout [[appendBatch]] appends into
    * (streaming batch ids start at 0, the [[IvfIndexStore.build]]
    * convention), so no append can collide with it. */
  def build(docs: DataFrame, dir: String,
            idCol: String = "doc_id", textCol: String = "text"): Unit = {
    require(!RegistryIO.hasData(dir, Some("ingest_batch=")),
      s"postings store at $dir already has data - append or compact instead")
    writeBatch(docs, dir, -1L, idCol, textCol)
  }

  /** One micro-batch append: postings under `ingest_batch=N/tbucket=B`
    * (key-sorted files), then the batch's `_stats` row. Overwrite of the
    * batch's own subtrees makes replay idempotent; the write ORDER makes
    * a crash window detectable (postings without stats fails the serve
    * gate loudly; stats are never written first, so an overcount is
    * impossible). Refuses a batch id at or below the compaction
    * watermark — a replayed already-folded batch must not double its
    * documents' postings. */
  def appendBatch(docs: DataFrame, dir: String, batchId: Long,
                  idCol: String = "doc_id", textCol: String = "text"): Unit = {
    require(batchId >= 0, "appendBatch: batch ids are >= 0 (build uses -1)")
    graft.queue.Maintenance.healAside(java.nio.file.Paths.get(dir))
    require(batchId > compactedThrough(dir),
      s"postings store at $dir: batch $batchId was already folded by " +
        "compact() - replaying it would double-count its documents; " +
        "resolve the stream checkpoint instead")
    writeBatch(docs, dir, batchId, idCol, textCol)
  }

  private val ErasedDir = "/_erased"

  /** The takedown tombstone registry: one `doc_id` row per erased id
    * (duplicates from a re-run recovery are harmless — consumers read it
    * distinct). See the crash-window discipline in the object scaladoc
    * for why appends consult it. */
  private[sources] def erasedIds(spark: SparkSession, dir: String): DataFrame =
    RegistryIO.readOrEmpty(spark, dir.stripSuffix("/") + ErasedDir,
      StructType.fromDDL("doc_id BIGINT"), None).distinct()

  private def writeBatch(docs: DataFrame, dir: String, batchId: Long,
                         idCol: String, textCol: String): Unit = {
    // the tombstone gate: a replayed pre-erase batch re-registers only
    // the survivors (takedown-request-sized broadcast by contract)
    val live = docs.join(
      broadcast(erasedIds(docs.sparkSession, dir)
        .withColumnRenamed("doc_id", idCol + "__erased")),
      docs(idCol).cast("long") === col(idCol + "__erased"), "left_anti")
    val toks = live.dropDuplicates(idCol)
      .select(col(idCol).cast("long").as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    toks.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      .join(dl, "doc_id")
      .select(col("tok"), col("doc_id"), col("tf"), col("dl"),
        bucketCol(col("tok")).as("tbucket"))
      .repartition(col("tbucket"))
      .sortWithinPartitions(col("tbucket"), col("tok"))
      .write.mode(SaveMode.Overwrite).partitionBy("tbucket")
      .parquet(s"${dir.stripSuffix("/")}/ingest_batch=$batchId")
    dl.agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("dl")), lit(0L)).as("total_len"))
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"${dir.stripSuffix("/")}/_stats/ingest_batch=$batchId")
  }

  /** The postings relation (explicit schema — [[RegistryIO]] rules). */
  private[sources] def readPostings(spark: SparkSession, dir: String): DataFrame =
    RegistryIO.readOrEmpty(spark, dir, postingsSchema, Some("ingest_batch="))

  private[sources] def readStats(spark: SparkSession, dir: String): DataFrame =
    RegistryIO.readOrEmpty(spark, dir.stripSuffix("/") + "/_stats",
      statsSchema, Some("ingest_batch="))

  /** The probe scan, pre-aggregation — package-private so the spec can
    * pin its PLAN: `tbucket` literals in PartitionFilters (≤ |terms| of
    * 256 buckets) and the key set as an `In(tok, …)` of eq leaves in
    * PushedFilters (row-group tier over the key-sorted files). */
  private[sources] def probe(spark: SparkSession, dir: String,
                             terms: Seq[String]): DataFrame = {
    val buckets = terms.map(bucketOf).distinct
    readPostings(spark, dir)
      .filter(col("tbucket").isInCollection(buckets) &&
        col("tok").isInCollection(terms))
      .select(col("tok"), col("doc_id"), col("tf"), col("dl"))
  }

  /** BM25 top-k served from the store: identical output to
    * [[graft.operators.Retrieval.bm25TopK]] over the same corpus — same
    * shared scorer expression ([[Retrieval.bm25ContribQ]]), df counted
    * exactly from the probed postings, N/avgdl from the `_stats` sum —
    * but the corpus read is the pruned probe above instead of a
    * tokenization pass. q126 hash-gates the equality end to end. */
  def bm25TopK(spark: SparkSession, dir: String, terms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 serve: empty query-term list")
    require(k >= 1, "bm25 serve: k must be positive")
    Retrieval.bm25Rank(
      servingScored(spark, dir, terms, k1, b)
        .select(col("doc_id"), col("contrib_q")),
      k)
  }

  /** The ONE serving assembly the single and batched serves share (the
    * `Retrieval.bm25ContribQ` rule one level up — the two read paths
    * must not drift apart): consistency gate, the pruned probe over
    * `terms` (one snapshot feeds the df count and the scorer; parquet's
    * In pushdown must not rewrite the key set to a useless min/max range
    * past the default threshold — the containment-probe rule), per-term
    * df counted from the matched postings, the KB-scale stats sum.
    * Returns `(tok, doc_id, contrib_q)`. */
  private def servingScored(spark: SparkSession, dir: String,
                            terms: Seq[String], k1: Double,
                            b: Double): DataFrame = {
    checkConsistent(dir)
    val matched = IncrementalContainment.withInPushdown(
      spark, math.max(terms.size, 10)) {
      probe(spark, dir, terms).localCheckpoint(true)
    }
    val dfs = matched.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val stats = readStats(spark, dir)
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("total_len")).as("total_len"))
    matched.join(broadcast(dfs), "tok")
      .crossJoin(broadcast(stats))
      .select(col("tok"), col("doc_id"),
        Retrieval.bm25ContribQ(k1, b).as("contrib_q"))
  }

  /** BATCHED BM25 serving — the [[IvfIndexStore.topKBatch]] shape for the
    * sparse store: a request batch of `(query_id, term)` rows (driver-side
    * payload by contract) answered from ONE probe over the UNION of the
    * queries' terms. Per-term df and the corpus stats are computed once
    * and shared across queries; per-query scoring joins the broadcast
    * request relation, so a document scores for exactly the queries whose
    * terms it matched; per-query top-k is a rank window over the matched
    * postings (bounded by the union terms' df). Output:
    * `(query_id, rnk, doc_id, n_terms_hit, bm25_q)`. */
  def bm25TopKBatch(spark: SparkSession, dir: String, queries: DataFrame,
                    k: Int, k1: Double = 1.2, b: Double = 0.75,
                    queryIdCol: String = "query_id",
                    termCol: String = "term"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, "bm25 batch serve: k must be positive")
    val qt = queries
      .select(col(queryIdCol).cast("long").as(queryIdCol),
        col(termCol).cast("string").as("tok"))
      .dropDuplicates(queryIdCol, "tok")
      .localCheckpoint(true)
    // the request payload is driver-bounded by contract (the topKBatch
    // discipline) — its term union drives the probe
    val terms = qt.select(col("tok")).distinct()
      .collect().map(_.getString(0)).toSeq
    require(terms.nonEmpty, "bm25 batch serve: no query terms")
    val rankW = Window.partitionBy(col(queryIdCol))
      .orderBy(col("bm25_q").desc, col("doc_id"))
    servingScored(spark, dir, terms, k1, b)
      .join(broadcast(qt), Seq("tok"))
      .groupBy(col(queryIdCol), col("doc_id"))
      .agg(count(lit(1)).as("n_terms_hit"), sum(col("contrib_q")).as("bm25_q"))
      .withColumn("rnk", row_number().over(rankW))
      .filter(col("rnk") <= k)
      .select(col(queryIdCol), col("rnk"), col("doc_id"),
        col("n_terms_hit"), col("bm25_q"))
  }

  /** Serve-time consistency gate: heals a crashed root swap first, then
    * refuses (a) a store with an in-flight or crashed ERASE (the marker
    * names its touched batches — the next [[deleteDocs]] call recovers),
    * and (b) a torn append — the postings and stats batch sets must be
    * EQUAL ([[writeBatch]] writes postings first, so a crash between the
    * writes fails here loudly, and heals on replay, instead of serving
    * an under-counted corpus). */
  private def checkConsistent(dir: String): Unit = {
    graft.queue.Maintenance.healAside(java.nio.file.Paths.get(dir))
    require(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir, EraseMarker)),
      s"postings store at $dir: an erase is in flight or crashed - " +
        "call deleteDocs to recover before serving")
    val p = batchIds(dir)
    val s = batchIds(dir.stripSuffix("/") + "/_stats")
    require(p == s,
      s"postings store at $dir: torn append - postings batches $p vs " +
        s"stats batches $s; replay the missing batch or erase the orphan")
  }

  private def batchIds(dir: String): Set[Long] = {
    val p = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(p)) Set.empty
    else {
      val s = java.nio.file.Files.list(p)
      try {
        var out = Set.empty[Long]
        val it = s.iterator()
        while (it.hasNext) {
          val name = it.next().getFileName.toString
          if (name.startsWith("ingest_batch="))
            out += name.stripPrefix("ingest_batch=").toLong
        }
        out
      } finally s.close()
    }
  }

  private val CompactMarker = "_compacted_through"

  private def compactedThrough(dir: String): Long = {
    val m = java.nio.file.Paths.get(dir, CompactMarker)
    if (java.nio.file.Files.exists(m))
      new String(java.nio.file.Files.readAllBytes(m),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong
    else -1L
  }

  /** Fold every batch into one `ingest_batch=-1` layout (re-sorted by
    * key, so row-group pruning survives — the
    * `Maintenance.compactParquet` rule), sum the stats rows, and swap the
    * WHOLE store root in one [[graft.queue.Maintenance.replaceDir]] —
    * readers see whole-old or whole-new. The watermark file rides the
    * staged root so a later replay of a folded batch is refused loudly
    * by [[appendBatch]] instead of double-counting (the compaction
    * contract in the object scaladoc). Cost: one store scan — the
    * offline maintenance pass that bounds serving's per-batch footer
    * tier. */
  def compact(spark: SparkSession, dir: String): Unit = {
    checkConsistent(dir)
    val batches = batchIds(dir)
    require(batches.nonEmpty, s"postings store at $dir: nothing to compact")
    val watermark = math.max(batches.max, compactedThrough(dir))
    val root = java.nio.file.Paths.get(dir)
    val tmp = root.resolveSibling("." + root.getFileName.toString + ".compact")
    graft.queue.Maintenance.deleteRec(tmp)
    readPostings(spark, dir)
      .select(col("tok"), col("doc_id"), col("tf"), col("dl"), col("tbucket"))
      .repartition(col("tbucket"))
      .sortWithinPartitions(col("tbucket"), col("tok"))
      .write.partitionBy("tbucket")
      .parquet(s"$tmp/ingest_batch=-1")
    readStats(spark, dir)
      .agg(coalesce(sum(col("n_docs")), lit(0L)).as("n_docs"),
        coalesce(sum(col("total_len")), lit(0L)).as("total_len"))
      .coalesce(1).write.parquet(s"$tmp/_stats/ingest_batch=-1")
    // tombstones ride the fold: a takedown must survive compaction, or
    // the first post-fold append replay could resurrect it
    val erased = erasedIds(spark, dir)
    if (!erased.isEmpty)
      erased.coalesce(1).write.parquet(s"$tmp$ErasedDir")
    java.nio.file.Files.write(tmp.resolve(CompactMarker),
      watermark.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    graft.queue.Maintenance.replaceDir(tmp.toString, dir)
  }

  private val EraseMarker = "_erase_inflight"

  /** Takedown/GDPR erasure ([[IvfIndexStore.delete]]'s discipline over
    * the two-level layout): the erased documents' postings stop existing
    * — df shrinks, their dl leaves the corpus stats — so serving after
    * erasure is EXACTLY BM25 over the surviving corpus (q127's gate).
    * The locate pass is one full postings scan (`doc_id` is not the sort
    * key — takedowns are rare and batched by contract; the bounded pull
    * is one row per touched leaf). The erase then tombstones the ids in
    * `_erased/` (future appends filter them — see the object scaladoc),
    * stages an intent marker recording the ids and touched leaves,
    * rewrites each touched leaf through the rename-aside swap keeping
    * the key sort (emptied leaves and batches removed outright),
    * RECOMPUTES each touched batch's stats row from its surviving
    * postings (exact by construction — no delta bookkeeping to drift),
    * and drops the marker last. A crash anywhere in between leaves the
    * marker: serving refuses loudly and the next call here COMPLETES the
    * recorded erase from the marker before starting its own. Idempotent:
    * erased ids match no rows. Returns postings rows removed. */
  def deleteDocs(spark: SparkSession, dir: String, docIds: Seq[Long]): Long = {
    require(docIds.nonEmpty, "postings erase: empty id list")
    graft.queue.Maintenance.healAside(java.nio.file.Paths.get(dir))
    recoverCrashedErase(spark, dir)
    checkConsistent(dir)
    val post = readPostings(spark, dir)
      .filter(col("doc_id").isInCollection(docIds))
      .localCheckpoint(true) // one locate scan feeds leaves and the count
    val leaves = post.select(col("ingest_batch"), col("tbucket")).distinct()
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val removed = post.count()
    if (leaves.nonEmpty) {
      // tombstones FIRST: whatever happens below, no append can ever
      // re-register these ids (a crash here leaves the rows serving —
      // the call did not return, the retry finishes; the reverse order
      // would let a completed recovery precede the tombstones and a
      // replay silently resurrect a takedown). Re-run duplicates are
      // absorbed by the reader's distinct.
      import spark.implicits._
      docIds.toDF("doc_id").coalesce(1)
        .write.mode(SaveMode.Append)
        .parquet(dir.stripSuffix("/") + ErasedDir)
      // then the intent marker: a crash below recovers from this record
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, EraseMarker),
        (s"ids=${docIds.mkString(",")}\n" +
          s"leaves=${leaves.map(l => s"${l._1}:${l._2}").mkString(",")}\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      applyErase(spark, dir, docIds, leaves)
      java.nio.file.Files.delete(java.nio.file.Paths.get(dir, EraseMarker))
    }
    removed
  }

  /** The erase's mutation step, replayable from the intent marker: leaf
    * rewrites grouped by batch, then that batch's stats recompute. */
  private def applyErase(spark: SparkSession, dir: String, docIds: Seq[Long],
                         leaves: Seq[(Long, Int)]): Unit = {
    val base = dir.stripSuffix("/")
    leaves.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (b, ls) =>
      ls.foreach { case (_, tb) =>
        val leaf = s"$base/ingest_batch=$b/tbucket=$tb"
        if (java.nio.file.Files.exists(java.nio.file.Paths.get(leaf)))
          graft.queue.Maintenance.rewriteLeaf(leaf,
            spark.read.parquet(leaf)
              .filter(!col("doc_id").isInCollection(docIds)),
            Seq("tok"))
      }
      recomputeBatchStats(spark, dir, b)
    }
  }

  /** Rebuild one batch's `_stats` row from its SURVIVING postings — the
    * erase path's exactness rule (recompute, never delta: replaying it
    * after a crash converges, and the corpus stats cannot drift). Every
    * ingested document has at least one posting (the tokenizer emits at
    * least one token per document), so distinct `(doc_id, dl)` rebuilds
    * the row exactly. Removes an emptied batch and its stats row. */
  private def recomputeBatchStats(spark: SparkSession, dir: String,
                                  b: Long): Unit = {
    val base = dir.stripSuffix("/")
    val batchDir = java.nio.file.Paths.get(s"$base/ingest_batch=$b")
    val statsDir = s"$base/_stats/ingest_batch=$b"
    // emptied = no tbucket leaves left (the writer's _SUCCESS marker
    // does not keep a batch alive)
    val emptied = !java.nio.file.Files.exists(batchDir) || {
      val s = java.nio.file.Files.list(batchDir)
      try {
        var hasLeaf = false
        val it = s.iterator()
        while (!hasLeaf && it.hasNext)
          hasLeaf = it.next().getFileName.toString.startsWith("tbucket=")
        !hasLeaf
      } finally s.close()
    }
    if (emptied) {
      graft.queue.Maintenance.deleteRec(batchDir)
      graft.queue.Maintenance.deleteRec(java.nio.file.Paths.get(statsDir))
    } else {
      graft.queue.Maintenance.rewriteLeaf(statsDir,
        spark.read.parquet(batchDir.toString)
          .select(col("doc_id"), col("dl")).distinct()
          .agg(count(lit(1)).as("n_docs"),
            coalesce(sum(col("dl")), lit(0L)).as("total_len"))
          .coalesce(1),
        Nil)
    }
  }

  /** Complete a crashed [[deleteDocs]] from its intent marker: heal the
    * touched leaves' and stats rows' swap asides, replay the recorded
    * erase (idempotent — a leaf already scrubbed rewrites to itself),
    * recompute the touched batches' stats, drop the marker. */
  private def recoverCrashedErase(spark: SparkSession, dir: String): Unit = {
    val marker = java.nio.file.Paths.get(dir, EraseMarker)
    if (!java.nio.file.Files.exists(marker)) return
    val lines = new String(java.nio.file.Files.readAllBytes(marker),
      java.nio.charset.StandardCharsets.UTF_8).split("\n")
    def field(name: String): String = lines
      .find(_.startsWith(name + "=")).map(_.drop(name.length + 1)).getOrElse("")
    val ids = field("ids").split(",").filter(_.nonEmpty).map(_.toLong).toSeq
    val leaves = field("leaves").split(",").filter(_.nonEmpty).map { s =>
      val Array(b, tb) = s.split(":"); (b.toLong, tb.toInt)
    }.toSeq
    val base = dir.stripSuffix("/")
    leaves.map(_._1).distinct.foreach { b =>
      healAsidesUnder(java.nio.file.Paths.get(s"$base/ingest_batch=$b"))
      graft.queue.Maintenance.healAside(
        java.nio.file.Paths.get(s"$base/_stats/ingest_batch=$b"))
    }
    if (ids.nonEmpty && leaves.nonEmpty) applyErase(spark, dir, ids, leaves)
    java.nio.file.Files.delete(marker)
  }

  /** Heal every `.name.old` swap aside directly under `p`. */
  private def healAsidesUnder(p: java.nio.file.Path): Unit = {
    if (!java.nio.file.Files.exists(p)) return
    val s = java.nio.file.Files.list(p)
    try {
      val names = scala.collection.mutable.ArrayBuffer.empty[String]
      val it = s.iterator()
      while (it.hasNext) {
        val name = it.next().getFileName.toString
        if (name.startsWith(".") && name.endsWith(".old"))
          names += name.stripPrefix(".").stripSuffix(".old")
      }
      names.foreach(n => graft.queue.Maintenance.healAside(p.resolve(n)))
    } finally s.close()
  }

  /** Streaming face: maintain the index from a document stream.
    * `compactEvery` folds batches on cadence INSIDE the batch step — see
    * the compaction contract in the object scaladoc for the post-crash
    * replay semantics (refused loudly, never double-counted). */
  def sink(docStream: DataFrame, dir: String,
           idCol: String = "doc_id", textCol: String = "text",
           compactEvery: Int = 0): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docStream.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        appendBatch(batch, dir, batchId, idCol, textCol)
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
          compact(batch.sparkSession, dir)
    }

  // Battery-entry layouts (the IvfIndexStore.layoutFor discipline:
  // built once per (session, sfDir) per /tmp lifetime, marker-gated so a
  // warm /tmp re-run replays the ingest instead of duplicating it).

  private val layoutMemo =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(SparkSession, String)]()

  private def layoutImpl(spark: SparkSession, sfDir: String,
                         variant: String)(seed: String => Unit): String = {
    val keyStr = s"$sfDir|$variant"
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(keyStr.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(4).map("%02x".format(_)).mkString
    val dir = "/tmp/graft-postings/" + digest + "_" + variant + "_" +
      sfDir.replaceAll("[^A-Za-z0-9._-]", "_")
    val key = (spark, keyStr)
    if (!layoutMemo.contains(key)) {
      val marker = java.nio.file.Paths.get(dir, "_built")
      if (!java.nio.file.Files.exists(marker)) {
        // a dir without its marker is a seed that died mid-way — the
        // erased variant's compact watermark would refuse a re-seed's
        // appends, so start over instead of resuming into a poisoned
        // layout
        graft.queue.Maintenance.deleteRec(java.nio.file.Paths.get(dir))
        seed(dir)
        java.nio.file.Files.createFile(marker)
      }
      layoutMemo.add(key)
    }
    dir
  }

  /** q126's store: the documents corpus ingested as THREE striped
    * micro-batches (doc_id % 3 — the q116 striping), so the hash-gated
    * serving path exercises multi-batch append + the stats rollup, not
    * just a bulk build. Single-threaded callers only. */
  def layoutFor(spark: SparkSession, sfDir: String): String =
    layoutImpl(spark, sfDir, "striped") { dir =>
      val docs = graft.Tables.documents(spark, sfDir)
      (0 to 2).foreach(b =>
        appendBatch(docs.filter(col("doc_id") % 3 === b), dir, b.toLong))
    }

  /** q127's store: the striped ingest, then the deterministic takedown
    * set (doc_id % 97 = 3 — a bounded request payload by contract)
    * erased, then a COMPACTION pass — so the hash gate covers erasure's
    * stats deltas AND the fold in one chain. Single-threaded callers
    * only. */
  def erasedLayoutFor(spark: SparkSession, sfDir: String): String =
    layoutImpl(spark, sfDir, "erased") { dir =>
      val docs = graft.Tables.documents(spark, sfDir)
      (0 to 2).foreach(b =>
        appendBatch(docs.filter(col("doc_id") % 3 === b), dir, b.toLong))
      import spark.implicits._
      val takedown = docs.filter(col("doc_id") % 97 === 3)
        .select(col("doc_id").cast("long")).as[Long].collect().toSeq
      deleteDocs(spark, dir, takedown)
      compact(spark, dir)
    }
}
