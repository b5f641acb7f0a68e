package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mix-aware admission at ingest — the gate that closes the accounting →
  * admission loop: [[CorpusStats]] knows the corpus's current
  * language/source mix, q95 knows how to hit a target mix with
  * deterministic h16 rates, and this operator wires them together so an
  * ingest stream is THROTTLED toward a target mix instead of merely
  * reporting its drift ([[MixDrift]]).
  *
  * Controller: per batch, the current per-stratum character mass is read
  * from the CorpusStats doc-grained registry; a stratum at share `s`
  * against target `t` admits fresh documents at rate `min(1, t/s)` —
  * overrepresented strata are downsampled proportionally to their excess,
  * underrepresented strata admit everything (DOWNSAMPLE-ONLY: an admission
  * gate cannot mint missing data, it can only stop compounding the skew;
  * shares converge to the target as long as the underrepresented strata
  * keep arriving). Strata without a target admit everything — the q91
  * unlisted-default-keep-all convention.
  *
  * Admission is the battery's h16 discipline ([[graft.operators.Sampling]]):
  * keep iff h16(doc_id) < rate·2¹⁶ — per-row, partitioning-independent, and
  * stable for a given registry state. Idempotence is structural like
  * [[DomainQuota]]: admitted documents are registered (doc-grained, by
  * (source, doc_id)), so an at-least-once replay finds them in the registry
  * and re-admits without re-charging the mix; a REJECTED document never
  * registers and is re-evaluated on a later arrival — by then the mix has
  * shifted and its stratum's rate has typically risen, which is exactly the
  * behavior a converging throttle wants.
  *
  * Scale shape: the replay probe prunes to the batch's touched sbuckets
  * (O(batch) I/O); the rate pull reads [[CorpusStats.langMass]]'s
  * compacted per-cell rollup — O(strata) rows per batch regardless of
  * corpus size (a driver map of a few dozen entries — languages, not
  * documents). The doc-grained registry remains the idempotence substrate;
  * it is scanned only on adoption/recovery ([[CorpusStats.rebuildRollup]]),
  * never per tick. */
object MixBalance {

  /** Per-stratum admission rates from the corpus's current mass and the
    * target shares (ppm). The mass pull is [[CorpusStats.langMass]] — the
    * compacted per-cell rollup, O(strata) per batch, never the doc-grained
    * registry scan (that was the one O(corpus)-per-tick plan in the engine
    * until round 12). Empty corpus → rate 1.0 (cold start admits
    * everything; the controller engages once mass exists) — EXCEPT a
    * stratum whose target is exactly 0 ppm, which rejects from cold start:
    * under `sharePpm <= t` a zero-target stratum with zero mass would
    * admit its first batches at rate 1.0 and permanently register them
    * before the rate ever dropped. */
  def rates(spark: SparkSession, statsRegistryDir: String,
            targetPpm: Map[String, Long]): Map[String, Double] = {
    val cells = CorpusStats.langMass(spark, statsRegistryDir)
    val total = cells.values.sum
    targetPpm.map { case (lang, t) =>
      lang -> (
        if (t <= 0L) 0.0
        else if (total <= 0L) 1.0
        else {
          val sharePpm = 1000000.0 * cells.getOrElse(lang, 0L) / total
          if (sharePpm <= t) 1.0 else t / sharePpm
        })
    }
  }

  /** Pure evaluation (no side effects) → one verdict per distinct
    * (source, doc_id): `(doc_id, source, lang, mix_rate, mix_admitted,
    * replayed)`. Null source/lang read as "" (the CorpusStats rule).
    * Callers that admit a document MUST then [[register]] it, or replays
    * will re-evaluate instead of short-circuiting. */
  def evaluate(batch: DataFrame, statsRegistryDir: String,
               targetPpm: Map[String, Long], idCol: String = "doc_id",
               sourceCol: String = "source", langCol: String = "lang"): DataFrame = {
    val spark = batch.sparkSession
    val docs = batch
      .select(col(idCol).as("doc_id"),
        coalesce(col(sourceCol), lit("")).as("source"),
        coalesce(col(langCol), lit("")).as("lang"))
      .dropDuplicates("source", "doc_id")
      .withColumn("sbucket", (crc32(col("source")) % 256).cast("int"))
      .localCheckpoint(true) // feeds the touched pull and the probe join
    val touched = docs.select(col("sbucket")).distinct()
      .collect().map(_.getInt(0))
    val registryAll = CorpusStats.readRegistry(spark, statsRegistryDir)
    val registry =
      if (touched.isEmpty) registryAll.limit(0)
      else registryAll.filter(col("sbucket").isInCollection(touched))
    val alreadyIn = registry.join(broadcast(docs), Seq("source", "doc_id"))
      .select(col("source"), col("doc_id")).distinct()
      .withColumn("replayed", lit(true))
    val r = rates(spark, statsRegistryDir, targetPpm)
    val rate = r.foldLeft(lit(1.0)) { case (acc, (k, v)) =>
      when(col("lang") === k, lit(v)).otherwise(acc)
    }
    docs.join(broadcast(alreadyIn), Seq("source", "doc_id"), "left")
      .withColumn("replayed", coalesce(col("replayed"), lit(false)))
      .withColumn("mix_rate", rate)
      .withColumn("mix_admitted", col("replayed") ||
        graft.operators.Sampling.hash16(col("doc_id")) < col("mix_rate") * lit(65536.0))
      .select(col("doc_id"), col("source"), col("lang"),
        col("mix_rate"), col("mix_admitted"), col("replayed"))
  }

  /** Register admitted documents into the accounting registry — one
    * [[CorpusStats.processBatch]] step, so the mix gate and the live data
    * card share one source of truth (and its replay-exclusion: re-appended
    * documents are detected there and add nothing). Returns CorpusStats'
    * per-cell verdicts. `docs` must carry (idCol, sourceCol, langCol,
    * charsCol). */
  def register(docs: DataFrame, statsRegistryDir: String,
               idCol: String = "doc_id", sourceCol: String = "source",
               langCol: String = "lang", charsCol: String = "n_chars"): DataFrame =
    CorpusStats.processBatch(docs, statsRegistryDir, idCol, sourceCol,
      langCol, charsCol)

  /** One self-contained micro-batch step: evaluate, then register the
    * admitted documents. The IngestCuration composition uses the split
    * [[evaluate]]/[[register]] form instead, so only documents that ALSO
    * survive every other gate charge the mix. */
  def processBatch(batch: DataFrame, statsRegistryDir: String,
                   targetPpm: Map[String, Long], idCol: String = "doc_id",
                   sourceCol: String = "source", langCol: String = "lang",
                   charsCol: String = "n_chars"): DataFrame = {
    val verdicts = evaluate(batch, statsRegistryDir, targetPpm,
      idCol, sourceCol, langCol).localCheckpoint(true)
    val admitted = batch
      .select(col(idCol).as("doc_id"),
        coalesce(col(sourceCol), lit("")).as("source"),
        coalesce(col(langCol), lit("")).as("lang"),
        col(charsCol).cast("long").as("n_chars"))
      .join(verdicts.filter(col("mix_admitted") && !col("replayed"))
        .select(col("doc_id"), col("source")), Seq("doc_id", "source"))
    register(admitted, statsRegistryDir)
    verdicts
  }
}
