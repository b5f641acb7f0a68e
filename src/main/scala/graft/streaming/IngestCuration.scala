package graft.streaming

import graft.functions.GraftFunctions
import graft.operators.{Similarity, TextAnalysis}
import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Curation AT INGEST — the streaming twin of the batch curation pipeline
  * (q78/q85): each micro-batch gets near-dup, quality, and language
  * verdicts — plus, for batches carrying embeddings, vector near-dup and
  * semantic-decontamination verdicts — in one pass, so a growing corpus
  * admits only documents that would have survived the batch gates.
  * Composes the pieces that are each spec'd alone:
  *
  *   - near-dup vs the EXISTING corpus + same batch via
  *     [[IncrementalDedup.processBatch]] (durable pruned bucket registry);
  *   - quality from [[TextAnalysis.qualityMetrics]] (token count, distinct
  *     ratio — pure column algebra, no shuffle);
  *   - language from [[TextAnalysis.langId]] against an allow-set;
  *   - vector near-dup vs the existing corpus via
  *     [[IncrementalVecDedup.processBatch]] (its own pruned (band, bucket)
  *     registry; candidates exact-rescored) when `vecRegistryDir` is set;
  *   - semantic decontamination against a broadcast `benchmark` embedding
  *     set (small by construction — an eval set), max-similarity scored
  *     map-side exactly like the batch gate q84;
  *   - LEXICAL decontamination against a broadcast `benchShingles` set
  *     (q59's at-ingest form: distinct per-doc 3-token shingles, flagged
  *     at >= `maxOverlapFrac` overlap) — paraphrase contamination falls
  *     to the semantic gate, verbatim contamination to this one;
  *   - a per-domain admission quota via [[DomainQuota.processBatch]]
  *     (durable admitted-set registry, pruned probe) when
  *     `quotaRegistryDir` is set — applied LAST, over the survivors of
  *     every other gate, so a document the pipeline drops anyway never
  *     consumes its domain's quota and the admitted registry mirrors the
  *     kept corpus exactly (the batch cap q91's at-ingest form).
  *
  * Embedding gates follow q85's LEFT anti-join semantics: a document
  * without an embedding (null, or no embedding column at all) passes them
  * (`vec_is_dup = false`, `sem_clean = true`) — at corpus scale only a
  * subset is embedded and the lexical gates still cover the rest. Only a
  * scored-and-flagged document drops.
  *
  * Registration semantics: every FRESH document registers its buckets —
  * in BOTH registries — including ones other gates reject; dedup means
  * "seen before", so re-ingesting previously-seen-and-rejected content is
  * still flagged as a duplicate rather than re-evaluated forever. The
  * per-doc verdict row records every gate separately (`is_dup`,
  * `quality_ok`, `lang_ok`, `vec_is_dup`, `sem_clean`, and the composite
  * `keep`) so a pipeline can audit WHY a document was dropped — mirroring
  * the batch pipeline's separately checkable stages.
  *
  * Scale shape: one pruned probe per registry (O(batch) I/O each), two
  * shuffle-free column passes, one map-side crossJoin against the
  * broadcast benchmark, and joins on the batch's own doc ids — the batch
  * is micro by construction, so the joins broadcast under AQE. Nothing
  * corpus-sized ever shuffles.
  */
object IngestCuration {

  /** One micro-batch step → verdicts. GRAIN CONTRACT: one row per doc_id,
    * or one per (doc_id, quota_source) when the quota gate is on — never
    * one per input row; a batch carrying a doc under several rows gets its
    * per-doc gates aggregated conservatively (any variant failing fails
    * the doc). Columns:
    * `(doc_id, is_dup, dup_of, predicted_lang, lang_ok, n_tokens,
    *   distinct_ratio, quality_ok, token_cost, vec_is_dup, vec_dup_of, max_bench_sim,
    *   sem_clean, centroid_sim, centroid_ok, fluency_ppm, fluency_ok,
    *   clf_score, clf_ok, bench_overlap_frac, lex_clean, mix_rate,
    *   mix_admitted, n_emails, n_ipv4, n_phones,
    *   clean_md5, quota_source, quota_admitted, keep)` — `quota_admitted`
    * is null when the quota gate is off or the
    * document failed an earlier gate; `quota_source` names the domain the
    * quota verdict applies to (a doc_id arriving under two sources gets
    * one attributable row per pair; null when the gate is off); `centroid_sim`/`centroid_ok` carry
    * the centroid-outlier gate (q97's at-ingest form) when `centroids` is
    * set and the batch carries `vecCol` + `labelCol`, null/true otherwise;
    * `fluency_ppm`/`fluency_ok` carry the LM fluency gate (q99's at-ingest
    * form) when `bigramModel` is set, null/true otherwise; `clf_score`/
    * `clf_ok` carry the TRAINED quality-classifier gate (q104's at-ingest
    * form) when `qualityModel` is set, null/true otherwise;
    * `bench_overlap_frac`/`lex_clean` carry the lexical decontamination
    * gate (q59's at-ingest form) when `benchShingles` is set, null/true
    * otherwise (unshingleable short docs also pass with a null fraction);
    * `mix_rate`/
    * `mix_admitted` carry the mix-aware admission throttle ([[MixBalance]])
    * when `mixRegistryDir` + `mixTargetPpm` are set — null for docs the mix
    * never saw (failed an earlier gate, or the gate is off), and the final
    * kept set registers into that accounting registry so the next batch's
    * rates see the corpus as kept;
    * the PII columns are null unless
    * `scrubPii` is on (PII is a transform-with-audit, never a gate: the
    * counts say what the scrub removed, `clean_md5` digests the scrubbed
    * text the consumer reproduces via [[TextAnalysis.piiScrub]]).
    *
    * `vecRegistryDir` enables the vector near-dup gate (threshold
    * `vecMinSimMillionths`, floor-quantized millionths like every
    * similarity in this engine); `benchmark` — a `bench_vec` embedding
    * column, one row per benchmark item — enables the semantic gate
    * (flagging `max_bench_sim >= maxBenchSimMillionths`). Both read the
    * batch's `vecCol` and skip docs where it is null. */
  def processBatch(batch: DataFrame, registryDir: String,
                   allowedLangs: Set[String] = Set("en", "fr", "es"),
                   minTokens: Int = 5, minDistinctRatio: Double = 0.3,
                   bands: Int = 4, idCol: String = "doc_id",
                   vecCol: String = "embedding",
                   vecRegistryDir: Option[String] = None,
                   vecMinSimMillionths: Long = 990000L,
                   benchmark: Option[DataFrame] = None,
                   maxBenchSimMillionths: Long = 350000L,
                   planes: Int = 16, bandWidth: Int = 4, dims: Int = 64,
                   quotaRegistryDir: Option[String] = None,
                   quotaCap: Int = 0, sourceCol: String = "source",
                   scrubPii: Boolean = false,
                   centroids: Option[DataFrame] = None,
                   labelCol: String = "label",
                   minCentroidSimMillionths: Long = -100000L,
                   bigramModel: Option[(Map[String, Long], Map[String, Long])] = None,
                   minFluencyPpm: Long = 210000L,
                   qualityModel: Option[Array[Long]] = None,
                   minQualityScore: Double = -200.0,
                   mixRegistryDir: Option[String] = None,
                   mixTargetPpm: Map[String, Long] = Map.empty,
                   benchShingles: Option[DataFrame] = None,
                   maxOverlapFrac: Double = 0.5): DataFrame = {
    val spark = batch.sparkSession
    // Per-DOC gate inputs: a batch may legitimately carry one doc_id under
    // several rows (the multi-source shape the quota gate attributes per
    // (doc, source)), and per-doc gates must emit ONE verdict per doc, not
    // one per row — an id-grained join against row-grained frames would
    // multiply rows combinatorially (2 rows × 4 lexical gates = 16). The
    // text projection collapses the identical-duplicate case outright; if
    // rows genuinely disagree on text, the fused aggregate below resolves
    // per id (min on booleans = every variant must pass — the conservative
    // read).
    val texts = batch.select(col(idCol), col("text")).distinct()
    val dedup = IncrementalDedup.processBatch(texts, registryDir, bands, idCol)
      .groupBy(col(idCol)).agg(max(col("is_dup")).as("is_dup"),
        min(col("dup_of")).as("dup_of"))

    // EVERY text-column gate in ONE fused projection + ONE per-id aggregate
    // + ONE join with the dedup verdicts. Quality metrics, token_cost,
    // language-ID, the PII audit, the LM fluency score, and the trained
    // classifier score are all per-row column algebra over the same `texts`
    // relation — running each as its own groupBy + join (the r12 shape)
    // cost up to five extra shuffles and five joins per micro-batch for
    // identical values (SCALE.md's jobs-per-batch line measures the cut).
    //
    //  - token_cost: the exact chunk-token budget (q105's cost column),
    //    denominated in the engine-wide TextAnalysis.tokens contract unit,
    //    materialized ONCE at ingest, so downstream cap queries and the
    //    token-mode quota read a text-free audit column instead of
    //    re-deriving it from `text` per run (max across variants = the
    //    conservative budget charge, mirroring the min-on-booleans rule);
    //  - PII (scrubPii): a TRANSFORM with counts, not a gate — PII never
    //    rejects a document, it gets scrubbed out of it. The verdict row
    //    stays no-raw-text (clean_md5 is the digest); the consumer applies
    //    the SAME deterministic TextAnalysis.piiScrub to its admitted docs
    //    and can check the digest end-to-end;
    //  - fluency / classifier: the column forms ([[TextAnalysis
    //    .withFluencyPpm]], [[QualityClassifier.withScore]]) score null —
    //    not a dropped row — for docs too short to feature, so the per-id
    //    min skips them (null-ignoring) and an all-short doc surfaces null,
    //    which the coalesce'd _ok flags below read as PASS: exactly the
    //    LEFT-join semantics the per-gate shape had.
    var perVariant = TextAnalysis.langId(
      TextAnalysis.chunkTokenCost(TextAnalysis.qualityMetrics(texts)))
      .withColumn("quality_ok",
        col("n_tokens") >= minTokens && col("distinct_ratio") >= minDistinctRatio)
      .withColumn("lang_ok", col("predicted_lang").isInCollection(allowedLangs))
    if (scrubPii)
      perVariant = TextAnalysis.piiScrub(perVariant)
        .withColumn("clean_md5", md5(col("clean_text")))
    bigramModel.foreach { case (qp, default) =>
      perVariant = TextAnalysis.withFluencyPpm(perVariant, qp, default)
    }
    qualityModel.foreach { w =>
      perVariant = graft.operators.QualityClassifier.withScore(perVariant, w)
        .withColumnRenamed("quality_score", "clf_score")
    }
    val gateAggs = Seq(
      min(col("n_tokens")).as("n_tokens"),
      min(col("distinct_ratio")).as("distinct_ratio"),
      min(col("quality_ok")).as("quality_ok"),
      max(col("token_cost")).as("token_cost"),
      min(col("predicted_lang")).as("predicted_lang"),
      min(col("lang_ok")).as("lang_ok")) ++
      (if (scrubPii) Seq(max(col("n_emails")).as("n_emails"),
        max(col("n_ipv4")).as("n_ipv4"),
        max(col("n_phones")).as("n_phones"),
        min(col("clean_md5")).as("clean_md5")) else Nil) ++
      bigramModel.map(_ => min(col("fluency_ppm")).as("fluency_ppm")).toSeq ++
      qualityModel.map(_ => min(col("clf_score")).as("clf_score")).toSeq
    var lexical = dedup.join(
      perVariant.groupBy(col(idCol)).agg(gateAggs.head, gateAggs.tail: _*),
      idCol)
    // off-gates surface their audit columns as typed nulls, same as r12
    if (!scrubPii)
      lexical = lexical.withColumn("n_emails", lit(null).cast("int"))
        .withColumn("n_ipv4", lit(null).cast("int"))
        .withColumn("n_phones", lit(null).cast("int"))
        .withColumn("clean_md5", lit(null).cast("string"))
    if (bigramModel.isEmpty)
      lexical = lexical.withColumn("fluency_ppm", lit(null).cast("long"))
    if (qualityModel.isEmpty)
      lexical = lexical.withColumn("clf_score", lit(null).cast("double"))

    val embedded: Option[DataFrame] =
      if (batch.columns.contains(vecCol) &&
        (vecRegistryDir.isDefined || benchmark.isDefined))
        Some(batch.filter(col(vecCol).isNotNull)
          .select(col(idCol), col(vecCol)).distinct())
      else None

    val withVec = (embedded, vecRegistryDir) match {
      case (Some(emb), Some(reg)) =>
        val v = IncrementalVecDedup.processBatch(emb, reg, vecMinSimMillionths,
          planes, bandWidth, dims, idCol, vecCol)
          .select(col(idCol), col("is_dup").as("vec_is_dup"),
            col("dup_of").as("vec_dup_of"))
          // per-id like every gate: an id under two distinct vectors is a
          // dup if ANY of them is (max), charged to the smallest partner
          .groupBy(col(idCol)).agg(max(col("vec_is_dup")).as("vec_is_dup"),
            min(col("vec_dup_of")).as("vec_dup_of"))
        lexical.join(v, Seq(idCol), "left")
          .withColumn("vec_is_dup", coalesce(col("vec_is_dup"), lit(false)))
      case _ =>
        lexical.withColumn("vec_is_dup", lit(false))
          .withColumn("vec_dup_of", lit(null).cast("long"))
    }
    val withSem = (embedded, benchmark) match {
      case (Some(emb), Some(bench)) =>
        def sim(a: Column, b: Column) =
          Similarity.quantize(GraftFunctions.vecDot(spark, a, b))
        val scored = emb
          .crossJoin(broadcast(bench.select(col("bench_vec"))))
          .select(col(idCol), sim(col(vecCol), col("bench_vec")).as("sim_q"))
          .groupBy(col(idCol)).agg(max(col("sim_q")).as("max_bench_sim"))
        withVec.join(scored, Seq(idCol), "left")
          .withColumn("sem_clean",
            coalesce(col("max_bench_sim") < maxBenchSimMillionths, lit(true)))
      case _ =>
        withVec.withColumn("max_bench_sim", lit(null).cast("long"))
          .withColumn("sem_clean", lit(true))
    }
    // Centroid-outlier gate (q97's at-ingest form): a document claiming
    // class `label` whose embedding sits far from that class's centroid is
    // mislabeled/garbled/spam and drops. `centroids` is a PRECOMPUTED model
    // artifact from [[Similarity.labelCentroids]] — |labels| × 64 longs,
    // small by construction like the benchmark set, hence the explicit
    // broadcast (this is a config-scale table, not a corpus-derived one).
    // Docs without an embedding or label pass (the battery's LEFT-gate
    // rule); the exact q97 integer algebra scores map-side, zero shuffles.
    val withCent = centroids match {
      case Some(cent) if batch.columns.contains(vecCol) &&
          batch.columns.contains(labelCol) =>
        val scored = batch
          .filter(col(vecCol).isNotNull && col(labelCol).isNotNull)
          .select(col(idCol), col(labelCol).as("label"),
            Similarity.quantizeVec(col(vecCol)).as("qvec"))
          .distinct()
          .join(broadcast(cent.select(col("label"), col("cvec"), col("nc2"))),
            Seq("label"))
          .select(col(idCol),
            Similarity.centroidCosPpm(col("qvec"), col("cvec"), col("nc2"))
              .as("centroid_sim"))
          // one verdict per doc even when the batch carries a doc_id under
          // multiple rows (the multi-source shape the quota gate supports):
          // min = the most conservative sim across claimed labels, same
          // per-id aggregation discipline as the sem gate's max above
          .groupBy(col(idCol)).agg(min(col("centroid_sim")).as("centroid_sim"))
        withSem.join(scored, Seq(idCol), "left")
          .withColumn("centroid_ok",
            coalesce(col("centroid_sim") >= minCentroidSimMillionths, lit(true)))
      case _ =>
        withSem.withColumn("centroid_sim", lit(null).cast("long"))
          .withColumn("centroid_ok", lit(true))
    }

    // LM fluency (q99's at-ingest form) and trained-classifier (q104's)
    // verdicts derive straight from the FUSED columns: both scores were
    // computed in the single per-variant projection above and per-id
    // min-aggregated alongside the other lexical gates — no extra scan,
    // shuffle, or join here. A null score — gate off, or every variant of
    // the doc too short to feature — coalesces to PASS: the LEFT-gate rule.
    val withClf = withCent
      .withColumn("fluency_ok",
        coalesce(col("fluency_ppm") >= minFluencyPpm, lit(true)))
      .withColumn("clf_ok",
        coalesce(col("clf_score") >= minQualityScore, lit(true)))

    // LEXICAL decontamination gate (q59's at-ingest form, the shingle
    // twin of the semantic gate above): per-doc distinct 3-token shingles
    // joined against the broadcast benchmark shingle set, flagged at the
    // same >= 0.5 overlap fraction as the batch query. The benchmark is
    // an EVAL set — small by construction, hence the explicit broadcast
    // (config-scale, never corpus-derived; a benchmark too large to
    // broadcast routes through the q76 bloom prefilter instead). Docs too
    // short to shingle pass (the LEFT-gate rule, matching q59's universe
    // of shingled docs).
    val withLex = benchShingles match {
      case Some(bs) =>
        // fractions are computed per (doc, text VARIANT), then aggregated
        // per doc with the grain contract's conservative read (min on the
        // boolean: every variant must be clean; max fraction audited) —
        // pooling variants' shingles into one union fraction would let a
        // long clean variant dilute a verbatim-contaminated one below the
        // threshold
        val tv = texts.withColumn("__tv",
          concat_ws("|", col(idCol), md5(col("text"))))
        val dsh = graft.operators.Dedup.shingles(tv, idCol = "__tv").distinct()
        val tot = dsh.groupBy(col("__tv")).agg(count(lit(1)).as("__n_sh"))
        val ov = dsh
          .join(broadcast(bs.select(col("shingle")).distinct()), "shingle")
          .groupBy(col("__tv")).agg(count(lit(1)).as("__n_ov"))
        val perVariant = tot.join(ov, Seq("__tv"), "left")
          .select(col("__tv"),
            (coalesce(col("__n_ov"), lit(0L)).cast("double") / col("__n_sh"))
              .as("__frac"))
        val perDoc = tv.select(col(idCol), col("__tv")).distinct()
          .join(perVariant, Seq("__tv"), "left")
          .groupBy(col(idCol))
          .agg(max(col("__frac")).as("bench_overlap_frac"),
            min(coalesce(col("__frac") < maxOverlapFrac, lit(true)))
              .as("lex_clean"))
        withClf.join(perDoc, Seq(idCol), "left")
          .withColumn("lex_clean", coalesce(col("lex_clean"), lit(true)))
      case None =>
        withClf.withColumn("bench_overlap_frac", lit(null).cast("double"))
          .withColumn("lex_clean", lit(true))
    }

    val gated = withLex.withColumn("gates_ok",
      !col("is_dup") && col("quality_ok") && col("lang_ok") &&
        !col("vec_is_dup") && col("sem_clean") && col("centroid_ok") &&
        col("fluency_ok") && col("clf_ok") && col("lex_clean"))

    val mixOn = mixRegistryDir.isDefined && mixTargetPpm.nonEmpty
    val srcExpr =
      if (batch.columns.contains(sourceCol)) coalesce(col(sourceCol), lit(""))
      else lit("")

    // Mix-aware admission ([[MixBalance]]): over gate survivors only —
    // a doc the pipeline drops anyway must not be throttled against (or
    // charged to) the mix. The stratum is the pipeline's OWN language
    // verdict (predicted_lang), so the mix being steered is the mix the
    // corpus will actually report. Evaluation here, REGISTRATION at the
    // very end over the final kept set, so the accounting registry mirrors
    // the kept corpus exactly even when the quota gate drops more below.
    val withMix =
      if (mixOn) {
        val gatedCk = gated.localCheckpoint(true)
        val survivors = batch.select(col(idCol), srcExpr.as("source")).distinct()
          .join(gatedCk.filter(col("gates_ok"))
            .select(col(idCol), col("predicted_lang")), Seq(idCol))
        val ev = MixBalance.evaluate(survivors, mixRegistryDir.get,
            mixTargetPpm, idCol, "source", "predicted_lang")
          // per-doc verdict: the h16/rate decision is doc-grained; max over
          // sources so a doc already in the corpus under ANY source stays
          // admitted (replay short-circuit), min rate for the audit column
          .groupBy(col("doc_id")).agg(min(col("mix_rate")).as("mix_rate"),
            max(col("mix_admitted")).as("mix_admitted"))
          .withColumnRenamed("doc_id", idCol)
        gatedCk.join(ev, Seq(idCol), "left")
          .withColumn("keep_pre",
            col("gates_ok") && coalesce(col("mix_admitted"), lit(false)))
      } else gated
        .withColumn("mix_rate", lit(null).cast("double"))
        .withColumn("mix_admitted", lit(null).cast("boolean"))
        .withColumn("keep_pre", col("gates_ok"))

    // Per-domain quota LAST, over the survivors of every other gate only:
    // a document the pipeline drops anyway must not consume its domain's
    // quota, and the registry (= the admitted corpus) must reflect kept
    // documents exactly. `quota_admitted` is null for docs the quota never
    // saw (failed an earlier gate, or the gate is off) — the same audit
    // discipline as the embedding columns above.
    val withQuota = quotaRegistryDir match {
      case Some(qReg) =>
        require(quotaCap > 0, "quotaRegistryDir is set but quotaCap is " +
          s"$quotaCap — a non-positive cap would silently reject every " +
          "document; pass quotaCap explicitly when enabling the quota gate")
        // materialize the gate chain ONCE (micro-batch sized): the quota
        // needs the survivor set eagerly (DomainQuota registers as a side
        // effect), and without the checkpoint the caller's sink write
        // would re-run every probe join and column pass a second time
        val gatedCk = withMix.localCheckpoint(true)
        val survivors = batch.join(
          gatedCk.filter(col("keep_pre")).select(col(idCol)).distinct(), idCol)
        // DomainQuota keys replay/admission on the FULL (source, doc) key,
        // so its verdicts join back on both — a batch carrying one doc_id
        // under two sources gets one verdict per (source, doc) instead of
        // a duplicated/misattributed row. The batch's source is normalized
        // exactly as DomainQuota normalizes it (null reads as "").
        val srcPairs = batch.select(col(idCol),
          coalesce(col(sourceCol), lit("")).as("quota_source")).distinct()
        val admitted = DomainQuota.processBatch(survivors, qReg, quotaCap,
          idCol, sourceCol)
          .select(col(idCol), col("source").as("quota_source"),
            col("admitted").as("quota_admitted"))
        // quota_source STAYS in the verdict: a batch carrying one doc_id
        // under two sources legitimately yields one verdict row per
        // (doc, source) pair — possibly with opposite keep values — and
        // dropping the source column would leave those rows duplicate-
        // keyed and unattributable to a consumer keying on doc_id alone
        gatedCk.join(srcPairs, Seq(idCol), "left")
          .join(admitted, Seq(idCol, "quota_source"), "left")
          .withColumn("keep", col("keep_pre") && coalesce(col("quota_admitted"), lit(false)))
      case None =>
        withMix.withColumn("quota_source", lit(null).cast("string"))
          .withColumn("quota_admitted", lit(null).cast("boolean"))
          .withColumn("keep", col("keep_pre"))
    }
    val verdict = withQuota.select(col(idCol), col("is_dup"), col("dup_of"),
      col("predicted_lang"), col("lang_ok"),
      col("n_tokens"), col("distinct_ratio"), col("quality_ok"), col("token_cost"),
      col("vec_is_dup"), col("vec_dup_of"), col("max_bench_sim"), col("sem_clean"),
      col("centroid_sim"), col("centroid_ok"),
      col("fluency_ppm"), col("fluency_ok"),
      col("clf_score"), col("clf_ok"),
      col("bench_overlap_frac"), col("lex_clean"),
      col("mix_rate"), col("mix_admitted"),
      col("n_emails"), col("n_ipv4"), col("n_phones"), col("clean_md5"),
      col("quota_source"), col("quota_admitted"), col("keep"))
    if (!mixOn) verdict
    else {
      // Register the FINAL kept set into the accounting registry — after
      // quota, so the registry the next batch's rates read mirrors the kept
      // corpus exactly. Fix the verdict first: the caller's sink write must
      // not re-evaluate the mix probe against the registry this append
      // mutates. CorpusStats' own replay exclusion makes re-registration
      // idempotent.
      val fin = verdict.localCheckpoint(true)
      val chars = batch.select(col(idCol), srcExpr.as("source"),
        length(col("text")).cast("long").as("n_chars")).distinct()
      val kept =
        if (quotaRegistryDir.isDefined)
          fin.filter(col("keep")).select(col(idCol),
            col("quota_source").as("source"), col("predicted_lang").as("lang"))
        else
          fin.filter(col("keep"))
            .select(col(idCol), col("predicted_lang").as("lang"))
            .join(batch.select(col(idCol), srcExpr.as("source")).distinct(),
              Seq(idCol))
      MixBalance.register(
        kept.join(chars, Seq(idCol, "source"))
          .select(col(idCol), col("source"), col("lang"), col("n_chars")),
        mixRegistryDir.get, idCol)
      fin
    }
  }

  /** Streaming face: wire a document stream through [[processBatch]],
    * appending full verdicts to `verdictDir`; a consumer keeps
    * `filter($"keep")`. `compactEvery` schedules BOTH registries'
    * compaction cadence exactly as [[IncrementalDedup.gate]] does. */
  def gate(docStream: DataFrame, registryDir: String, verdictDir: String,
           allowedLangs: Set[String] = Set("en", "fr", "es"),
           minTokens: Int = 5, minDistinctRatio: Double = 0.3,
           bands: Int = 4, idCol: String = "doc_id",
           vecCol: String = "embedding",
           vecRegistryDir: Option[String] = None,
           vecMinSimMillionths: Long = 990000L,
           benchmark: Option[DataFrame] = None,
           maxBenchSimMillionths: Long = 350000L,
           planes: Int = 16, bandWidth: Int = 4, dims: Int = 64,
           quotaRegistryDir: Option[String] = None,
           quotaCap: Int = 0, sourceCol: String = "source",
           scrubPii: Boolean = false,
           centroids: Option[DataFrame] = None,
           labelCol: String = "label",
           minCentroidSimMillionths: Long = -100000L,
           bigramModel: Option[(Map[String, Long], Map[String, Long])] = None,
           minFluencyPpm: Long = 210000L,
           qualityModel: Option[Array[Long]] = None,
           minQualityScore: Double = -200.0,
           mixRegistryDir: Option[String] = None,
           mixTargetPpm: Map[String, Long] = Map.empty,
           benchShingles: Option[DataFrame] = None,
           maxOverlapFrac: Double = 0.5,
           compactEvery: Int = 0): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docStream.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        processBatch(batch, registryDir, allowedLangs, minTokens,
          minDistinctRatio, bands, idCol, vecCol, vecRegistryDir,
          vecMinSimMillionths, benchmark, maxBenchSimMillionths,
          planes, bandWidth, dims, quotaRegistryDir, quotaCap, sourceCol,
          scrubPii, centroids, labelCol, minCentroidSimMillionths,
          bigramModel, minFluencyPpm, qualityModel, minQualityScore,
          mixRegistryDir, mixTargetPpm, benchShingles, maxOverlapFrac)
          .write.mode(SaveMode.Append).parquet(verdictDir)
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0) {
          // every compaction is guarded on the registry actually holding
          // data: a configured-but-never-written dir (vec registry before
          // the first embedded batch, mix/quota before the first admitted
          // doc) must not abort the stream with a read-of-nothing error
          (registryDir +: vecRegistryDir.toSeq)
            .filter(RegistryIO.hasData(_, Some("band=")))
            .foreach { reg =>
              graft.queue.Maintenance.compactParquet(batch.sparkSession,
                reg, partitionCols = Seq("band", "bucket"))
            }
          // the mix accounting registry appends per batch exactly like the
          // quota's (same sbucket layout via CorpusStats) — leaving it out
          // of the cadence re-creates the file-per-batch probe-time growth
          // SCALE.md's file_growth regime measures; its derived rollup
          // needs no compaction (the per-batch rename-aside swap keeps it
          // one generation)
          (quotaRegistryDir.toSeq ++ mixRegistryDir.toSeq)
            .filter(RegistryIO.hasData(_, Some("sbucket=")))
            .foreach { reg =>
              graft.queue.Maintenance.compactParquet(batch.sparkSession,
                reg, partitionCols = Seq("sbucket"))
            }
          ()
        }
    }
}
