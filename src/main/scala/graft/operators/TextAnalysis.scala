package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (SURVEY §2.9 L3):
  * tokenization, token counting, quality scoring, language-ID heuristic,
  * document fingerprinting.
  *
  * Everything is built from codegen'd `functions._` / higher-order array
  * functions — no UDFs — so the whole stage stays inside WholeStageCodegen
  * and scales embarrassingly (per-row, no shuffle until the caller
  * aggregates). All outputs are integer/string-deterministic so a SQL oracle
  * can replay them.
  */
object TextAnalysis {

  /** THE TOKEN-UNIT CONTRACT. Every token count, chunk window, and token
    * budget in this engine is denominated in WHITESPACE tokens —
    * `split(text, " ")`, the corpus being space-separated by construction.
    * One unit, four budget consumers: [[chunk]]'s windows,
    * [[chunkTokenCost]] (q105/q93's budgets), the token mode of
    * [[graft.streaming.DomainQuota]], and the `token_cost` column
    * [[graft.streaming.IngestCuration]] materializes at ingest. The DuckDB
    * oracles replay the same unit (`len(string_split(text, ' '))`), so a
    * unit change anywhere without its oracles hash-fails the battery —
    * budgets in mixed units are the bug this contract exists to prevent.
    * To budget in subword units instead, swap [[subwordCount]] in as the
    * counter of every consumer AND its oracles in one change;
    * [[subwordCount]] otherwise exists for ANALYSIS (q80-style rarity
    * stats), never for budgeting. */
  def tokens(text: Column): Column = split(text, " ")

  /** Count in the [[tokens]] contract unit. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish pre-tokenizer count: letter runs, digit runs, and single
    * non-alphanumeric marks counted separately (the shape a byte-pair
    * encoder's pre-tokenizer produces). Deterministic and oracle-replayable
    * (plain regex both engines share) — but an ANALYSIS unit, not the
    * budgeting unit; see the [[tokens]] contract. */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))

  /** Quality metrics: length, token stats, lexical diversity, stopword ratio.
    * Ratios are exact-integer divisions surfaced as double (deterministic). */
  def qualityMetrics(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = tokens(col(textCol))
    val nTok = size(t)
    val nDistinct = size(array_distinct(t))
    val stopwords = Seq("the", "a", "of", "and", "in")
    val nStop = size(filter(t, x => x.isInCollection(stopwords)))
    df.withColumn("n_chars_obs", length(col(textCol)))
      .withColumn("n_tokens", nTok)
      .withColumn("n_distinct", nDistinct)
      .withColumn("n_stopwords", nStop)
      // chars excluding the n-1 separators, per token
      .withColumn("avg_token_len",
        (length(col(textCol)) - (nTok - lit(1))).cast("double") / nTok)
      .withColumn("distinct_ratio", nDistinct.cast("double") / nTok)
      .withColumn("stopword_ratio", nStop.cast("double") / nTok)
  }

  /** Repetition metrics (the Gopher-style repetition quality gate): the
    * mass of the most frequent token and of the most frequent n-gram as a
    * fraction of the document — boilerplate and degenerate generations
    * score high and get filtered before training. Two grouped aggregations
    * (token grain, n-gram grain) joined on the document key; fractions are
    * single IEEE divisions of exact counts, so a SQL oracle replays them
    * bit-for-bit.
    *
    * @param ngrams (doc_id, shingle) rows WITH multiplicity — the shared
    *               shingle stage, so the n-gram pass reuses the persisted
    *               corpus intermediate instead of re-deriving it. */
  def repetitionMetrics(docs: DataFrame, ngrams: DataFrame,
                        textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val uni = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("n"))
      .groupBy(col(idCol))
      .agg(sum(col("n")).as("n_tokens"), max(col("n")).as("top_token_n"))
    val tri = ngrams
      .groupBy(col(idCol), col("shingle")).agg(count(lit(1)).as("n"))
      .groupBy(col(idCol))
      .agg(sum(col("n")).as("n_trigrams"), max(col("n")).as("top_trigram_n"))
    uni.join(tri, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"), col("top_token_n"),
        (col("top_token_n").cast("double") / col("n_tokens")).as("top_token_frac"),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("top_trigram_n"), lit(0L)).as("top_trigram_n"),
        coalesce(col("top_trigram_n").cast("double") / col("n_trigrams"), lit(0.0))
          .as("top_trigram_frac"))
      .withColumn("repetitive",
        col("top_token_frac") > 0.2 || col("top_trigram_frac") > 0.18)
  }

  /** Language-ID heuristic: marker-token scoring per candidate language,
    * argmax with deterministic tie-break (scores then fixed precedence).
    * A real pipeline would use char-n-gram profiles; the mechanism — per-row
    * scoring against broadcastable profiles, no shuffle — is identical. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "fr" -> Seq("le", "la", "et", "des"),
    "es" -> Seq("el", "los", "y", "de"))

  def langScores(text: Column): Seq[(String, Column)] =
    langMarkers.map { case (lang, markers) =>
      lang -> size(filter(tokens(text), x => x.isInCollection(markers)))
    }

  def langId(df: DataFrame, textCol: String = "text"): DataFrame = {
    val scored = langScores(col(textCol)).foldLeft(df) {
      case (d, (lang, c)) => d.withColumn(s"score_$lang", c)
    }
    // precedence order = langMarkers order on ties
    val best = langMarkers.map(_._1).tail.foldLeft(
      (col(s"score_${langMarkers.head._1}"), lit(langMarkers.head._1))) {
      case ((bestScore, bestLang), lang) =>
        val sc = col(s"score_$lang")
        (when(sc > bestScore, sc).otherwise(bestScore),
          when(sc > bestScore, lit(lang)).otherwise(bestLang))
    }._2
    scored.withColumn("predicted_lang",
      when(col(s"score_${langMarkers.head._1}") <= 0 &&
        langMarkers.tail.map(m => col(s"score_${m._1}") <= 0).reduce(_ && _),
        lit("unknown")).otherwise(best))
  }

  /** TF-IDF in ONE pass over the token stream (SURVEY §2.9 L3): term
    * frequency per (doc, token), then document frequency as a COUNT
    * WINDOW over the tf rows — tf rows are unique per (doc, token) by
    * construction, so `count(*) over (partition by tok)` IS the number of
    * documents carrying the token. The pre-r21 shape derived df from a
    * second explode of the corpus (distinct + aggregate + broadcast
    * join-back): the r21 plan audit showed the token explode — the
    * scan-stage-heavy part the input is balanced FOR — running twice per
    * query. The window costs one exchange of the already-aggregated tf
    * rows (narrow, vocabulary-bounded per doc), strictly cheaper than
    * re-exploding the corpus. Ranking uses the exact rational tf/df
    * (single double division of exact integers — engine-deterministic);
    * the tfidf score itself is floor-quantized. */
  def tfidf(docs: DataFrame, textCol: String = "text",
            idCol: String = "doc_id", topPerDoc: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol), explode(tokens(col(textCol))).as("tok"))
    val tf = toks.groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("tf"))
    val n = docs.select(countDistinct(col(idCol)).as("n_docs"))
    tf.withColumn("df", count(lit(1)).over(Window.partitionBy(col("tok"))))
      .crossJoin(broadcast(n))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col(idCol))
          .orderBy((col("tf").cast("double") / col("df")).desc, col("tok"))))
      .filter(col("rnk") <= topPerDoc)
      .withColumn("tfidf_q",
        floor(col("tf") * log(col("n_docs").cast("double") / col("df")) * 10000).cast("long"))
      .select(col(idCol), col("rnk"), col("tok"), col("tf"), col("df"), col("tfidf_q"))
  }

  /** Rolling-hash document fingerprint: polynomial fold over the token
    * stream, h = (h·131 + v(tok)) mod (2³¹−1), where v(tok) is the first
    * md5 byte of the token (engine-portable). Order-sensitive — unlike the
    * md5 [[fingerprint]] it distinguishes permuted documents — and purely
    * integer, so the SQL oracle replays it exactly (left fold: Spark
    * `aggregate` HOF ≡ DuckDB `list_reduce`). */
  def rollingFingerprint(textCol: String = "text"): Column =
    expr(
      s"""aggregate(
         |  transform(split($textCol, ' '), t ->
         |    cast((instr('0123456789abcdef', substring(md5(t), 1, 1)) - 1) * 16
         |       + (instr('0123456789abcdef', substring(md5(t), 2, 1)) - 1) as bigint)),
         |  cast(0 as bigint),
         |  (acc, v) -> (acc * 131 + v) % 2147483647)""".stripMargin)

  /** Document fingerprint: md5 over the normalization pipeline
    * lower → strip non-alphanumerics → collapse whitespace. Near-identical
    * formatting variants collapse to one fingerprint (exact-dedup key). */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  /** Overlapping token-window chunking — the pre-tokenization step for
    * context-window training and retrieval pipelines. Windows are counted
    * in the [[tokens]] contract unit. Windows of
    * `chunkTokens` at `stride` (overlap = chunkTokens − stride); the final
    * window truncates at the document end, sub-window documents stay
    * whole. Pure per-row column algebra (split → sequence → explode →
    * slice): embarrassingly parallel, partitioning-independent, no
    * shuffle. Chunk counts use integer-only arithmetic —
    * ceil((n−c)/s)+1 as (n−c+s−1) div s + 1 on positives — because float
    * ceil and negative integer-division semantics both differ across
    * engines. Returns (id, chunk_id, n_chunk_tokens, chunk_text). */
  def chunk(docs: DataFrame, chunkTokens: Int = 64, stride: Int = 48,
            textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(chunkTokens > 0 && stride > 0 && stride <= chunkTokens,
      "need 0 < stride <= chunkTokens")
    docs
      .select(col(idCol), split(col(textCol), " ").as("toks"))
      .withColumn("n_tok", size(col("toks")))
      .withColumn("n_chunks",
        when(col("n_tok") > chunkTokens,
          expr(s"(n_tok - $chunkTokens + ${stride - 1}) div $stride").cast("int") + 1)
          .otherwise(lit(1)))
      .withColumn("chunk_id", explode(expr("sequence(0, n_chunks - 1)")))
      .select(col(idCol), col("chunk_id").cast("int").as("chunk_id"),
        expr(s"slice(toks, chunk_id * $stride + 1, $chunkTokens)").as("ctoks"))
      .select(col(idCol), col("chunk_id"),
        size(col("ctoks")).cast("int").as("n_chunk_tokens"),
        concat_ws(" ", col("ctoks")).as("chunk_text"))
  }

  /** Exact token COST of each document under [[chunk]]'s windowing — the
    * number of token slots it will occupy in the chunked training set,
    * overlap included: every chunk but the last carries exactly
    * `chunkTokens` tokens, the last carries the remainder, so the cost
    * collapses to the closed form `n_tok + (n_chunks − 1)·(chunkTokens −
    * stride)` with [[chunk]]'s integer-only n_chunks arithmetic
    * (TextAnalysisSpec pins it equal to chunk().sum(n_chunk_tokens)).
    * Per-row column algebra, no explode — the cheap way to budget in the
    * [[tokens]] contract unit (q105, [[graft.streaming.DomainQuota]]'s
    * token mode) without materializing the chunks; at ingest,
    * pre-materialize this column once so cap queries stay text-free scans
    * like q93. */
  def chunkTokenCost(docs: DataFrame, chunkTokens: Int = 64, stride: Int = 48,
                     textCol: String = "text", costCol: String = "token_cost"): DataFrame = {
    require(chunkTokens > 0 && stride > 0 && stride <= chunkTokens,
      "need 0 < stride <= chunkTokens")
    docs.withColumn("__ctc_n_tok", size(split(col(textCol), " ")))
      .withColumn("__ctc_n_chunks",
        when(col("__ctc_n_tok") > chunkTokens,
          expr(s"(__ctc_n_tok - $chunkTokens + ${stride - 1}) div $stride").cast("int") + 1)
          .otherwise(lit(1)))
      .withColumn(costCol,
        (col("__ctc_n_tok") +
          (col("__ctc_n_chunks") - 1) * (chunkTokens - stride)).cast("long"))
      .drop("__ctc_n_tok", "__ctc_n_chunks")
  }

  /** PII patterns, restricted to the Java-regex ∩ RE2 common dialect (no
    * backrefs, no lookaround) so the Spark battery, the DuckDB oracle, and
    * any RE2-based downstream compile them identically. */
  val PiiEmail = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PiiIpv4 = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PiiPhone = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** Typed PII scrub: emails, IPv4 addresses, and phone numbers replaced by
    * TYPE-specific placeholders, with a per-type count audit. Pass order is
    * part of the operator's definition — emails, then IPs, then phones,
    * each pass over the previous pass's output — so overlapping pattern
    * families can never double-redact. Adds `n_emails`, `n_ipv4`,
    * `n_phones`, and `cleanCol` (the scrubbed text); all six regex passes
    * fuse into one whole-stage-codegen'd projection, zero shuffles. Shared
    * by the batch query (q94) and the at-ingest audit
    * ([[graft.streaming.IngestCuration.processBatch]]). */
  def piiScrub(df: DataFrame, textCol: String = "text",
               cleanCol: String = "clean_text"): DataFrame =
    df.withColumn("n_emails", regexp_count(col(textCol), lit(PiiEmail)))
      .withColumn("__pii_t1", regexp_replace(col(textCol), PiiEmail, "<EMAIL>"))
      .withColumn("n_ipv4", regexp_count(col("__pii_t1"), lit(PiiIpv4)))
      .withColumn("__pii_t2", regexp_replace(col("__pii_t1"), PiiIpv4, "<IP>"))
      .withColumn("n_phones", regexp_count(col("__pii_t2"), lit(PiiPhone)))
      .withColumn(cleanCol, regexp_replace(col("__pii_t2"), PiiPhone, "<PHONE>"))
      .drop("__pii_t1", "__pii_t2")

  /** Character-bigram LM with add-one smoothing, fitted on a reference
    * corpus — the classic KenLM-style fluency filter scaled down to the
    * algebra a SQL oracle can replay. Returns (qp, default): `qp(bg)` is
    * the smoothed bigram probability quantized to ppm —
    * floor(10⁶·(c(bg)+1)/(t(prev)+V)) — and `default(prev)` the unseen-
    * bigram value floor(10⁶·1/(t(prev)+V)) per seen context. V = 27
    * (a–z + space, the corpus alphabet).
    *
    * Quantizing each probability to an INTEGER ppm up front is the
    * determinism device: per-document scores become exact integer sums —
    * order-independent under any partitioning — instead of float
    * accumulations in corpus order (and it sidesteps log(), which unlike
    * sqrt/÷/× is NOT IEEE correctly-rounded and differs across libm
    * builds). The double math inside the quantization (10⁶·(c+1) then ÷)
    * is two correctly-rounded ops on integer-valued operands — bit-equal
    * in any engine at any count magnitude.
    *
    * The driver-side collect is bounded by |alphabet|² = 729 rows — a true
    * CONSTANT, unlike the corpus-derived sets the battery refuses to
    * broadcast unguarded (q92's recurring blocks): growing the corpus
    * grows the counts, never the table. */
  def bigramLm(ref: DataFrame, textCol: String = "text")
      : (Map[String, Long], Map[String, Long]) = {
    val V = 27
    // Reference docs shorter than 2 chars contribute no bigrams — filter
    // them BEFORE the transform: sequence(1, 0) steps DOWN to [1, 0] in
    // Spark (unlike SQL range(1, length) which is empty), so an unfiltered
    // 1-char doc would inject bogus 1-char "bigram" keys (and an empty doc
    // "" keys that blow up the substring(0, 1) context derivation below).
    // Mirrors lmFluency's scoring-side filter.
    val counts = ref
      .filter(length(col(textCol)) >= 2)
      .select(explode(expr(
        s"transform(sequence(1, length($textCol) - 1), i -> substring($textCol, i, 2))"))
        .as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ctx = counts.groupMapReduce(_._1.substring(0, 1))(_._2)(_ + _)
    val qp = counts.map { case (bg, c) =>
      bg -> math.floor(1000000.0 * (c + 1) / (ctx(bg.substring(0, 1)) + V)).toLong
    }
    val default = ctx.map { case (p, t) =>
      p -> math.floor(1000000.0 * 1 / (t + V)).toLong
    }
    (qp, default)
  }

  /** Score every document under a fitted [[bigramLm]]: mean quantized
    * bigram probability in ppm (higher = more like the reference). Bigrams
    * absent from the model fall back to the context default, then to the
    * empty-context floor(10⁶/27). One codegen'd per-row projection — the
    * model rides along as two map literals (≤729 + 27 entries), zero
    * shuffles, no UDF; documents shorter than 2 chars are dropped (they
    * have no bigrams). */
  def lmFluency(docs: DataFrame, qp: Map[String, Long],
                default: Map[String, Long], textCol: String = "text"): DataFrame =
    docs.filter(length(col(textCol)) >= 2)
      .withColumn("n_bigrams", (length(col(textCol)) - 1).cast("long"))
      .withColumn("__bg_sum",
        bigramSumCol(docs.sparkSession, qp, default, col(textCol)))
      .withColumn("fluency_ppm", expr("__bg_sum div n_bigrams"))
      .drop("__bg_sum")

  /** The quantized bigram sum of one text value under a fitted [[bigramLm]]
    * — the shared core of [[lmFluency]] and [[withFluencyPpm]]. ASCII models
    * score through the codegen'd BigramLmScore primitive (one array load per
    * character — the HOF formulation was the battery's slowest entry at
    * 5.1 s / sf0.1); a model with non-ASCII keys keeps the general HOF path,
    * value-identical by construction. Callers guarantee length >= 2 (filter
    * or `when` guard): sequence() steps DOWN on an empty range. */
  private def bigramSumCol(spark: org.apache.spark.sql.SparkSession,
                           qp: Map[String, Long], default: Map[String, Long],
                           text: Column): Column = {
    val emptyCtx = math.floor(1000000.0 / 27).toLong
    graft.functions.BigramLmScore.tables(qp, default, emptyCtx) match {
      case Some((t, d)) =>
        graft.functions.GraftFunctions.register(spark)
        call_function("graft_bigram_score", text,
          typedLit(t), typedLit(d), lit(emptyCtx))
      case None =>
        val mq = typedLit(qp)
        val md = typedLit(default)
        aggregate(
          transform(sequence(lit(1), length(text) - 1),
            i => text.substr(i, lit(2))),
          lit(0L), (acc, b) => acc + coalesce(element_at(mq, b),
            element_at(md, b.substr(lit(1), lit(1))),
            lit(emptyCtx)))
    }
  }

  /** Column form of [[lmFluency]] for fused single-projection pipelines:
    * adds `fluency_ppm` IN PLACE — null (instead of a dropped row) for docs
    * shorter than 2 chars, so it composes with other per-row gates without
    * forcing its own filter + join; value-identical to [[lmFluency]] on
    * scoreable rows by the shared [[bigramSumCol]] (IngestCurationSpec pins
    * the equality against the batch operator). */
  def withFluencyPpm(df: DataFrame, qp: Map[String, Long],
                     default: Map[String, Long],
                     textCol: String = "text"): DataFrame =
    df.withColumn("__flu_sum",
        when(length(col(textCol)) >= 2,
          bigramSumCol(df.sparkSession, qp, default, col(textCol))))
      .withColumn("__flu_nb", (length(col(textCol)) - 1).cast("long"))
      .withColumn("fluency_ppm", expr("__flu_sum div __flu_nb"))
      .drop("__flu_sum", "__flu_nb")
}
