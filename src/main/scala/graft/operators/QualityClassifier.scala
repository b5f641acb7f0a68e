package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained document-quality classifier (SURVEY §2.9 L3) — the fastText-style
  * linear scorer every production curation stack runs beside its heuristic
  * gates: hashed character-n-gram features → per-bucket linear weights →
  * per-document score. The heuristics (q38 metrics, q77 repetition, q99
  * bigram LM) measure fixed formulas; this operator LEARNS its weights from
  * labeled data.
  *
  * Training convention (the reference-slice discipline of q59/q99, extended
  * to the classic real-vs-shuffled setup): positives are the benchmark-
  * quality `src0` documents as written; negatives are the SAME documents
  * with their tokens re-ordered into md5-of-token order — a pseudo-random,
  * fully deterministic shuffle (see [[shuffleTokens]]) that preserves every
  * unigram statistic while destroying local word order, so the classifier
  * is forced to learn fluency structure rather than vocabulary. That is the
  * standard "quality = looks like reference, not like scrambled reference"
  * trick, with the usual RNG replaced by the battery's md5 discipline so a
  * SQL oracle reproduces the exact training set.
  *
  * Model algebra — correctly-rounded ops only, like q99's LM (no log, no
  * exp, no iterative optimizer whose float schedule an oracle could not
  * replay): each class's bucket distribution gets add-one smoothing and is
  * quantized to integer ppm, and the weight of bucket b is
  *
  *   w(b) = floor(10⁶·(cpos(b)+1)/(tpos+D)) − floor(10⁶·(cneg(b)+1)/(tneg+D))
  *
  * — a naive-Bayes-flavored linear discriminant in probability (not log)
  * space. A document's score is the mean weight of its hashed n-grams: an
  * exact integer sum divided once (one IEEE division of exact integers —
  * bit-equal in any engine). Positive ≈ reads like the reference; ≤ 0 ≈
  * reads like scrambled text.
  *
  * Scale shape: the fit is ONE exploded groupBy with map-side combine whose
  * OUTPUT is bounded by the feature dimension D (default 1024) — a
  * constant-size driver collect like bigramLm's ≤729 rows, never
  * corpus-sized; scoring is one codegen'd per-row projection through the
  * native [[graft.functions.QualityClassifierScore]] expression (weight
  * table baked in as `long[D]`, md5 bucketing amortized through a
  * process-global trigram memo — steady-state one array load per
  * character), zero shuffles.
  */
object QualityClassifier {

  /** Feature dimension: hashed n-gram buckets. 2^10 keeps the in-plan
    * literal small; collisions are the hashing-trick contract. */
  val DefaultDim = 1024

  /** Character n-gram width. 3 is the fastText default for quality LMs. */
  val DefaultN = 3

  /** Deterministic pseudo-random token shuffle: tokens are re-joined in
    * md5(token) order. All-ASCII sort keys, so Spark's binary UTF8 ordering
    * and an oracle's byte-wise collation agree; duplicate tokens compare
    * equal as full keys, so ties cannot reorder distinct content. */
  def shuffleTokens(text: Column): Column =
    array_join(
      transform(
        array_sort(transform(split(text, " "), t => concat(md5(t), lit(":"), t))),
        s => s.substr(lit(34), length(s) - 33)),
      " ")

  /** Bucket of one n-gram: the first 16 bits of its md5, mod D — the same
    * h16 primitive as q91/q95's admission hashing, keyed on content. */
  private def bucketOf(gram: Column, dim: Int): Column =
    pmod(conv(substring(md5(gram), 1, 4), 16, 10).cast("int"), lit(dim))

  /** All character n-grams of `t` as an array column. Callers filter
    * length >= n FIRST: sequence() steps DOWN for an empty range (the
    * bigramLm lesson), so sub-n docs must never reach the transform. */
  private def grams(t: Column, n: Int): Column =
    transform(sequence(lit(1), length(t) - lit(n - 1)), i => t.substr(i, lit(n)))

  /** Fit the classifier: positives as-is, negatives derived from them by
    * [[shuffleTokens]]. Returns the COMPLETE weight table — exactly `dim`
    * longs, every bucket defined through the smoothing, so scoring needs no
    * out-of-vocabulary fallback.
    *
    * ONE pass over the positive slice: each row contributes its real
    * n-grams tagged p=1 and its shuffled-text n-grams tagged p=0 into a
    * single exploded groupBy emitting (bucket, pos_c, neg_c) — output still
    * ≤ dim rows, but the source is scanned (and md5-transformed) once, not
    * twice. The single length filter is sound because [[shuffleTokens]]
    * preserves length exactly: split-on-space + rejoin-with-space keeps the
    * token multiset and separator count. */
  def fit(pos: DataFrame, textCol: String = "text",
          dim: Int = DefaultDim, n: Int = DefaultN): Array[Long] = {
    val rows = pos
      .filter(length(col(textCol)) >= n)
      .select(col(textCol).as("__t"), shuffleTokens(col(textCol)).as("__s"))
      .select(explode(concat(
        transform(grams(col("__t"), n), g => struct(g.as("g"), lit(1L).as("p"))),
        transform(grams(col("__s"), n), g => struct(g.as("g"), lit(0L).as("p")))))
        .as("e"))
      .groupBy(bucketOf(col("e.g"), dim).as("bucket"))
      .agg(sum(col("e.p")).as("pos_c"), sum(lit(1L) - col("e.p")).as("neg_c"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2)))
    val pc = rows.map { case (b, (p, _)) => b -> p }.toMap
    val nc = rows.map { case (b, (_, q)) => b -> q }.toMap
    val pt = pc.values.sum
    val nt = nc.values.sum
    Array.tabulate(dim) { b =>
      math.floor(1000000.0 * (pc.getOrElse(b, 0L) + 1) / (pt + dim)).toLong -
        math.floor(1000000.0 * (nc.getOrElse(b, 0L) + 1) / (nt + dim)).toLong
    }
  }

  /** Score documents under a fitted weight table: `n_grams` and
    * `quality_score` = mean bucket weight (double — ONE division of exact
    * integer operands). Documents shorter than `n` chars have no features
    * and are dropped, mirroring [[TextAnalysis.lmFluency]].
    *
    * Scoring runs through the codegen'd
    * [[graft.functions.QualityClassifierScore]] primitive (one memoized
    * array load per character in steady state — the HOF formulation kept in
    * [[scoreHof]] allocated substring+md5-hex+parse per character and was
    * the battery's slowest entry at 5.5 s / sf0.1, the exact q99 history
    * replayed one model over). */
  def score(docs: DataFrame, weights: Array[Long], textCol: String = "text",
            n: Int = DefaultN): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val wSum = call_function("graft_quality_score", col(textCol),
      typedLit(weights), lit(n))
    scored(docs, wSum, textCol, n)
  }

  /** Column form of [[score]] for fused single-projection pipelines: adds
    * `quality_score` IN PLACE — null (instead of a dropped row) for docs
    * shorter than `n` chars, so it composes with other per-row gates
    * without forcing its own filter + join; value-identical to [[score]]
    * on scoreable rows (same native expression, same one-division algebra;
    * IngestCurationSpec pins the equality against the batch operator). */
  def withScore(docs: DataFrame, weights: Array[Long], textCol: String = "text",
                n: Int = DefaultN): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.withColumn("__w_sum",
        when(length(col(textCol)) >= n,
          call_function("graft_quality_score", col(textCol),
            typedLit(weights), lit(n))))
      .withColumn("quality_score", col("__w_sum").cast("double") /
        (length(col(textCol)) - (n - 1)).cast("long"))
      .drop("__w_sum")
  }

  /** The original HOF formulation — value-identical to [[score]] by
    * construction (QualityClassifierSpec pins equality, non-ASCII rows
    * included); kept as the composable reference implementation. */
  def scoreHof(docs: DataFrame, weights: Array[Long], textCol: String = "text",
               n: Int = DefaultN): DataFrame = {
    val dim = weights.length
    val wSum = aggregate(
      transform(grams(col(textCol), n),
        g => element_at(typedLit(weights), bucketOf(g, dim) + 1)),
      lit(0L), (acc, x) => acc + x)
    scored(docs, wSum, textCol, n)
  }

  private def scored(docs: DataFrame, wSum: Column, textCol: String,
                     n: Int): DataFrame =
    docs.filter(length(col(textCol)) >= n)
      .withColumn("n_grams", (length(col(textCol)) - (n - 1)).cast("long"))
      .withColumn("__w_sum", wSum)
      .withColumn("quality_score", col("__w_sum").cast("double") / col("n_grams"))
      .drop("__w_sum")
}
