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
  * Scale shape: the fit is one exploded groupBy with map-side combine whose
  * OUTPUT is bounded by the feature dimension D (default 1024) — a
  * constant-size driver collect like bigramLm's ≤729 rows, never
  * corpus-sized; scoring is one codegen'd per-row projection with the
  * complete weight table riding the plan as a D-long array literal
  * (element_at is O(1) — unlike a string-keyed map literal's linear scan),
  * zero shuffles.
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

  /** All character n-grams of `textCol` as an array column. Callers filter
    * length >= n FIRST: sequence() steps DOWN for an empty range (the
    * bigramLm lesson), so sub-n docs must never reach the transform. */
  private def grams(textCol: String, n: Int): Column =
    expr(s"transform(sequence(1, length($textCol) - ${n - 1})," +
      s" i -> substring($textCol, i, $n))")

  /** Per-bucket n-gram counts of one class: (bucket, c) plus the class
    * total. Output is ≤ dim rows — constant-bounded at any corpus size. */
  private def classCounts(docs: DataFrame, textCol: String, dim: Int, n: Int)
      : (Map[Int, Long], Long) = {
    val rows = docs
      .filter(length(col(textCol)) >= n)
      .select(explode(grams(textCol, n)).as("g"))
      .groupBy(bucketOf(col("g"), dim).as("bucket"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1))
    (rows.toMap, rows.map(_._2).sum)
  }

  /** Fit the classifier: positives as-is, negatives derived from them by
    * [[shuffleTokens]]. Returns the COMPLETE weight table — exactly `dim`
    * longs, every bucket defined through the smoothing, so scoring needs no
    * out-of-vocabulary fallback. */
  def fit(pos: DataFrame, textCol: String = "text",
          dim: Int = DefaultDim, n: Int = DefaultN): Array[Long] = {
    val neg = pos.select(shuffleTokens(col(textCol)).as(textCol))
    val (pc, pt) = classCounts(pos.select(col(textCol)), textCol, dim, n)
    val (nc, nt) = classCounts(neg, textCol, dim, n)
    Array.tabulate(dim) { b =>
      math.floor(1000000.0 * (pc.getOrElse(b, 0L) + 1) / (pt + dim)).toLong -
        math.floor(1000000.0 * (nc.getOrElse(b, 0L) + 1) / (nt + dim)).toLong
    }
  }

  /** Score documents under a fitted weight table: `n_grams` and
    * `quality_score` = mean bucket weight (double — ONE division of exact
    * integer operands). Documents shorter than `n` chars have no features
    * and are dropped, mirroring [[TextAnalysis.lmFluency]]. */
  def score(docs: DataFrame, weights: Array[Long], textCol: String = "text",
            n: Int = DefaultN): DataFrame = {
    val dim = weights.length
    val wSum = aggregate(
      transform(grams(textCol, n),
        g => element_at(typedLit(weights), bucketOf(g, dim) + 1)),
      lit(0L), (acc, x) => acc + x)
    docs.filter(length(col(textCol)) >= n)
      .withColumn("n_grams", (length(col(textCol)) - (n - 1)).cast("long"))
      .withColumn("__w_sum", wSum)
      .withColumn("quality_score", col("__w_sum").cast("double") / col("n_grams"))
      .drop("__w_sum")
  }
}
