package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd trained-quality scorer: the sum of per-bucket weights over a
  * document's hashed character n-grams, with the fitted weight table baked
  * into the expression as a flat `long[dim]` (the [[BigramLmScore]] pattern,
  * one model over).
  *
  * Why a custom Catalyst Expression: the composable HOF formulation
  * (`aggregate(transform(grams), g -> element_at(weights, md5-bucket(g)))`)
  * allocates one substring + one hex md5 string + one string→int parse PER
  * CHARACTER per document — measured 5.5 s warm / 17.2 s cold for q104 at
  * sf0.1, the battery's slowest entry. This expression is a tight loop over
  * the UTF8String bytes with the md5 amortized away: the bucket of an n-gram
  * depends only on its bytes and the dimension (never the weights), so a
  * process-wide `short[2^21]` memo table (ASCII trigram → bucket, keyed by
  * the three 7-bit chars) turns steady-state scoring into one array load per
  * character. Cache misses and non-ASCII n-grams compute the real digest on
  * a thread-local MessageDigest — no hex round-trip, first two digest bytes
  * used directly. Racy memo initialization is benign: every writer stores
  * the same deterministic value, and aligned short stores do not tear.
  *
  * Semantics are EXACTLY the HOF path's, kept in
  * [[graft.operators.QualityClassifier.scoreHof]] as the value-equality
  * reference: bucket = `conv(substring(md5(gram),1,4),16,10) % dim` — i.e.
  * the first 16 bits of the md5 of the n-gram's UTF-8 bytes, mod dim — and
  * the n-grams are CODE-POINT windows (Spark's `length`/`substring`
  * discipline; see [[BigramLmScore.charLoop]] for why UTF-16 iteration
  * would drift on astral-plane text). The ASCII byte loop runs only when
  * `numBytes == numChars`; anything multi-byte routes through the
  * code-point loop, which still memoizes its all-ASCII windows.
  */
case class QualityClassifierScore(child: Expression, weights: Array[Long],
                                  width: Int)
    extends UnaryExpression {

  require(width >= 1, s"n-gram width must be >= 1, got $width")
  require(weights.nonEmpty, "weight table must be non-empty")

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_quality_score expects string, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val cache = QualityClassifierScore.cacheFor(width, weights.length)
    if (s.numBytes == s.numChars)
      QualityClassifierScore.byteLoop(s, weights, width, cache)
    else QualityClassifierScore.charLoop(s.toString, weights, width, cache)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("qcWeights", weights, "long[]")
    val cls = QualityClassifierScore.getClass.getName.stripSuffix("$") + "$.MODULE$"
    // the memo table is process-global (4 MB per (width=3, dim) pair, never
    // serialized into the task binary); fetched once per generated class
    val cacheRef = ctx.addMutableState("short[]", "qcCache",
      v => s"$v = $cls.cacheFor($width, ${weights.length});")
    nullSafeCodeGen(ctx, ev, s => s"""
       |if ($s.numBytes() == $s.numChars()) {
       |  ${ev.value} = $cls.byteLoop($s, $wRef, $width, $cacheRef);
       |} else {
       |  ${ev.value} = $cls.charLoop($s.toString(), $wRef, $width, $cacheRef);
       |}
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QualityClassifierScore {

  private val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** One memo table per feature dimension (trigrams only — the 3×7-bit key
    * is what makes the table 2^21 and affordable; other widths skip the
    * cache). Buckets must fit a non-negative short, so dim > 32767 also
    * skips. -1 = unfilled. */
  private val caches = new ConcurrentHashMap[Integer, Array[Short]]()

  def cacheFor(width: Int, dim: Int): Array[Short] =
    if (width != 3 || dim > 32767) null
    else caches.computeIfAbsent(dim, _ => Array.fill((1 << 21))(-1: Short))

  /** Bucket of the md5 of `bytes`: first two digest bytes big-endian, mod
    * dim — exactly `conv(substring(md5(g),1,4),16,10) % dim` without the
    * hex round-trip. */
  private def md5Bucket(bytes: Array[Byte], dim: Int): Int = {
    val d = digest.get(); d.reset()
    val h = d.digest(bytes)
    (((h(0) & 0xff) << 8) | (h(1) & 0xff)) % dim
  }

  private def md5BucketAt(s: UTF8String, from: Int, w: Int, dim: Int): Int = {
    val d = digest.get(); d.reset()
    var j = 0
    while (j < w) { d.update(s.getByte(from + j)); j += 1 }
    val h = d.digest()
    (((h(0) & 0xff) << 8) | (h(1) & 0xff)) % dim
  }

  /** Byte path (numBytes == numChars): byte windows ARE code-point
    * windows. The memo is used only when all three bytes are genuine
    * ASCII (< 0x80): numBytes == numChars also holds for SOME invalid
    * UTF-8 (standalone continuation bytes count as one char), and masking
    * such bytes into a 7-bit key would collide two different trigrams on
    * one process-global slot — whichever computed first would poison the
    * shared cache for the real ASCII trigram, silently and JVM-wide.
    * Static so interpreted eval, generated code, and the spec's plain-JVM
    * replay share one JIT-compiled definition. */
  def byteLoop(s: UTF8String, weights: Array[Long], w: Int,
               cache: Array[Short]): Long = {
    val dim = weights.length
    val n = s.numBytes
    val memo = cache != null // implies w == 3
    var acc = 0L
    var i = 0
    while (i + w <= n) {
      var bk = -1
      var key = -1
      if (memo) {
        val b0 = s.getByte(i); val b1 = s.getByte(i + 1); val b2 = s.getByte(i + 2)
        if (((b0 | b1 | b2) & 0x80) == 0) {
          key = (b0 << 14) | (b1 << 7) | b2
          bk = cache(key)
        }
      }
      if (bk < 0) {
        bk = md5BucketAt(s, i, w, dim)
        if (key >= 0) cache(key) = bk.toShort
      }
      acc += weights(bk)
      i += 1
    }
    acc
  }

  /** General path: windows over CODE POINTS, md5 over each window's UTF-8
    * bytes. All-ASCII windows inside a multi-byte document still hit the
    * memo table. */
  def charLoop(str: String, weights: Array[Long], w: Int,
               cache: Array[Short]): Long = {
    val dim = weights.length
    val n = str.length
    if (n == 0) return 0L
    val off = new Array[Int](n + 1)
    var i = 0
    var cnt = 0
    while (i < n) { off(cnt) = i; cnt += 1; i += Character.charCount(str.codePointAt(i)) }
    off(cnt) = n
    val memo = cache != null // implies w == 3
    var acc = 0L
    var k = 0
    while (k + w <= cnt) {
      val a = off(k)
      val b = off(k + w)
      var bk = -1
      var key = -1
      if (memo && b - a == 3 && str.charAt(a) < 128 &&
          str.charAt(a + 1) < 128 && str.charAt(a + 2) < 128) {
        key = (str.charAt(a) << 14) | (str.charAt(a + 1) << 7) | str.charAt(a + 2)
        bk = cache(key)
      }
      if (bk < 0) {
        bk = md5Bucket(str.substring(a, b).getBytes(StandardCharsets.UTF_8), dim)
        if (key >= 0) cache(key) = bk.toShort
      }
      acc += weights(bk)
      k += 1
    }
    acc
  }
}
