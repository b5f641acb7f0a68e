package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd char-bigram LM scorer: the sum of quantized bigram
  * probabilities over a document's character bigrams, with the fitted
  * model baked into the expression as a flat `long[16384]` lookup table
  * (ASCII pair → ppm) plus per-context defaults.
  *
  * Why a custom Catalyst Expression (the [[FloatVectorDot]] argument, one
  * axis over): the composable `aggregate(transform(sequence(...)))` HOF
  * formulation materializes a per-row array of substrings and interprets a
  * lambda tree per character — measured 5.1 s for q99 at sf0.1 and the
  * slowest entry in the battery. This expression is a tight byte loop over
  * the UTF8String with one array load per character: no allocation, no
  * per-element interpretation, inside WholeStageCodegen.
  *
  * Semantics are EXACTLY the HOF path's (LmFluencySpec's plain-JVM replay
  * and the DuckDB oracle pin both hold across the swap): qp(c1c2) =
  * model value if the bigram was seen, else the c1-context default, else
  * the empty-context floor(10⁶/V). The fast byte loop runs only when the
  * document is pure ASCII (numBytes == numChars); any multi-byte character
  * routes the row through [[BigramLmScore.charLoop]], which computes the
  * same function in char space. The TABLE is built from the fitted maps in
  * [[graft.operators.TextAnalysis.lmFluency]], which uses this expression
  * only when every model key is ASCII (the general-alphabet fallback stays
  * on the HOF path).
  */
case class BigramLmScore(child: Expression, table: Array[Long],
                         defaults: Array[Long], emptyCtx: Long)
    extends UnaryExpression {

  require(table.length == 128 * 128 && defaults.length == 128,
    s"model tables must be 128x128 + 128, got ${table.length}/${defaults.length}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_bigram_score expects string, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    if (s.numBytes == s.numChars) BigramLmScore.byteLoop(s, table, defaults, emptyCtx)
    else BigramLmScore.charLoop(s.toString, table, defaults, emptyCtx)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("bgTable", table, "long[]")
    val defRef = ctx.addReferenceObj("bgDefaults", defaults, "long[]")
    val cls = BigramLmScore.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, s => s"""
       |if ($s.numBytes() == $s.numChars()) {
       |  ${ev.value} = $cls.byteLoop($s, $tableRef, $defRef, ${emptyCtx}L);
       |} else {
       |  ${ev.value} = $cls.charLoop($s.toString(), $tableRef, $defRef, ${emptyCtx}L);
       |}
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BigramLmScore {

  /** ASCII fast path: one table load per byte pair. Kept as a static
    * method (not inlined codegen) so the interpreted eval, the generated
    * code, and any future caller share one definition — and the JIT
    * compiles the loop once for all of them. */
  def byteLoop(s: UTF8String, table: Array[Long], defaults: Array[Long],
               emptyCtx: Long): Long = {
    val n = s.numBytes
    var acc = 0L
    var i = 0
    while (i < n - 1) {
      val c1 = s.getByte(i) & 0xff
      val c2 = s.getByte(i + 1) & 0xff
      acc += (if (c1 < 128 && c2 < 128) table((c1 << 7) | c2)
        else if (c1 < 128) defaults(c1)
        else emptyCtx)
      i += 1
    }
    acc
  }

  /** General path (multi-byte input): same function in CODE-POINT space —
    * Spark's `length`/`substring` (and therefore the HOF path and the
    * n_bigrams divisor) count code points, so iterating UTF-16 units here
    * would add one spurious term per supplementary-plane character and
    * silently inflate astral-heavy documents' scores. A bigram containing
    * any non-ASCII code point cannot be in the (ASCII-only) table, so it
    * resolves to the context default or the empty-context value, exactly
    * as the HOF path's map misses do. */
  def charLoop(s: String, table: Array[Long], defaults: Array[Long],
               emptyCtx: Long): Long = {
    val n = s.length
    if (n == 0) return 0L
    var acc = 0L
    var c1 = s.codePointAt(0)
    var next = Character.charCount(c1)
    while (next < n) {
      val c2 = s.codePointAt(next)
      acc += (if (c1 < 128 && c2 < 128) table((c1 << 7) | c2)
        else if (c1 < 128) defaults(c1)
        else emptyCtx)
      c1 = c2
      next += Character.charCount(c2)
    }
    acc
  }

  /** Flatten fitted maps into the 128×128 + 128 lookup tables, or None if
    * any model key falls outside ASCII (caller then keeps the HOF path). */
  def tables(qp: Map[String, Long], default: Map[String, Long],
             emptyCtx: Long): Option[(Array[Long], Array[Long])] = {
    val ascii = qp.keys.forall(k => k.length == 2 && k.forall(_ < 128)) &&
      default.keys.forall(k => k.length == 1 && k.forall(_ < 128))
    if (!ascii) None
    else {
      val d = Array.fill(128)(emptyCtx)
      default.foreach { case (k, v) => d(k.charAt(0).toInt) = v }
      val t = new Array[Long](128 * 128)
      var c1 = 0
      while (c1 < 128) {
        var c2 = 0
        while (c2 < 128) {
          t((c1 << 7) | c2) = d(c1)
          c2 += 1
        }
        c1 += 1
      }
      qp.foreach { case (k, v) =>
        t((k.charAt(0).toInt << 7) | k.charAt(1).toInt) = v
      }
      Some((t, d))
    }
  }
}
