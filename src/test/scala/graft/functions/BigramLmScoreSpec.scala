package graft.functions

import graft.SparkTestSession
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The codegen'd bigram scorer: byte and char loops agree on ASCII, the
  * table flattening encodes seen/context-default/empty-context exactly,
  * non-ASCII input routes through the char loop with the HOF path's miss
  * semantics, and the expression path is value-identical to the HOF path
  * on the same model. */
class BigramLmScoreSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val qp = Map("th" -> 100000L, "he" -> 90000L, "e " -> 50000L)
  private val default = Map("t" -> 9000L, "h" -> 8000L, "e" -> 7000L)
  private val empty = 37037L
  private val (table, defs) = BigramLmScore.tables(qp, default, empty).get

  test("table flattening: seen, context-default, and empty-context cells") {
    assert(table(('t'.toInt << 7) | 'h'.toInt) == 100000L)
    assert(table(('t'.toInt << 7) | 'z'.toInt) == 9000L, "unseen bigram, seen context")
    assert(table(('z'.toInt << 7) | 'q'.toInt) == empty, "unseen context")
    assert(defs('e'.toInt) == 7000L && defs('z'.toInt) == empty)
  }

  test("byte loop equals char loop on ASCII; char loop handles non-ASCII misses") {
    val ascii = "the zebra"
    assert(BigramLmScore.byteLoop(UTF8String.fromString(ascii), table, defs, empty)
      == BigramLmScore.charLoop(ascii, table, defs, empty))
    // "té": 't' seen context, 'é' >= 128 → defaults('t'); "éx": → empty
    assert(BigramLmScore.charLoop("téx", table, defs, empty) == 9000L + empty)
    // supplementary-plane chars count as ONE code point (Spark's length/
    // substring semantics), not two UTF-16 units: "t😀h" has exactly two
    // bigrams — (t,😀) → defaults('t') and (😀,h) → emptyCtx
    assert(BigramLmScore.charLoop("t😀h", table, defs, empty)
      == 9000L + empty)
  }

  test("non-ASCII model keys refuse the table (caller keeps the HOF path)") {
    assert(BigramLmScore.tables(qp + ("éz" -> 1L), default, empty).isEmpty)
    assert(BigramLmScore.tables(qp, default + ("é" -> 1L), empty).isEmpty)
  }

  test("expression path and HOF path are value-identical on the same scores") {
    val docs = Seq((1L, "the the zebra"), (2L, "heéhe"), (3L, "x"),
      (4L, "th😀th")) // astral char: code-point bigram count must match
      .toDF("doc_id", "text")
    // a non-ASCII model key that no document's context can reach forces
    // the HOF fallback while leaving every reachable score unchanged
    val viaExpr = graft.operators.TextAnalysis.lmFluency(docs, qp, default)
      .select($"doc_id", $"n_bigrams", $"fluency_ppm")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val viaHof = graft.operators.TextAnalysis.lmFluency(
        docs, qp + ("éé" -> 1L), default)
      .select($"doc_id", $"n_bigrams", $"fluency_ppm")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(viaExpr.toSeq == viaHof.toSeq, s"${viaExpr.toSeq} vs ${viaHof.toSeq}")
    // the 1-char doc has no bigrams and is dropped by both
    assert(viaExpr.map(_._1).toSeq == Seq(1L, 2L, 4L))
  }
}
