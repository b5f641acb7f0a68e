package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("quality metrics on a known string") {
    val df = Seq((1L, "the cat sat on the mat")).toDF("doc_id", "text")
    val r = TextAnalysis.qualityMetrics(df)
      .select($"n_chars_obs", $"n_tokens", $"n_distinct", $"n_stopwords",
        $"avg_token_len", $"distinct_ratio")
      .head()
    assert(r.getInt(0) == 22 && r.getInt(1) == 6)
    assert(r.getInt(2) == 5)          // "the" repeats
    assert(r.getInt(3) == 2)          // two "the"
    assert(math.abs(r.getDouble(4) - 17.0 / 6) < 1e-12)
    assert(math.abs(r.getDouble(5) - 5.0 / 6) < 1e-12)
  }

  test("subword count splits letter runs, digits and punctuation") {
    val df = Seq((1L, "abc de12 f.g")).toDF("doc_id", "text")
    val n = df.select(TextAnalysis.subwordCount($"text")).as[Int].head()
    // abc | de | 12 | f | . | g
    assert(n == 6)
  }

  test("fingerprint collapses case/punctuation/whitespace variants") {
    val df = Seq(
      (1L, "Hello,  World!"),
      (2L, "hello world"),
      (3L, "different")).toDF("doc_id", "text")
    val fps = df.select($"doc_id", TextAnalysis.fingerprint(lower($"text")).as("fp"))
      .as[(Long, String)].collect().toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }

  test("rolling fingerprint is order-sensitive where md5 fingerprint is not") {
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "gamma beta alpha"),  // same tokens, different order
      (3L, "alpha beta gamma")).toDF("doc_id", "text")
    val fps = df.select($"doc_id",
      TextAnalysis.rollingFingerprint().as("r")).as[(Long, Long)].collect().toMap
    assert(fps(1L) == fps(3L))
    assert(fps(1L) != fps(2L))
    assert(fps.values.forall(v => v >= 0 && v < 2147483647L))
  }

  test("tfidf: rare terms outrank common ones; tf and df are exact") {
    val df = Seq(
      (1L, "apple banana banana"),
      (2L, "apple cherry"),
      (3L, "apple date")).toDF("doc_id", "text")
    val r = TextAnalysis.tfidf(df, topPerDoc = 2)
      .select($"doc_id", $"rnk", $"tok", $"tf", $"df")
      .as[(Long, Int, String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(t => (t._3, t._4, t._5)).toSeq).toMap
    // banana: tf=2, df=1 beats apple: tf=1, df=3
    assert(r(1L) == Seq(("banana", 2L, 1L), ("apple", 1L, 3L)))
    assert(r(2L).head._1 == "cherry") // df=1 beats apple df=3
  }

  test("chunk: window/stride/overlap edge semantics") {
    def toks(n: Int): String = (1 to n).map(i => s"t$i").mkString(" ")
    val df = Seq(
      (1L, toks(3)),    // shorter than the window → one whole chunk
      (2L, toks(10)),   // exactly chunkTokens → still one chunk
      (3L, toks(11)),   // one past the window → second (truncated) chunk
      (4L, toks(26))    // 10/8: ceil((26-10)/8)+1 = 3 chunks at 0,8,16; the
                        // window at 16 reaches the end, so no 4th at 24
    ).toDF("doc_id", "text")
    val r = TextAnalysis.chunk(df, chunkTokens = 10, stride = 8)
      .select($"doc_id", $"chunk_id", $"n_chunk_tokens", $"chunk_text")
      .as[(Long, Int, Int, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
    assert(r(1L).map(c => (c._2, c._3)) == Seq((0, 3)))
    assert(r(1L).head._4 == toks(3))
    assert(r(2L).map(c => (c._2, c._3)) == Seq((0, 10)))
    assert(r(3L).map(c => (c._2, c._3)) == Seq((0, 10), (1, 3)))
    // stride 8 over 11 tokens: second chunk starts at token 9 (overlap 2)
    assert(r(3L)(1)._4 == "t9 t10 t11")
    assert(r(4L).map(c => (c._2, c._3)) == Seq((0, 10), (1, 10), (2, 10)))
    // full coverage: the last chunk's final token is the document's last token
    assert(r(4L).last._4.split(" ").last == "t26")
    // adjacent chunks overlap by chunkTokens - stride tokens
    assert(r(4L)(0)._4.split(" ").takeRight(2).toSeq ==
      r(4L)(1)._4.split(" ").take(2).toSeq)
  }

  test("langId scores markers and breaks ties by precedence") {
    val df = Seq(
      (1L, "the cat and a dog"),       // en markers
      (2L, "le chat et la mer des"),   // fr markers
      (3L, "el mar y los rios de"),    // es markers
      (4L, "nothing matching here")    // no markers
    ).toDF("doc_id", "text")
    val p = TextAnalysis.langId(df)
      .select($"doc_id", $"predicted_lang").as[(Long, String)].collect().toMap
    assert(p(1L) == "en" && p(2L) == "fr" && p(3L) == "es" && p(4L) == "unknown")
  }

  test("chunkTokenCost equals the materialized chunk token sum, overlap included") {
    // boundary zoo: sub-chunk, exact chunk, one-over, exact two-chunk
    // span, one-over-two, and a long doc
    val docs = Seq(1, 64, 65, 100, 112, 113, 200).zipWithIndex.map {
      case (n, i) => (i.toLong, Seq.tabulate(n)(j => s"t$j").mkString(" "))
    }.toDF("doc_id", "text")
    val cost = TextAnalysis.chunkTokenCost(docs)
      .select($"doc_id", $"token_cost").as[(Long, Long)].collect().toMap
    val sums = TextAnalysis.chunk(docs)
      .groupBy($"doc_id").agg(sum($"n_chunk_tokens").cast("long").as("s"))
      .as[(Long, Long)].collect().toMap
    assert(cost == sums, s"closed form must equal the explode-and-sum: $cost vs $sums")
    // spot-check the overlap charging: 113 tokens → 3 chunks → 113 + 2·16
    assert(cost(5L) == 145L, s"got ${cost(5L)}")
  }

  test("bigramLm ignores sub-bigram reference docs instead of corrupting the model") {
    // Spark's sequence(1, 0) steps DOWN to [1, 0]: an unfiltered 1-char doc
    // would double-count a bogus 1-char "bigram" key and an empty doc would
    // blow up the context derivation. The fit must equal the fit on the
    // length>=2 slice — the SQL-oracle convention, where range(1, length)
    // is simply empty for short docs.
    val dirty = Seq("ab abba", "", "x", "ba").toDF("text")
    val (qp, default) = TextAnalysis.bigramLm(dirty)
    assert(qp.keys.forall(_.length == 2), s"only true bigram keys: ${qp.keys}")
    val (qpRef, defRef) = TextAnalysis.bigramLm(Seq("ab abba", "ba").toDF("text"))
    assert(qp == qpRef && default == defRef,
      "short docs must contribute nothing, exactly like the filtered corpus")
    // and the ASCII fast path still accepts the model
    assert(graft.functions.BigramLmScore.tables(qp, default, 37037L).isDefined,
      "clean keys keep the codegen'd scorer eligible")
  }

  test("withFluencyPpm: sub-2-char docs score null IN PLACE, never drop") {
    val (qp, default) = TextAnalysis.bigramLm(
      Seq("the quick brown fox", "the lazy dog sleeps").toDF("text"))
    val docs = Seq((1L, "the quick brown"), (2L, "x"), (3L, ""))
      .toDF("doc_id", "text")
    val scored = TextAnalysis.withFluencyPpm(docs, qp, default)
    // the column form's contract for fused pipelines: every input row
    // survives (lmFluency's filter would DROP the short ones), short docs
    // carry a null score the LEFT-gate coalesce reads as pass
    assert(scored.count() == 3)
    val byId = scored.select($"doc_id", $"fluency_ppm")
      .as[(Long, Option[Long])].collect().toMap
    assert(byId(1L).isDefined && byId(2L).isEmpty && byId(3L).isEmpty, byId)
    // and the scoreable row equals the batch operator exactly
    val batch = TextAnalysis.lmFluency(docs, qp, default)
      .select($"doc_id", $"fluency_ppm").as[(Long, Long)].collect().toMap
    assert(batch.keySet == Set(1L) && byId(1L).contains(batch(1L)), (byId, batch))
  }
}
