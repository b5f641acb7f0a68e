package graft.streaming

import java.nio.file.Files

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Mix-aware admission: rates derive from the CorpusStats registry and the
  * target, overrepresented strata downsample (underrepresented admit all —
  * downsample-only), the corpus mix converges toward the target across
  * batches, and at-least-once replay is idempotent in verdicts AND
  * accounting. */
class MixBalanceSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def mkDocs(ids: Range, lang: String, chars: Long = 100L) =
    ids.map(i => (i.toLong, "s", lang, chars)).toDF("doc_id", "source", "lang", "n_chars")

  private def share(reg: String, lang: String): Double = {
    val card = CorpusStats.report(spark, reg)
      .filter($"gid" === 1 && $"lang" === lang) // lang-grain rows
      .select($"share_ppm").as[Long].collect()
    card.headOption.getOrElse(0L).toDouble / 1e6
  }

  test("cold start admits everything; skewed corpus throttles only the heavy stratum") {
    val reg = tmp("graft_mix_cold")
    val v0 = MixBalance.processBatch(
      mkDocs(0 until 20, "en"), reg, Map("en" -> 500000L, "fr" -> 500000L))
      .select($"mix_rate", $"mix_admitted").collect()
    assert(v0.forall(r => r.getDouble(0) == 1.0 && r.getBoolean(1)),
      "an empty registry must admit everything at rate 1")
    // corpus is now 100% en vs a 50/50 target: en throttles, fr stays open
    val r = MixBalance.rates(spark, reg, Map("en" -> 500000L, "fr" -> 500000L))
    assert(r("fr") == 1.0, s"underrepresented stratum admits all: $r")
    assert(r("en") < 0.6 && r("en") > 0.4,
      s"en at share 1.0 vs target 0.5 must throttle to ~0.5: $r")
    // an untargeted stratum admits everything (unlisted-default-keep-all)
    val vz = MixBalance.processBatch(
      mkDocs(100 until 110, "zz"), reg, Map("en" -> 500000L, "fr" -> 500000L))
      .select($"mix_rate", $"mix_admitted").collect()
    assert(vz.forall(r2 => r2.getDouble(0) == 1.0 && r2.getBoolean(1)), s"${vz.toSeq}")
  }

  test("a zero target rejects from cold start — excluded strata never leak into the corpus") {
    val reg = tmp("graft_mix_zero")
    val targets = Map("en" -> 1000000L, "xx" -> 0L)
    val v0 = MixBalance.processBatch(mkDocs(0 until 10, "xx"), reg, targets)
      .select($"mix_rate", $"mix_admitted").collect()
    assert(v0.forall(r => r.getDouble(0) == 0.0 && !r.getBoolean(1)),
      s"zero-target stratum must reject even on an empty registry: ${v0.toSeq}")
    // nothing registered: the corpus stays empty and the card shows no xx mass
    assert(CorpusStats.readRollup(spark, reg).isEmpty &&
      CorpusStats.readRegistry(spark, reg).isEmpty,
      "rejected documents must never register")
    // and with real mass present the zero target still pins the rate to 0
    MixBalance.processBatch(mkDocs(100 until 120, "en"), reg, targets)
    val r = MixBalance.rates(spark, reg, targets)
    assert(r("xx") == 0.0 && r("en") == 1.0, s"$r")
  }

  test("balanced inflow converges a skewed corpus toward the target mix") {
    val reg = tmp("graft_mix_conv")
    // seed: 90% en mass, 10% fr
    CorpusStats.seedRegistry(mkDocs(0 until 900, "en"), reg)
    CorpusStats.seedRegistry(mkDocs(1000 until 1100, "fr"), reg)
    val target = Map("en" -> 500000L, "fr" -> 500000L)
    val gaps = (0 until 4).map { b =>
      val ids = 10000 + b * 1000
      MixBalance.processBatch(
        mkDocs(ids until ids + 200, "en")
          .union(mkDocs(ids + 500 until ids + 700, "fr")), reg, target)
        .collect()
      share(reg, "en") - 0.5
    }
    assert(gaps.head < 0.4, s"gap must shrink from batch one: $gaps")
    assert(gaps.zip(gaps.tail).forall { case (a, b) => b < a },
      s"the en excess must shrink every batch: $gaps")
    assert(gaps.last < gaps.head / 2,
      s"four balanced batches must close most of the gap: $gaps")
    // and fr was never throttled along the way
    assert(MixBalance.rates(spark, reg, target)("fr") == 1.0)
  }

  test("at-least-once replay: identical verdicts, nothing re-charged") {
    val reg = tmp("graft_mix_replay")
    CorpusStats.seedRegistry(mkDocs(0 until 80, "en"), reg)
    CorpusStats.seedRegistry(mkDocs(100 until 120, "fr"), reg)
    val target = Map("en" -> 500000L)
    val batch = mkDocs(200 until 260, "en")
    val v1 = MixBalance.processBatch(batch, reg, target)
      .select($"doc_id", $"mix_admitted").as[(Long, Boolean)].collect().sorted
    assert(v1.exists(_._2) && v1.exists(!_._2),
      s"the throttle must actually bind for this pin to mean anything: ${v1.count(_._2)}/60")
    val card1 = CorpusStats.report(spark, reg).collect().map(_.toSeq).toSeq
    val v2 = MixBalance.processBatch(batch, reg, target)
      .select($"doc_id", $"mix_admitted").as[(Long, Boolean)].collect().sorted
    assert(v2.toSeq == v1.toSeq, "replayed verdicts must be identical")
    val card2 = CorpusStats.report(spark, reg).collect().map(_.toSeq).toSeq
    assert(card2 == card1, "a replay must add nothing to the accounting")
  }
}
