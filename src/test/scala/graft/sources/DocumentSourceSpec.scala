package graft.sources

import java.nio.file.Files

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The ingest-edge loaders: JSONL/CSV dumps land in the canonical
  * documents shape, malformed lines are audited (never silently dropped),
  * n_chars is recomputed from text, and the loaded relation runs through a
  * battery operator unchanged. */
class DocumentSourceSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def write(name: String, lines: Seq[String]): String = {
    val d = Files.createTempDirectory("graft_src")
    Files.write(d.resolve(name), lines.mkString("\n").getBytes)
    d.resolve(name).toString
  }

  test("jsonl: canonical shape, recomputed n_chars, corrupt line audited") {
    val p = write("d.jsonl", Seq(
      """{"doc_id": 1, "text": "the quick brown fox", "lang": "en", "source": "srcA", "n_chars": 999}""",
      """{"doc_id": 2, "text": "le chat noir", "lang": "fr", "source": "srcB"}""",
      """{this is not json at all"""))
    val (clean, corrupt) = DocumentSource.audit(spark, p)
    val rows = clean.as[(Long, String, String, String, Long)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq(
      (1L, "the quick brown fox", "en", "srcA", 19L),
      (2L, "le chat noir", "fr", "srcB", 12L)),
      s"n_chars must be recomputed from text (the dump's 999 is ignored): ${rows.toSeq}")
    val bad = corrupt.as[String].collect()
    assert(bad.length == 1 && bad.head.contains("not json"),
      s"the malformed line must be captured verbatim: ${bad.toSeq}")
  }

  test("the primary loaders never emit a malformed line as an all-null row") {
    val p = write("d4.jsonl", Seq(
      """{"doc_id": 1, "text": "ok doc", "lang": "en", "source": "s"}""",
      """{nope"""))
    val rows = DocumentSource.jsonl(spark, p).collect()
    assert(rows.length == 1 && rows.head.getLong(0) == 1L,
      s"corrupt line must not surface as a phantom document: ${rows.toSeq}")
    val pc = write("d4.csv", Seq("doc_id,text,lang,source",
      "1,ok doc,en,s", "not-a-number,x,y,z"))
    val crows = DocumentSource.csv(spark, pc).collect()
    assert(crows.length == 1 && crows.head.getLong(0) == 1L, s"${crows.toSeq}")
    // a pruned query referencing no data columns must not trip Spark's
    // corrupt-column-only guard (the doc_id requirement keeps a data
    // column in the scan), and must not count phantom rows either way
    assert(DocumentSource.jsonl(spark, p).count() == 1L)
    assert(DocumentSource.csv(spark, pc).select($"text").collect()
      .map(_.getString(0)).toSeq == Seq("ok doc"),
      "CSV parser column pruning must not leak the malformed line")
  }

  test("jsonl failFast refuses a corrupt dump instead of part-loading it") {
    val p = write("d2.jsonl", Seq(
      """{"doc_id": 1, "text": "ok", "lang": "en", "source": "s"}""",
      """broken"""))
    val e = intercept[Exception] {
      DocumentSource.jsonl(spark, p, failFast = true).collect()
    }
    assert(e.getMessage != null)
  }

  test("csv: header dump loads canonically") {
    val p = write("d.csv", Seq(
      "doc_id,text,lang,source",
      "1,the quick brown fox,en,srcA",
      "2,le chat noir,fr,srcB"))
    val rows = DocumentSource.csv(spark, p)
      .as[(Long, String, String, String, Long)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq(
      (1L, "the quick brown fox", "en", "srcA", 19L),
      (2L, "le chat noir", "fr", "srcB", 12L)))
  }

  test("audit's (clean, corrupt) split is a partition consistent with jsonl()") {
    // a WELL-FORMED line merely missing doc_id: absent from jsonl()'s clean
    // set, so audit must route it to the quarantine side — never leak a
    // null-keyed row into clean that the primary loader would refuse
    val p = write("d5.jsonl", Seq(
      """{"doc_id": 1, "text": "ok doc", "lang": "en", "source": "s"}""",
      """{"text": "no id here", "lang": "en", "source": "s"}""",
      """{garbage"""))
    val (clean, corrupt) = DocumentSource.audit(spark, p)
    val cleanRows = clean.as[(Long, String, String, String, Long)].collect()
    assert(cleanRows.toSeq == Seq((1L, "ok doc", "en", "s", 6L)),
      s"clean must equal jsonl()'s output: ${cleanRows.toSeq}")
    val primary = DocumentSource.jsonl(spark, p)
      .as[(Long, String, String, String, Long)].collect()
    assert(cleanRows.toSeq == primary.toSeq, "parity with the primary loader")
    val bad = corrupt.as[String].collect().sorted
    assert(bad.length == 2, s"both the malformed and the id-less line audit: ${bad.toSeq}")
    assert(bad.exists(_.contains("garbage")) && bad.exists(_.contains("no id here")),
      s"every non-clean line is accounted for, none lost: ${bad.toSeq}")
  }

  test("blank lines are neither documents nor quarantine — parity with the JSON datasource") {
    val p = write("d7.jsonl", Seq(
      """{"doc_id": 1, "text": "ok", "lang": "en", "source": "s"}""",
      "", "   ", "\t", "\t \t",
      """{bad"""))
    val (clean, corrupt) = DocumentSource.audit(spark, p)
    assert(clean.count() == 1)
    val bad = corrupt.as[String].collect().toSeq
    assert(bad == Seq("""{bad"""),
      s"only the malformed line audits — the datasource emits nothing for blanks: $bad")
    assert(DocumentSource.jsonl(spark, p).count() == 1)
  }

  test("quarantined lines are byte-identical originals, fields outside the schema included") {
    val idless =
      """{"text": "no id", "lang": "en", "source": "s", "crawl_url": "http://x.example", "extra": [1, 2]}"""
    val broken = """{partial"""
    val p = write("d6.jsonl", Seq(
      """{"doc_id": 7, "text": "fine", "lang": "en", "source": "s"}""",
      idless, broken))
    val (clean, corrupt) = DocumentSource.audit(spark, p)
    assert(clean.count() == 1)
    val bad = corrupt.as[String].collect().toSet
    assert(bad == Set(idless, broken),
      s"the quarantine must reproduce its input verbatim — undeclared fields " +
        s"and formatting preserved: $bad")
  }

  test("a loaded dump runs through a battery operator unchanged") {
    val p = write("d3.jsonl", (1 to 20).map(i =>
      s"""{"doc_id": $i, "text": "tok$i a b c d e f g", "lang": "en", "source": "src${i % 2}"}"""))
    val docs = DocumentSource.jsonl(spark, p)
    val report = graft.queries.TrainingDataQueries.corpusMixReportOn(docs)
      .collect().map(_.toSeq)
    assert(report.exists(r => r(0) == "ALL" && r(1) == "ALL" && r(3) == 20L),
      s"grand total must cover the dump: ${report.toSeq}")
  }
}
