package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** q94's ground truth, pinned independently of the DuckDB oracle: the spec
  * recomputes the injection + three-pass scrub for single documents in plain
  * JVM regex and asserts the operator's counts and clean-text digest match.
  * This guards the Spark↔JVM side on its own, so an oracle-dialect drift
  * (RE2 vs java.util.regex) would surface as a DIFFERENT failure signature
  * than a Spark regression. */
class PiiScrubSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  private val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val ipv4 = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private val phone = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Reference implementation of the injection + scrub for one document. */
  private def reference(docId: Long, text: String): (Int, Int, Int, String) = {
    val dirty = text +
      (if (docId % 3 == 0) s" contact user$docId@example.com" else "") +
      (if (docId % 5 == 0)
        f" from host 10.${(docId / 256) % 256}%d.${docId % 256}%d.${docId % 100 + 1}%d" else "") +
      (if (docId % 7 == 0) f" call 555-${docId % 1000}%03d-${docId % 10000}%04d" else "")
    val nEmails = email.r.findAllIn(dirty).size
    val t1 = dirty.replaceAll(email, "<EMAIL>")
    val nIps = ipv4.r.findAllIn(t1).size
    val t2 = t1.replaceAll(ipv4, "<IP>")
    val nPhones = phone.r.findAllIn(t2).size
    (nEmails, nIps, nPhones, md5hex(t2.replaceAll(phone, "<PHONE>")))
  }

  test("counts and digests match a plain-JVM reference for every doc") {
    val got = TrainingDataQueries.piiScrub(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))))
      .toMap
    val texts = graft.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(texts.length == got.size)
    texts.foreach { case (id, text) =>
      assert(got(id) == reference(id, text), s"doc $id")
    }
  }

  test("the injection exercises every pattern family with nonzero counts") {
    val rows = TrainingDataQueries.piiScrub(spark, dir).collect()
    // doc 105 = 3·5·7: all three planted; doc 1: none (corpus has no digits)
    val all3 = rows.find(_.getLong(0) == 105L).get
    assert((all3.getInt(1), all3.getInt(2), all3.getInt(3)) == ((1, 1, 1)))
    val none = rows.find(_.getLong(0) == 1L).get
    assert((none.getInt(1), none.getInt(2), none.getInt(3)) == ((0, 0, 0)))
    // aggregate: every family fires corpus-wide (the scrub is not vacuous)
    assert(rows.map(_.getInt(1)).sum > 100)
    assert(rows.map(_.getInt(2)).sum > 50)
    assert(rows.map(_.getInt(3)).sum > 50)
  }

  test("scrub is one codegen'd projection: no shuffle before the final sort") {
    val plan = TrainingDataQueries.piiScrub(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    // scan reads only the two columns the scrub needs
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"), plan)
  }
}
