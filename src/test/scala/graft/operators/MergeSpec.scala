package graft.operators

import graft.SparkTestSession
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite

class MergeSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val target = Seq(
    (1L, "alice", 10.0),
    (2L, "bob", 20.0),
    (3L, "carol", 30.0)
  ).toDF("id", "name", "bal")

  test("upsert replaces matched keys and inserts new ones") {
    val source = Seq((2L, "bob2", 25.0), (4L, "dave", 40.0)).toDF("id", "name", "bal")
    val out = Merge.upsert(target, source, Seq("id"))
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, "alice", 10.0), (2L, "bob2", 25.0), (3L, "carol", 30.0), (4L, "dave", 40.0)))
  }

  test("upsert rejects mismatched schemas") {
    val bad = Seq((9L, "x")).toDF("id", "name")
    assertThrows[IllegalArgumentException](Merge.upsert(target, bad, Seq("id")))
  }

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("applyChanges: last change per key wins; DELETE removes; INSERT adds") {
    val changes = Seq(
      // two generations for key 1: the later UPDATE must win
      (1L, "UPDATE", ts(100), "alice", 11.0),
      (1L, "UPDATE", ts(200), "alice", 12.0),
      // key 2: update then delete — key must vanish
      (2L, "UPDATE", ts(100), "bob", 21.0),
      (2L, "DELETE", ts(300), null.asInstanceOf[String], 0.0),
      // brand-new key
      (9L, "INSERT", ts(100), "zed", 90.0)
    ).toDF("id", "op", "ts", "name", "bal")
    val out = Merge.applyChanges(target, changes, Seq("id"), "ts", "op")
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, "alice", 12.0), (3L, "carol", 30.0), (9L, "zed", 90.0)))
  }

  test("applyChanges with an empty change batch is the identity") {
    val empty = Seq.empty[(Long, String, Timestamp, String, Double)]
      .toDF("id", "op", "ts", "name", "bal")
    val out = Merge.applyChanges(target, empty, Seq("id"), "ts", "op")
    assert(out.count() == 3)
  }
}
