package graft.cdc

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the employees fixture of the reference test suite
  * (`tests/utilities.py:43-50`): id / name / salary rows diffed across two
  * snapshot states. */
case class Emp(id: Int, name: String, salary: java.lang.Integer)

class SnapshotDiffSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val oldSnap = Seq(
    Emp(1, "alice", 100),
    Emp(2, "bob", 200),
    Emp(3, "carol", null), // null salary → null-safe compare needed
    Emp(4, "dave", 400)    // will be deleted
  ).toDF()

  private val newSnap = Seq(
    Emp(1, "alice", 100),  // unchanged → dropped
    Emp(2, "bob", 250),    // salary changed → UPDATE
    Emp(3, "carol", 300),  // null → value → UPDATE (null-safe)
    Emp(5, "erin", 500)    // INSERT
  ).toDF()

  private lazy val diff =
    SnapshotDiff.diff(oldSnap, newSnap, Seq("id")).cache()

  test("classifies INSERT / UPDATE / DELETE and drops no-op updates") {
    val ops = diff.select("id", "op").as[(Int, String)].collect().toMap
    assert(ops == Map(2 -> "UPDATE", 3 -> "UPDATE", 4 -> "DELETE", 5 -> "INSERT"))
  }

  test("INSERT has null old image; DELETE has null new image (envelope nulls)") {
    val r5 = diff.filter($"id" === 5).select($"old".isNull, $"new".isNull).head()
    assert(r5.getBoolean(0) && !r5.getBoolean(1))
    val r4 = diff.filter($"id" === 4).select($"old".isNull, $"new".isNull).head()
    assert(!r4.getBoolean(0) && r4.getBoolean(1))
  }

  test("UPDATE carries both full row images") {
    val r = diff.filter($"id" === 2)
      .select($"old.salary", $"new.salary", $"old.name", $"new.name").head()
    assert(r.getInt(0) == 200 && r.getInt(1) == 250)
    assert(r.getString(2) == "bob" && r.getString(3) == "bob")
  }

  test("null-to-value transition detected (IS DISTINCT FROM semantics)") {
    val r = diff.filter($"id" === 3).select($"old.salary".isNull, $"new.salary").head()
    assert(r.getBoolean(0) && r.getInt(1) == 300)
  }

  test("anyColumnChanged over no columns is false") {
    val c = SnapshotDiff.anyColumnChanged("old", "new", Nil)
    val got = diff.select(c.as("changed")).distinct().as[Boolean].collect().toSeq
    assert(got == Seq(false))
  }
}
