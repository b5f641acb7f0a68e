package graft.operators

import graft.SparkTestSession
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  // left: (id, key, ts); right: (key, ts, payload)
  private val left = Seq(
    (1L, "u1", ts(100)),
    (2L, "u1", ts(200)),
    (3L, "u1", ts(50)),   // before any right row
    (4L, "u2", ts(100))   // key with no right rows at all
  ).toDF("id", "k", "t")

  private val right = Seq(
    ("u1", ts(90), "a"),
    ("u1", ts(100), "b"),  // equal ts → inclusive match for left id=1
    ("u1", ts(150), "c")
  ).toDF("k", "rt", "v")

  private def run() =
    AsOfJoin.backward(left, right, "k", "t", "rt")
      .select($"id", $"matched.v".as("v"))
      .as[(Long, Option[String])].collect().toMap

  test("matches the latest right row at or before each left ts") {
    val m = run()
    assert(m(1L).contains("b")) // rt=100 == t=100, inclusive
    assert(m(2L).contains("c")) // rt=150 latest <= 200
  }

  test("left rows with no preceding right row get null (left-join semantics)") {
    val m = run()
    assert(m(3L).isEmpty)
    assert(m(4L).isEmpty)
    assert(m.size == 4) // every left row survives exactly once
  }

  test("plan shuffles once on the key — no non-equi join blow-up") {
    val plan = AsOfJoin.backward(left, right, "k", "t", "rt")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"as-of must not nested-loop join:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("matches DuckDB ASOF semantics on the real event feed") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val p = ev.filter($"event_type" === "purchase").select($"event_id", $"user_id", $"ts")
    val c = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id".as("click_id"))
    val asof = AsOfJoin.backward(p, c, "user_id", "ts", "ts")
      .select($"event_id", $"matched.click_id".as("click_id"))
    // reference formulation: max-ts click per purchase via join + window
    val joined = p.join(c.select($"user_id", $"ts".as("cts"), $"click_id"), "user_id")
      .filter($"cts" <= $"ts")
      .groupBy($"event_id").agg(max(struct($"cts", $"click_id")).as("m"))
      .select($"event_id", $"m.click_id".as("click_id"))
    val fromAsof = asof.filter($"click_id".isNotNull)
      .as[(Long, Long)].collect().toMap
    val fromJoin = joined.as[(Long, Long)].collect().toMap
    assert(fromAsof == fromJoin)
    assert(asof.count() == p.count()) // unmatched purchases retained as nulls
  }
}
