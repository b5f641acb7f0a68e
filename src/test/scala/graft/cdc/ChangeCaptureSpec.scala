package graft.cdc

import graft.SparkTestSession
import graft.model.TriggerConfig
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Pins the envelope + gate behaviors the reference's integration tests
  * assert on (see SURVEY.md §5 table): payload shape per op, op routing,
  * tracked-column gating, all-columns tracking, redaction. */
class ChangeCaptureSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def cfg(ops: Seq[String] = Seq("INSERT", "UPDATE", "DELETE"),
                  track: Seq[String] = Nil) = TriggerConfig(
    name = "emp_trigger", tableName = "employees", schemaName = "hr",
    operations = ops, webhookUrl = "http://localhost:9/hook",
    headers = Map("X-API-Key" -> "test-key"), updateColumns = track)

  private lazy val changes: DataFrame = SnapshotDiff.diff(
    Seq(Emp(2, "bob", 200), Emp(3, "carol", 300), Emp(4, "dave", 400)).toDF(),
    Seq(Emp(1, "alice", 100), Emp(2, "bob", 250), Emp(3, "carol2", 300)).toDF(),
    Seq("id")).cache()
  // ops: 1→INSERT, 2→UPDATE(salary), 3→UPDATE(name), 4→DELETE

  test("test_basic_insert: INSERT envelope has new image, null old") {
    val e = ChangeCapture.capture(changes.filter($"id" === 1), cfg())
    val r = e.select($"event.op", $"event.data.old", $"event.data.new",
      $"table.schema", $"table.name", $"trigger.name", $"trigger.timing").head()
    assert(r.getString(0) == "INSERT")
    assert(r.isNullAt(1))
    assert(r.getString(2).contains("\"name\":\"alice\"") &&
      r.getString(2).contains("\"salary\":100"))
    assert(r.getString(3) == "hr" && r.getString(4) == "employees")
    assert(r.getString(5) == "emp_trigger" && r.getString(6) == "AFTER")
  }

  test("test_all_operations: DELETE has null new; UPDATE carries both") {
    val byOp = ChangeCapture.capture(changes, cfg())
      .select($"event.op", $"event.data.old".isNull, $"event.data.new".isNull)
      .as[(String, Boolean, Boolean)].collect()
    assert(byOp.collect { case ("DELETE", o, n) => (o, n) }.head == (false, true))
    assert(byOp.collect { case ("INSERT", o, n) => (o, n) }.head == (true, false))
    assert(byOp.collect { case ("UPDATE", o, n) => (o, n) }
      .forall(_ == (false, false)))
  }

  test("test_multiple_triggers: op routing by configured operations") {
    val insOnly = ChangeCapture.capture(changes, cfg(ops = Seq("INSERT")))
    assert(insOnly.select($"event.op").as[String].collect().toSeq == Seq("INSERT"))
    val delUpd = ChangeCapture.capture(changes, cfg(ops = Seq("DELETE", "UPDATE")))
    assert(delUpd.select($"event.op").as[String].collect().toSet == Set("DELETE", "UPDATE"))
  }

  test("test_basic_update: untracked-column UPDATE does not fire") {
    // track salary only: id=2 (salary changed) fires; id=3 (name changed) doesn't
    val e = ChangeCapture.capture(changes.filter($"op" === "UPDATE"),
      cfg(track = Seq("salary")))
    val names = e.select($"event.data.new").as[String].collect()
    assert(names.length == 1 && names.head.contains("\"id\":2"))
  }

  test("test_column_tracking: tracking all columns fires on any change") {
    val e = ChangeCapture.capture(changes.filter($"op" === "UPDATE"),
      cfg(track = Seq("id", "name", "salary")))
    assert(e.count() == 2)
  }

  test("empty updateColumns disables the gate (reference sql:229-235)") {
    val e = ChangeCapture.capture(changes.filter($"op" === "UPDATE"), cfg())
    assert(e.count() == 2)
  }

  test("uuid id is unique per event; created_at populated") {
    val e = ChangeCapture.capture(changes, cfg())
      .select($"id", $"created_at").collect()
    assert(e.map(_.getString(0)).distinct.length == e.length)
    assert(e.forall(!_.isNullAt(1)))
  }

  test("test_security: redaction strips header values from delivery logs") {
    val log = Seq(("evt1", """{"X-API-Key":"secret"}""", 200))
      .toDF("event_id", "headers", "status")
    val red = ChangeCapture.redact(log)
    val vals = red.select($"headers").as[String].collect()
    assert(vals.forall(_ == "webhook_headers"))
    // explain output must not leak secrets either (analog of pg_get_functiondef)
    assert(!red.queryExecution.executedPlan.toString.contains("secret"))
  }
}
