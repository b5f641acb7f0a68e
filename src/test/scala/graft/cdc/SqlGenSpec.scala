package graft.cdc

import graft.SparkTestSession
import graft.model.TriggerConfig
import org.apache.spark.sql.functions.struct
import org.scalatest.funsuite.AnyFunSuite

/** F6 — generated SQL must (a) execute on spark.sql to exactly the typed
  * plan's rows and (b) keep hostile identifiers/literals inert, the
  * reference's %I/%L quoting discipline. */
class SqlGenSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val changes = Seq(
    ("INSERT", null.asInstanceOf[Emp], Emp(1, "alice", 100)),
    ("UPDATE", Emp(2, "bob", 200), Emp(2, "bob", 250)),      // salary changed
    ("UPDATE", Emp(3, "carol", 300), Emp(3, "carole", 300)), // name changed
    ("UPDATE", Emp(4, "dan", 400), Emp(4, "dan", 400)),      // nothing changed
    ("DELETE", Emp(5, "eve", 500), null.asInstanceOf[Emp]))
    .toDF("op", "old", "new")

  private def cfg(ops: Seq[String], tracked: Seq[String] = Nil) = TriggerConfig(
    name = "gen_t", tableName = "employees", operations = ops,
    webhookUrl = "http://h/1", updateColumns = tracked)

  test("generated WHEN clause selects exactly the typed filter's rows") {
    changes.createOrReplaceTempView("sqlgen_changes")
    for (c <- Seq(
        cfg(Seq("INSERT", "UPDATE", "DELETE")),
        cfg(Seq("DELETE")),
        cfg(Seq("UPDATE"), tracked = Seq("salary")),
        cfg(Seq("INSERT", "UPDATE"), tracked = Seq("name", "salary")))) {
      val fromSql = spark.sql(
        s"SELECT op, old, new FROM sqlgen_changes WHERE ${SqlGen.whenClause(c)}")
      val typed = changes
        .filter(ChangeCapture.operationFilter(c))
        .filter(ChangeCapture.updateGate(c))
      assert(fromSql.exceptAll(typed).isEmpty && typed.exceptAll(fromSql).isEmpty,
        s"SQL and typed capture disagree for $c:\n${SqlGen.whenClause(c)}")
    }
  }

  test("generated capture view matches the typed envelope's deterministic fields") {
    changes.createOrReplaceTempView("sqlgen_changes")
    val c = cfg(Seq("INSERT", "UPDATE", "DELETE"), tracked = Seq("salary"))
    val fromSql = spark.sql(SqlGen.captureViewSql(c, "sqlgen_changes"))
      .select($"table", $"trigger", $"event")
    val typed = ChangeCapture.capture(
      changes.filter(ChangeCapture.updateGate(c)), c)
      .select($"table", $"trigger", $"event")
    assert(fromSql.exceptAll(typed).isEmpty && typed.exceptAll(fromSql).isEmpty)
    assert(fromSql.count() == 3) // no-change + untracked-column UPDATEs gated out
  }

  test("%I/%L: hostile identifiers and literals stay inert") {
    // column name with an embedded backquote; trigger name with quotes
    val hostile = Seq(
      ("UPDATE", (200, "x"), (250, "x")),
      ("UPDATE", (300, "y"), (300, "y")))
      .toDF("op", "o", "n")
      .select($"op",
        struct($"o._1".as("sal`ary"), $"o._2".as("nm")).as("old"),
        struct($"n._1".as("sal`ary"), $"n._2".as("nm")).as("new"))
    hostile.createOrReplaceTempView("sqlgen_hostile")
    val c = TriggerConfig(
      name = "rob'); DROP TABLE lineitem; --",
      tableName = "t", operations = Seq("UPDATE"),
      webhookUrl = "http://h/1", updateColumns = Seq("sal`ary"))
    val out = spark.sql(SqlGen.captureViewSql(c, "sqlgen_hostile"))
    // executes, gates on the weird column, and the hostile literal is DATA
    assert(out.count() == 1)
    assert(out.select($"trigger.name").as[String].head() ==
      "rob'); DROP TABLE lineitem; --")
  }

  test("literal quoting round-trips quotes and backslashes") {
    for (s <- Seq("a'b", "a\\'b", "a\\\\b", "it's", "\\", "'", "plain")) {
      val got = spark.sql(s"SELECT ${SqlGen.literal(s)} AS v").as[String].head()
      assert(got == s, s"round-trip failed for <$s>: got <$got>")
    }
  }
}
