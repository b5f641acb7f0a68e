package graft.queue

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** F15: the reference's RLS policies re-expressed as plan-time view filters
  * (`cdc_webhook--1.0.sql:54-69`). What these tests pin beyond row
  * visibility is the PLAN contract: the role policy costs nothing (folds to
  * the raw scan or an empty relation), the owner policy pushes to the scan. */
class AccessControlSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._
  import AccessControl._

  private val creds = Seq(
    ("public", "employees", "t1", "http://h/1", "{}", "alice"),
    ("public", "employees", "t2", "http://h/2", "{}", "bob"),
    ("sales", "orders", "t3", "http://h/3", "{}", "alice"))
    .toDF("trigger_schema", "trigger_table", "trigger_name",
      "webhook_url", "headers", "created_by")

  test("admin-role policy: members see everything, others nothing") {
    val admin = Principal("svc", Set(AdminRole))
    val outsider = Principal("mallory", Set("analyst"))
    assert(secured(creds, adminOnly(admin)).count() == 3)
    assert(secured(creds, adminOnly(outsider)).count() == 0)
  }

  test("admin policy constant-folds: raw scan for members, empty relation for others") {
    val yes = secured(creds, adminOnly(Principal(AdminRole, Set.empty)))
      .queryExecution.optimizedPlan.toString
    assert(!yes.contains("Filter"), s"admin view must be the raw scan:\n$yes")
    val no = secured(creds, adminOnly(Principal("mallory", Set.empty)))
      .queryExecution.optimizedPlan.toString
    assert(no.contains("LocalRelation <empty>"),
      s"non-member view must prune to an empty relation:\n$no")
  }

  test("owner policy: created_by scoping, admins unrestricted") {
    val alice = Principal("alice", Set.empty)
    val mine = secured(creds, ownerOrAdmin(alice, col("created_by"), lit(alice.name)))
    assert(mine.select($"trigger_name").as[String].collect().toSet == Set("t1", "t3"))
    val admin = Principal("svc", Set(AdminRole))
    assert(secured(creds, ownerOrAdmin(admin, col("created_by"), lit("svc"))).count() == 3)
  }

  test("owner policy pushes to the parquet scan like any predicate") {
    val tenant = Principal("user_42", Set.empty)
    val p = secured(Tables.events(spark, "/root/testdata/sf0.001"),
      ownerOrAdmin(tenant, col("user_id"), lit(42L)))
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("EqualTo(user_id,42)"), p)
  }
}
