package graft.queue

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-level security analog of the reference's RLS policies (F15):
  * `credentials` and `event_log` are readable only by members of the
  * `postgres` role (`cdc_webhook--1.0.sql:54-69`,
  * `USING (pg_has_role(CURRENT_USER, 'postgres', 'MEMBER'))`), and every
  * row carries `created_by DEFAULT CURRENT_USER` (`:46`).
  *
  * Spark's engine has no session user, so the principal is explicit and the
  * policy is applied as a view filter BEFORE any query logic — the secured
  * DataFrame is what a tenant's queries compose over. Because the principal
  * is a literal at plan time, policy evaluation costs nothing at run time:
  *   - the reference's all-or-nothing role policy constant-folds — an
  *     admin's secured view IS the raw scan (no Filter node), a
  *     non-member's collapses to an empty LocalTableScan without listing a
  *     single file (the plan-time analog of postgres evaluating
  *     `pg_has_role` once per statement);
  *   - the per-owner policy is an ordinary equality predicate, so it pushes
  *     down to the parquet scan (and prunes an owner-partitioned layout)
  *     like any other filter.
  */
object AccessControl {

  /** An authenticated caller: name + resolved role memberships (the
    * `CURRENT_USER` + `pg_has_role` pair of the reference). */
  final case class Principal(name: String, roles: Set[String])

  val AdminRole = "postgres"

  def isAdmin(p: Principal): Boolean =
    p.name == AdminRole || p.roles.contains(AdminRole)

  /** The reference policy verbatim: members of the admin role see every
    * row, everyone else none (`cdc_webhook--1.0.sql:61-69`). */
  def adminOnly(p: Principal): Column = lit(isAdmin(p))

  /** Per-owner refinement over a `created_by`-style column: owners see
    * their rows, admins see everything. */
  def ownerOrAdmin(p: Principal, owner: Column, principalId: Column): Column =
    if (isAdmin(p)) lit(true) else owner === principalId

  /** The secured view: every tenant query composes over this, never the
    * raw dataset. */
  def secured(df: DataFrame, policy: Column): DataFrame = df.filter(policy)
}
