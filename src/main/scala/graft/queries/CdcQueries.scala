package graft.queries

import graft.Tables
import graft.cdc.{ChangeCapture, SnapshotDiff}
import graft.model.TriggerConfig
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked queries exercising the CDC layer (SURVEY.md §2.1-§2.3):
  * snapshot-diff op derivation (J2), operation filter (P1), null-safe
  * column-tracking gate (P2), envelope projection (P3/P4).
  *
  * The "old"/"new" snapshots are deterministic transforms of `customer`, so
  * DuckDB can replay the exact same diff:
  *   old = customers with custkey %7 != 0; mktsegment NULLed when %11 == 0
  *   new = customers with custkey %5 != 0; acctbal +100 when %3 == 0;
  *         mktsegment 'MOVED' when %4 == 0 (else NULL when %11 == 0)
  * yielding INSERTs (%7==0 rows appearing), DELETEs (%5==0 rows vanishing),
  * UPDATEs (changed rows), and dropped no-op updates — including NULL↔value
  * transitions that require null-safe comparison.
  */
object CdcQueries extends graft.QueryModule {
  type Q = (SparkSession, String) => DataFrame

  private def oldSnap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .filter($"c_custkey" % 7 =!= 0)
      .withColumn("c_mktsegment",
        when($"c_custkey" % 11 === 0, lit(null).cast("string"))
          .otherwise($"c_mktsegment"))
  }

  private def newSnap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .filter($"c_custkey" % 5 =!= 0)
      .withColumn("c_acctbal",
        when($"c_custkey" % 3 === 0, $"c_acctbal" + 100.0).otherwise($"c_acctbal"))
      .withColumn("c_mktsegment",
        when($"c_custkey" % 4 === 0, lit("MOVED"))
          .when($"c_custkey" % 11 === 0, lit(null).cast("string"))
          .otherwise($"c_mktsegment"))
  }

  private def flatDiff(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    SnapshotDiff.diff(oldSnap(s, dir), newSnap(s, dir), Seq("c_custkey"))
      .select($"c_custkey", $"op",
        $"old.c_acctbal".as("old_acctbal"), $"new.c_acctbal".as("new_acctbal"),
        $"old.c_mktsegment".as("old_mktsegment"),
        $"new.c_mktsegment".as("new_mktsegment"))
  }

  /** J2: full snapshot diff, flattened row images. */
  def diffOps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    flatDiff(s, dir).orderBy($"c_custkey")
  }

  /** P1+P2: capture gate for a trigger watching (INSERT, UPDATE) on
    * updateColumns=[c_acctbal] — UPDATEs that only touched mktsegment are
    * filtered out, null-safely. */
  def captureGate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cfg = TriggerConfig(
      name = "acctbal_watch", tableName = "customer",
      operations = Seq("INSERT", "UPDATE"),
      webhookUrl = "http://example.invalid/hook",
      updateColumns = Seq("c_acctbal"))
    val diff = SnapshotDiff.diff(oldSnap(s, dir), newSnap(s, dir), Seq("c_custkey"))
    diff
      .filter(ChangeCapture.operationFilter(cfg))
      .filter(ChangeCapture.updateGate(cfg))
      .select($"c_custkey", $"op",
        $"old.c_acctbal".as("old_acctbal"), $"new.c_acctbal".as("new_acctbal"))
      .orderBy($"c_custkey")
  }

  /** P3/P4: full envelope with uuid()/current_timestamp()/to_json row images —
    * inherently nondeterministic, so rows-only checked (no oracle). The
    * envelope *shape* is pinned exactly by ChangeCaptureSpec. */
  def envelopeProject(s: SparkSession, dir: String): DataFrame = {
    val cfg = TriggerConfig(
      name = "customer_all_ops", tableName = "customer",
      operations = Seq("INSERT", "UPDATE", "DELETE"),
      webhookUrl = "http://example.invalid/hook")
    val diff = SnapshotDiff.diff(oldSnap(s, dir), newSnap(s, dir), Seq("c_custkey"))
    ChangeCapture.capture(diff, cfg)
      .select(col("id"), col("created_at"), col("table.schema").as("table_schema"),
        col("table.name").as("table_name"), col("trigger.name").as("trigger_name"),
        col("trigger.timing").as("timing"), col("event.op").as("op"),
        col("event.data.old").as("old_json"), col("event.data.new").as("new_json"))
  }

  /** P3/P4 hash-checked: the envelope made fully deterministic — id is a
    * content hash instead of uuid(), created_at pinned, and the JSON row
    * images restricted to the never-null columns (Spark's to_json omits
    * null struct fields where DuckDB emits "f":null — excluding nullable
    * fields makes the JSON text byte-identical across engines). q12 keeps
    * the faithful uuid()/now() envelope as rows-only. */
  def envelopeDeterministic(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val diff = SnapshotDiff.diff(oldSnap(s, dir), newSnap(s, dir), Seq("c_custkey"))
    diff.select(
      md5(concat_ws("|", lit("customer"), $"op", $"c_custkey")).as("id"),
      lit("2024-01-01 00:00:00").cast("timestamp").as("created_at"),
      lit("public").as("table_schema"), lit("customer").as("table_name"),
      lit("customer_all_ops").as("trigger_name"), lit("AFTER").as("timing"),
      $"op",
      when($"op" === "INSERT", lit(null).cast("string"))
        .otherwise(to_json(struct($"old.c_custkey", $"old.c_name", $"old.c_nationkey")))
        .as("old_json"),
      when($"op" === "DELETE", lit(null).cast("string"))
        .otherwise(to_json(struct($"new.c_custkey", $"new.c_name", $"new.c_nationkey")))
        .as("new_json"))
      .orderBy($"id")
  }

  private val diffSql =
    """WITH old_snap AS (
      |  SELECT c_custkey, c_name, c_nationkey, c_acctbal,
      |         CASE WHEN c_custkey % 11 = 0 THEN NULL ELSE c_mktsegment END AS c_mktsegment
      |  FROM customer WHERE c_custkey % 7 <> 0
      |), new_snap AS (
      |  SELECT c_custkey, c_name, c_nationkey,
      |         CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 100.0 ELSE c_acctbal END AS c_acctbal,
      |         CASE WHEN c_custkey % 4 = 0 THEN 'MOVED'
      |              WHEN c_custkey % 11 = 0 THEN NULL
      |              ELSE c_mktsegment END AS c_mktsegment
      |  FROM customer WHERE c_custkey % 5 <> 0
      |), joined AS (
      |  SELECT coalesce(o.c_custkey, n.c_custkey) AS c_custkey,
      |         CASE WHEN o.c_custkey IS NULL THEN 'INSERT'
      |              WHEN n.c_custkey IS NULL THEN 'DELETE'
      |              ELSE 'UPDATE' END AS op,
      |         o.c_acctbal AS old_acctbal, n.c_acctbal AS new_acctbal,
      |         o.c_mktsegment AS old_mktsegment, n.c_mktsegment AS new_mktsegment,
      |         (o.c_name IS DISTINCT FROM n.c_name
      |          OR o.c_nationkey IS DISTINCT FROM n.c_nationkey
      |          OR o.c_acctbal IS DISTINCT FROM n.c_acctbal
      |          OR o.c_mktsegment IS DISTINCT FROM n.c_mktsegment) AS changed
      |  FROM old_snap o FULL OUTER JOIN new_snap n ON o.c_custkey = n.c_custkey
      |), diff AS (
      |  SELECT c_custkey, op, old_acctbal, new_acctbal, old_mktsegment, new_mktsegment
      |  FROM joined WHERE op <> 'UPDATE' OR changed
      |)""".stripMargin

  def queries: Map[String, Q] = Map(
    "q10_cdc_snapshot_diff" -> diffOps,
    "q11_cdc_capture_gate" -> captureGate,
    "q12_cdc_envelope" -> envelopeProject,
    "q66_envelope_det" -> envelopeDeterministic)

  def oracles: Map[String, String] = Map(
    "q10_cdc_snapshot_diff" -> (diffSql +
      "\nSELECT * FROM diff ORDER BY c_custkey"),
    "q11_cdc_capture_gate" -> (diffSql +
      """
        |SELECT c_custkey, op, old_acctbal, new_acctbal FROM diff
        |WHERE op IN ('INSERT','UPDATE')
        |  AND (op <> 'UPDATE' OR old_acctbal IS DISTINCT FROM new_acctbal)
        |ORDER BY c_custkey""".stripMargin),
    "q66_envelope_det" ->
      """WITH old_snap AS (
        |  SELECT c_custkey, c_name, c_nationkey, c_acctbal,
        |         CASE WHEN c_custkey % 11 = 0 THEN NULL ELSE c_mktsegment END AS c_mktsegment
        |  FROM customer WHERE c_custkey % 7 <> 0
        |), new_snap AS (
        |  SELECT c_custkey, c_name, c_nationkey,
        |         CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 100.0 ELSE c_acctbal END AS c_acctbal,
        |         CASE WHEN c_custkey % 4 = 0 THEN 'MOVED'
        |              WHEN c_custkey % 11 = 0 THEN NULL
        |              ELSE c_mktsegment END AS c_mktsegment
        |  FROM customer WHERE c_custkey % 5 <> 0
        |), j AS (
        |  SELECT coalesce(o.c_custkey, n.c_custkey) AS k,
        |         CASE WHEN o.c_custkey IS NULL THEN 'INSERT'
        |              WHEN n.c_custkey IS NULL THEN 'DELETE'
        |              ELSE 'UPDATE' END AS op,
        |         o.c_custkey AS o_ck, o.c_name AS o_name, o.c_nationkey AS o_nk,
        |         n.c_custkey AS n_ck, n.c_name AS n_name, n.c_nationkey AS n_nk,
        |         (o.c_name IS DISTINCT FROM n.c_name
        |          OR o.c_nationkey IS DISTINCT FROM n.c_nationkey
        |          OR o.c_acctbal IS DISTINCT FROM n.c_acctbal
        |          OR o.c_mktsegment IS DISTINCT FROM n.c_mktsegment) AS changed
        |  FROM old_snap o FULL OUTER JOIN new_snap n ON o.c_custkey = n.c_custkey
        |), d AS (SELECT * FROM j WHERE op <> 'UPDATE' OR changed)
        |SELECT md5('customer|' || op || '|' || CAST(k AS VARCHAR)) AS id,
        |  TIMESTAMP '2024-01-01 00:00:00' AS created_at,
        |  'public' AS table_schema, 'customer' AS table_name,
        |  'customer_all_ops' AS trigger_name, 'AFTER' AS timing, op,
        |  CASE WHEN op = 'INSERT' THEN NULL
        |       ELSE CAST(to_json(struct_pack(c_custkey := o_ck, c_name := o_name,
        |                                     c_nationkey := o_nk)) AS VARCHAR) END AS old_json,
        |  CASE WHEN op = 'DELETE' THEN NULL
        |       ELSE CAST(to_json(struct_pack(c_custkey := n_ck, c_name := n_name,
        |                                     c_nationkey := n_nk)) AS VARCHAR) END AS new_json
        |FROM d ORDER BY id""".stripMargin)
}
