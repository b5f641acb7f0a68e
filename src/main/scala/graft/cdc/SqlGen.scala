package graft.cdc

import graft.model.TriggerConfig

/** F6 — the reference's SQL-string codegen, Spark-side. The extension builds
  * its trigger DDL with `format(...%I...%L...)` — `%I` quotes identifiers,
  * `%L` quotes literals — so hostile table/column/trigger names can never
  * escape into executable SQL (`cdc_webhook--1.0.sql:205,215,355`). The
  * engine's primary surface is typed plans (ChangeCapture), but the same
  * capture condition is also emittable as ANSI text for SQL-only clients;
  * SqlGenSpec proves the generated text executes on `spark.sql` to exactly
  * the typed plan's rows, and that injection attempts stay inert strings.
  */
object SqlGen {

  /** `%I` analog: backquote-quote a Spark SQL identifier, doubling embedded
    * backquotes. */
  def ident(name: String): String = "`" + name.replace("`", "``") + "`"

  /** `%L` analog: single-quote a Spark SQL string literal. Backslash is an
    * escape character in Spark's default parser mode, so it is escaped
    * first, then embedded quotes. */
  def literal(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"

  /** The trigger's WHEN condition (operation filter + null-safe
    * column-tracking gate) as SQL — the exact clause the reference
    * code-gens into `CREATE TRIGGER ... WHEN (...)`
    * (`cdc_webhook--1.0.sql:229-235`). */
  def whenClause(cfg: TriggerConfig): String = {
    val ops = cfg.operations.map(literal).mkString(", ")
    val opFilter = s"op IN ($ops)"
    if (!cfg.tracksColumns) opFilter
    else {
      val changed = cfg.updateColumns
        .map(c => s"NOT (old.${ident(c)} <=> new.${ident(c)})")
        .mkString(" OR ")
      s"$opFilter AND (op <> 'UPDATE' OR ($changed))"
    }
  }

  /** A complete capture view definition over a registered change-row view —
    * the DDL-emission analog of the reference's `CREATE TRIGGER` statement
    * builder. The envelope here is the deterministic twin (content-derived
    * id) so SQL and typed results are comparable. */
  def captureViewSql(cfg: TriggerConfig, sourceView: String): String =
    s"""SELECT
       |  md5(concat_ws('|', op, to_json(old), to_json(new))) AS id,
       |  named_struct('schema', ${literal(cfg.schemaName)}, 'name', ${literal(cfg.tableName)}) AS table,
       |  named_struct('name', ${literal(cfg.name)}, 'timing', ${literal(cfg.triggerTiming)}) AS trigger,
       |  named_struct('op', op, 'data', named_struct(
       |    'old', CASE WHEN op = 'INSERT' THEN CAST(NULL AS STRING) ELSE to_json(old) END,
       |    'new', CASE WHEN op = 'DELETE' THEN CAST(NULL AS STRING) ELSE to_json(new) END)) AS event
       |FROM ${ident(sourceView)}
       |WHERE ${whenClause(cfg)}""".stripMargin
}
