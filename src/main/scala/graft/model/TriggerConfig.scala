package graft.model

/** CDC trigger configuration — the engine's control-plane record.
  *
  * Mirrors the reference's `create_event_trigger(...)` parameter surface
  * (`cdc_webhook--1.0.sql:116-132`) with its eight validation predicates
  * (`cdc_webhook--1.0.sql:146-182`) expressed as eager `require`s: in Spark
  * the config is a plain literal folded into the plan (the analog of the
  * reference's `format %L` constant-baking at trigger-creation time), so
  * validation happens driver-side before any job is launched.
  */
final case class TriggerConfig(
    name: String,
    tableName: String,
    operations: Seq[String],
    webhookUrl: String,
    headers: Map[String, String] = Map.empty,
    schemaName: String = "public",
    updateColumns: Seq[String] = Nil,
    timeout: Int = 10,
    cancelOnFailure: Boolean = false,
    triggerTiming: String = "AFTER",
    retryNumber: Int = 3,
    retryInterval: Int = 1,
    retryBackoff: String = "LINEAR",
    security: String = "NONE",
    mode: String = "SYNC") {

  import TriggerConfig._

  // V1 timing (cdc_webhook--1.0.sql:146-148)
  require(Timings(triggerTiming),
    s"Invalid trigger timing: $triggerTiming. Must be BEFORE or AFTER")
  // V2 backoff (sql:151-153)
  require(Backoffs(retryBackoff),
    s"Invalid retry backoff: $retryBackoff. Must be LINEAR or EXPONENTIAL")
  // V3 security (sql:156-158)
  require(Securities(security),
    s"Invalid security option: $security. Must be NONE or PRIVATE")
  // V4 mode (sql:161-163)
  require(Modes(mode), s"Invalid mode: $mode. Must be SYNC or ASYNC")
  // V5 ASYNC + cancel_on_failure is contradictory (sql:166-168)
  require(!(mode == "ASYNC" && cancelOnFailure),
    "cancel_on_failure=true is not supported with ASYNC mode")
  // V6 retry_number >= 0 (sql:171-173)
  require(retryNumber >= 0, s"Invalid retry number: $retryNumber. Must be >= 0")
  // V7 retry_interval > 0 (sql:175-177)
  require(retryInterval > 0, s"Invalid retry interval: $retryInterval. Must be > 0")
  // V8 non-empty operations (sql:180-182; Postgres array_length('{}')=NULL trick —
  // here an explicit nonEmpty, see SURVEY.md §7.4 item 5)
  require(operations.nonEmpty, "Operations must be specified and not empty")
  require(operations.forall(Operations),
    s"Invalid operations: ${operations.filterNot(Operations).mkString(",")}")

  /** Column-tracking gate semantics (`cdc_webhook--1.0.sql:229-235`): empty
    * updateColumns disables the gate — every UPDATE fires. */
  def tracksColumns: Boolean = updateColumns.nonEmpty
}

object TriggerConfig {
  val Operations: Set[String] = Set("INSERT", "UPDATE", "DELETE")
  val Timings: Set[String] = Set("BEFORE", "AFTER")
  val Backoffs: Set[String] = Set("LINEAR", "EXPONENTIAL")
  val Securities: Set[String] = Set("NONE", "PRIVATE")
  val Modes: Set[String] = Set("SYNC", "ASYNC")

  /** event_log delivery status machine (`cdc_webhook--1.0.sql:35`). */
  val Statuses: Set[String] = Set("PENDING", "IN_PROGRESS", "DELIVERED", "FAILED")
}
