package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine determinism helpers.
  *
  * The driver hash-compares our parquet output against DuckDB running the
  * oracle SQL. Floating-point SUM/AVG is accumulation-order dependent, and
  * `round()` tie-breaking differs between engines, so any money-style
  * aggregate computed in doubles is a coin flip in the last ulp. The stable
  * pattern — used by every oracle-checked query — is:
  *
  *   - per-row arithmetic: plain double ops (IEEE-deterministic, bit-identical
  *     in any engine given identical inputs) — never `round()`;
  *   - aggregation of fractional values: cast inputs to DECIMAL, aggregate
  *     exactly, cast the final result to double (nearest-double of the same
  *     exact decimal on both sides ⇒ identical bits);
  *   - ORDER BY with a unique tie-break key.
  *
  * SQL oracle side mirrors this with CAST(... AS DECIMAL(p,s)) / AS DOUBLE.
  */
object Determinism {
  /** Exact decimal sum of a 2-decimal money column, surfaced as double. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Exact decimal average surfaced as double: exact sum / count in double. */
  def davg(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double") / count(c)

  /** Decimal view of a money column for exact product arithmetic. */
  def dec(c: Column, scale: Int = 2): Column = c.cast(DecimalType(18, scale))
}
