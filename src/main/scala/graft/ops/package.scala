package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared determinism helpers for oracled ops (SURVEY.md §5.2).
  *
  * Double addition is order-sensitive; Spark's partial-aggregation
  * merge order differs run-to-run and from DuckDB's scan order, so a
  * plain `round(sum(x), 6)` can still flip its 6th decimal when |sum|
  * is large. Accumulating in exact DECIMAL(38,10) makes the sum
  * order-independent; rounding happens in decimal space (exact,
  * half-away-from-zero in both engines) and only then converts to
  * double.
  *
  * DuckDB rendering:
  *   dsum(c) ≡ CAST(round(sum(CAST(c AS DECIMAL(38,10))), 6) AS DOUBLE)
  *   davg(c) ≡ round(CAST(sum(CAST(c AS DECIMAL(38,10))) AS DOUBLE)
  *                   / count(c), 6)
  */
package object ops {

  private val Dec = DecimalType(38, 10)

  /** Order-independent, oracle-stable double sum (6dp). */
  def dsum(c: Column): Column =
    round(sum(c.cast(Dec)), 6).cast("double")

  /** Order-independent, oracle-stable double average (6dp). */
  def davg(c: Column): Column =
    round(sum(c.cast(Dec)).cast("double") / count(c), 6)
}
