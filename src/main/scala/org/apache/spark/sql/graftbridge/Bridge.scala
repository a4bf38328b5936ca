package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Minimal private[sql] bridge for the custom-operator layer
  * (graft.plans): building a DataFrame from a LogicalPlan and
  * extracting the Catalyst expression behind a public Column are
  * private[sql] in Spark 4 — the standard extension-library pattern
  * is a shim object under org.apache.spark.sql.
  */
object Bridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def expr(c: Column): Expression =
    classic.ExpressionUtils.expression(c)

  def analyzedPlan(df: DataFrame): LogicalPlan =
    df.queryExecution.analyzed

  /** Collision-free per-session identity (ADVICE r4: identityHashCode
    * keys can alias across live sessions) — `sessionUUID` is
    * private[sql] in Spark 4's public facade. */
  def sessionUUID(spark: SparkSession): String =
    spark.asInstanceOf[classic.SparkSession].sessionUUID
}
