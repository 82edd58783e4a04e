package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4 moved these converters behind `private[sql]`
  * (org.apache.spark.sql.classic.ExpressionUtils), so libraries that
  * define their own expressions expose them via an in-package shim —
  * the same pattern used by open-source Spark extensions (e.g. the
  * DatasetFactory/ColumnDataset shims in public projects).
  */
object GraftBridge {
  def columnOf(e: Expression): Column = classic.ExpressionUtils.column(e)
  def exprOf(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Physical-plan string (for plan-shape audits). */
  def explainString(df: Dataset[_], mode: String = "formatted"): String =
    df.asInstanceOf[classic.Dataset[_]].queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString(mode))
}
