package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, ExpressionUtils, SparkSession}

/** Bridge into Spark's `private[sql]` Column ⇄ Expression converters so the
  * engine can plan custom Catalyst expressions (e.g. [[graft.functions.VecDot]])
  * through the public Column API. Lives under `org.apache.spark.sql` purely
  * for access; contains no logic.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap an analyzed/optimized LogicalPlan fragment as a DataFrame —
    * used by the plan audit to MEASURE properties of an operator's
    * input subtree (e.g. the distinct cardinality a WindowExec
    * partitions on) instead of guessing them from attribute names. */
  def dataFrame(spark: org.apache.spark.sql.SparkSession,
                plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)
}
