package org.apache.spark.sql.graftglue

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's native Catalyst expressions and the public
  * Column API. ExpressionUtils is private[sql], so this one-file glue
  * lives in an org.apache.spark.sql subpackage — the standard pattern
  * for Spark extension libraries that define custom expressions
  * without a session-level FunctionRegistry registration. */
object ColumnGlue {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a temp function on a LIVE session (sessionState is
    * private[sql]); config-driven deployments use GraftExtensions via
    * spark.sql.extensions instead. */
  def registerTempFunction(spark: org.apache.spark.sql.classic.SparkSession, name: String,
                           builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
