package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column ↔ Expression converters, so graft
  * can expose native Catalyst expressions through the public Column API —
  * the same packaging pattern Spark-native libraries (Delta, Sedona) use.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Lazily wrapped expression — fine inside standard operators that Spark
    * itself converts (select/filter projections). */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly converted catalyst expression (UnresolvedAttribute/SortOrder
    * and friends) — required when the expression is embedded in a CUSTOM
    * logical node, where the analyzer's generic rules must see real
    * catalyst nodes, not the lazy ColumnNode wrapper. */
  def catalystExpression(session: org.apache.spark.sql.classic.SparkSession,
      c: Column): Expression = session.expression(c)

  /** A 1-row 1-column DataFrame as an uncorrelated scalar-subquery
    * expression — the form expressions like BloomFilterMightContain
    * require for their "constant" side. The subquery executes once per
    * query (not per row) and its value is broadcast into codegen. */
  def scalarSubquery(df: org.apache.spark.sql.DataFrame): Expression =
    org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
      df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].logicalPlan)
}
