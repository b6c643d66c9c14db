package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Catalyst Expression bridge for graft's custom expressions.
  *
  * Spark 4 moved `Column` to a ColumnNode facade whose Expression accessors
  * are `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`); a
  * custom Catalyst aggregate (e.g. graft's TopKPairs) still needs to wrap
  * itself as a Column to compose with the public DataFrame API. This tiny
  * shim lives in the spark.sql package purely to re-export those two
  * conversions — the standard extension-library pattern; no Spark behavior
  * is touched.
  */
object GraftExpr {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expr(c: Column): Expression = ExpressionUtils.expression(c)
}
