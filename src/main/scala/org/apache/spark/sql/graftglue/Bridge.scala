package org.apache.spark.sql.graftglue

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression glue. Spark 4 makes `ExpressionUtils` private[sql];
  * this object lives inside the sql package tree solely to re-expose the two
  * conversions our custom Catalyst expressions need. No Spark internals are
  * modified or shadowed.
  */
object Bridge {
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
}
