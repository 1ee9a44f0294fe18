package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 moved the classic
  * Column-from-Expression constructors behind `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`); a library shipping
  * custom Catalyst expressions needs exactly these two calls, so this
  * object lives in a `sql` subpackage to reach them — the same approach
  * used by public Spark-extension libraries on 4.x.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
