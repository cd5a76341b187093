package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge from a Catalyst `Expression` to a user-facing `Column`.
  *
  * Spark 4 made the Column↔Expression conversion `private[sql]`
  * (`classic.ExpressionUtils`); this one-line forwarder, compiled inside the
  * `org.apache.spark.sql` package, is the supported-by-construction way for
  * a library to hand its native codegen expressions (graft.functions.*) to
  * the DataFrame API without going through the session function registry.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
