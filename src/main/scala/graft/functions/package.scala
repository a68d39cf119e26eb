package graft

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> Expression bridging for Spark 4 (where
  * `new Column(expr)` / `col.expr` moved behind
  * `org.apache.spark.sql.classic`).
  */
package object functions {
  private[graft] def toExpr(c: Column): Expression = GraftBridge.toExpr(c)
  private[graft] def toColumn(e: Expression): Column = GraftBridge.toColumn(e)
}
