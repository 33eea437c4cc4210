package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for registering composition-backed SQL
  * functions: a `FunctionBuilder` receives child `Expression`s and must
  * return an `Expression`, while the engine's operators are written against
  * the public `Column` algebra — this adapter lets one definition serve
  * both the DataFrame API and `spark.sql`. Lives under `org.apache.spark
  * .sql` only because `classic.ExpressionUtils` is `private[sql]` (the
  * conversion itself is the stable, documented Column/Expression duality).
  */
object ColumnBridge {
  /** Convert through the active session's ColumnNode converter so the
    * Column tree becomes real (possibly unresolved) catalyst expressions
    * the analyzer finishes resolving — `ExpressionUtils.expression` alone
    * wraps the tree in an opaque leaf the analyzer cannot see into.
    */
  def toExpression(c: Column): Expression =
    org.apache.spark.sql.classic.SparkSession.getActiveSession match {
      case Some(s) => s.expression(c)
      case None    => ExpressionUtils.expression(c)
    }
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
}
