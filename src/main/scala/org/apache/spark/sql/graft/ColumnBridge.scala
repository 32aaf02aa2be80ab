package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column ⇄ Expression conversion (Spark 4 moved
  * Column onto ColumnNode; `org.apache.spark.sql.classic.ExpressionUtils`
  * is the supported internal adapter). Lives in the spark.sql package
  * namespace solely to cross the access boundary — no Spark internals are
  * modified.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Test-only: materialize a SparkSessionExtensions' injected functions
    * into a registry (the session builder does this internally on create). */
  def registerInto(exts: org.apache.spark.sql.SparkSessionExtensions,
                   reg: org.apache.spark.sql.catalyst.analysis.FunctionRegistry): Unit =
    exts.registerFunctions(reg)
}
