package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Catalyst Expression bridge. Spark 4 made the classic
  * converters `private[sql]` (columnNodeSupport.scala); programmatically
  * constructed expressions that cannot be spelled in SQL text — e.g.
  * [[graft.functions.expressions.BloomContainsBc]], which carries a
  * Broadcast handle — still need a Column wrapper, so this one-file
  * package-in-spark-sql shim re-exports the two public-shaped calls.
  * Nothing else of the internal API is exposed.
  */
object GraftColumnBridge {
  def column(e: Expression): Column     = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
