package org.apache.spark.sql.classic

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the sql-package-private Column <-> Expression converters.
  *
  * graft's Column-level APIs (e.g. dna.translateDna) construct native
  * Catalyst expressions directly so they work on any SparkSession without
  * a function-registry round trip; the converters live behind
  * private[sql], hence this one-object bridge in the Spark namespace —
  * the standard pattern for Catalyst-extending libraries.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
