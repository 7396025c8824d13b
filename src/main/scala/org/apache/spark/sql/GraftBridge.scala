package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into the `private[sql]` Column ⇄ Expression conversion that
  * Spark 4 moved behind `org.apache.spark.sql.classic.ExpressionUtils`.
  * Custom Catalyst expressions (e.g. graft.functions.SimHash64) need this to
  * surface as user-facing `Column`s. Kept to exactly two forwarders. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  /** FULLY-CONVERTED catalyst expression for a Column: [[expression]]
    * returns a lazy `ColumnNodeExpression` wrapper (never foldable, not
    * evaluable), which is fine for embedding in a plan but useless for
    * driver-side `eval()` — this runs the session's column-node
    * converter so a literal Column comes back as a real
    * `Literal`/foldable tree. */
  def resolvedExpression(spark: SparkSession, c: Column): Expression =
    spark.asInstanceOf[classic.SparkSession].expression(c)
  /** DataFrame from a logical plan (classic.Dataset.ofRows is private[sql]). */
  def dataFrame(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
  /** Block until queued listener events are delivered (`listenerBus` is
    * private[spark]) — the bench's shuffle-volume collector must read its
    * counters only after the async bus drained, or the last stage's task
    * metrics land in the NEXT query's bucket. */
  def drainListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
