// The ONE file outside the graft.* namespace: Spark 4's Connect-unified
// API made the Column ↔ catalyst-Expression bridge private[sql]
// (org.apache.spark.sql.classic.ExpressionUtils), and TxStore's
// stats-pruning needs to WALK a predicate Column's expression tree on
// the driver (no session-bound analysis involved). A subpackage of
// org.apache.spark.sql is inside the private[sql] scope — the standard
// extension-library idiom for the handful of bridges Spark keeps
// qualified-private.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

object ColumnBridge {

  /** The catalyst expression a classic-session Column wraps — via the
    * FULL node→expression converter, not ExpressionUtils.expression
    * (which defers behind a lazy ColumnNodeExpression wrapper that a
    * pattern match cannot see through). */
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)
}
