package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** The one `private[sql]` doorway this library needs: wrap a catalyst
  * [[Expression]] as a public [[Column]] (Spark 4 routes Column
  * construction through ColumnNodes; `ExpressionUtils.column` is the
  * classic-session adapter). Used for native kernels that must work
  * WITHOUT session function registration (e.g.
  * [[graft.functions.HexLower64]] inside [[graft.util.Md5Lower64]],
  * which is called from every operator file — requiring
  * `GraftFunctions.register` there would make hash parity depend on
  * call-site registration order). Everything else in this repo goes
  * through the public registry (`GraftFunctions.register` +
  * `call_function`).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Re-bind an ANALYZED plan to another session — the doorway that
    * lets a write-path job run under an ISOLATED SQLConf
    * (`spark.newSession()`) instead of mutating the caller's
    * session-global conf (which a concurrently-running query would
    * silently inherit). The plan must already be analyzed: temp-view
    * references are session-scoped and would not resolve in the clone. */
  def ofRows(s: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      s.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
