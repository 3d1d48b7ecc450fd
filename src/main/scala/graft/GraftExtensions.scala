package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.RollingHash

/** SparkSessionExtensions entry point: builds a session with the engine's
  * custom pieces pre-registered —
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * }}}
  * Registers the `rolling_hash` SQL function (graft.functions.RollingHash).
  * The materialized-view routing rule installs per-view at
  * `MatView.materialize` time via experimental.extraOptimizations (it needs
  * runtime registry state, not a static rule), and is therefore not listed
  * here.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        RollingHash(exprs.head)))
  }
}
