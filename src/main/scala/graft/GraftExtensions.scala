package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/**
 * Spark-native injection point: register the engine's custom Catalyst
 * expressions in ANY session via configuration —
 *
 * {{{
 *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
 * }}}
 *
 * — the idiomatic way to ship library expressions to a cluster (no code
 * changes in the user's job; pure SQL users get `graft_cosine` etc. for
 * free). `graft.functions.ensureRegistered` remains the programmatic
 * equivalent for sessions created without the conf; both share one
 * builder table ([[graft.functions.nativeBuilders]]) so the surfaces
 * can never drift.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.nativeBuilders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name), builder))
    }
}
