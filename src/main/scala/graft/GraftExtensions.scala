package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions._

/** Declarative injection point: build sessions with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` to get every
  * graft function pre-registered. Equivalent to calling
  * `GraftFunctions.register(spark)` on an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("duck_index"),
      new ExpressionInfo("graft.functions", "duck_index"),
      args => DuckIndex(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("duck_slice"),
      new ExpressionInfo("graft.functions", "duck_slice"),
      args => DuckSlice(args(0), args(1), args(2))))
    ext.injectFunction((FunctionIdentifier("duck_datediff"),
      new ExpressionInfo("graft.functions", "duck_datediff"),
      args => DuckDateDiff(args(0), args(1), args(2))))
    ext.injectFunction((FunctionIdentifier("current_setting"),
      new ExpressionInfo("graft.functions", "current_setting"),
      args => CurrentSetting(args(0))))
    ext.injectFunction((FunctionIdentifier("pragma_version"),
      new ExpressionInfo("graft.functions", "pragma_version"),
      _ => PragmaVersion()))
    // keyless range joins plan as binned equi-joins instead of
    // nested loops when spark.graft.rangeJoin.binWidth is set
    ext.injectOptimizerRule(graft.plans.BinnedRangeJoinRule(_))
  }
}
