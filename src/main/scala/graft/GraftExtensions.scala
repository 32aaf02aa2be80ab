package graft

import graft.functions.{VecCosine, VecDot, VecNorm}
import graft.plans.TruncEqToRangeRule
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Engine extension point: make the custom Catalyst pieces first-class in
  * any session via
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * which injects the native vector expressions as SQL functions
  * (`vec_dot`, `vec_cosine`, `vec_norm`) and the [[TruncEqToRangeRule]]
  * optimizer rule (date_trunc-equality → pushable range). For an ALREADY
  * RUNNING session (tests, notebooks) use [[GraftExtensions.install]],
  * which reaches the same end state through `experimental.extraOptimizations`
  * and the function registry.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.VectorFunctions", name), builder))
    }
    ext.injectOptimizerRule(_ => TruncEqToRangeRule)
  }
}

object GraftExtensions {
  private[graft] val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> (es => VecDot(es(0), es(1))),
    "vec_cosine" -> (es => VecCosine(es(0), es(1))),
    "vec_norm" -> (es => VecNorm(es.head)))

  /** Retrofit a live session: same functions + rule as the config path. */
  def install(spark: SparkSession): Unit = {
    graft.functions.VectorFunctions.register(spark)
    if (!spark.experimental.extraOptimizations.contains(TruncEqToRangeRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TruncEqToRangeRule
  }
}
