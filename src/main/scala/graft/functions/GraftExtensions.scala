package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: installs the engine's native
  * functions into every session built with
  * `.withExtensions(new GraftExtensions)` or via
  * `spark.sql.extensions=graft.functions.GraftExtensions` — the deployment
  * path on a shared cluster, where per-session `VectorFunctions.register`
  * calls would not survive new sessions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      es => VecDot(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[VecCosine].getName, "vec_cosine"),
      es => VecCosine(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("vec_norm"),
      new ExpressionInfo(classOf[VecNorm].getName, "vec_norm"),
      es => VecNorm(es.head)))
  }
}
