package graft.plans

import graft.functions.FloatVectorDot
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-wide registration of graft's Catalyst extensions. Enable with
  *
  * {{{ --conf spark.sql.extensions=graft.plans.GraftExtensions }}}
  *
  * (or `SparkSession.builder().withExtensions(new GraftExtensions)`), which
  * wires in, for every session of the cluster:
  *
  *  - the `graft_vec_dot` SQL function (codegen'd float-vector dot product),
  *    so SQL users get it without any per-session registration call;
  *  - [[VecDotFusion]], the optimizer rule fusing the equivalent
  *    `aggregate(zip_with(...))` HOF pattern into the same primitive.
  *
  * This is the engine's only piece of session-extension machinery — every
  * other operator is expressible as a plain DataFrame plan (SURVEY §7.3),
  * which is the point: extend Catalyst only where the built-ins can't say it.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_vec_dot"),
      new ExpressionInfo(classOf[FloatVectorDot].getName, "graft_vec_dot"),
      (exprs: Seq[Expression]) => FloatVectorDot(exprs(0), exprs(1))))
    ext.injectOptimizerRule(_ => VecDotFusion)
  }
}
