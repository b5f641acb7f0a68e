package graft.plans

import graft.functions.FloatVectorDot
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the portable higher-order-function dot product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0.0, (acc, v) -> acc + v) }}}
  *
  * into the codegen'd [[graft.functions.FloatVectorDot]] primitive whenever
  * both inputs are `array<float>`.
  *
  * Why a `Rule[LogicalPlan]` (SURVEY §7.3): users (and the engine's own
  * composable [[graft.operators.Similarity.dot]]) write the declarative HOF
  * form; the HOF interpreter allocates an intermediate array and walks a
  * lambda tree per element (~6× slower on the similarity bench). The rule
  * lets the declarative form keep its meaning while execution gets the
  * fused tight loop — exactly how Catalyst is meant to be extended, and the
  * rewrite is exact for EVERY array<float> input because both forms
  * accumulate in double precision in index order and agree on all null
  * shapes: null array → null, any null element → null (the poisoned HOF
  * sum), unequal lengths → null (zip_with's null padding). FloatVectorDot
  * implements those null semantics natively, so the rule needs no
  * nullability guard (VecDotFusionSpec pins each case on the fused path).
  *
  * Registered session-wide by [[GraftExtensions]]; also usable ad hoc via
  * `spark.experimental.extraOptimizations`.
  */
object VecDotFusion extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(zw: ZipWith, Literal(0.0, DoubleType),
        merge: LambdaFunction, finish: LambdaFunction)
        if isFloatArray(zw.left) && isFloatArray(zw.right) &&
          isProductLambda(zw.function) && isSumLambda(merge) && isIdentity(finish) =>
      FloatVectorDot(zw.left, zw.right)
  }

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** (x, y) -> cast(x as double) * cast(y as double), in argument order. */
  private def isProductLambda(f: Expression): Boolean = f match {
    case LambdaFunction(Multiply(
        Cast(x: NamedLambdaVariable, DoubleType, _, _),
        Cast(y: NamedLambdaVariable, DoubleType, _, _), _),
        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      x.exprId == a.exprId && y.exprId == b.exprId
    case _ => false
  }

  /** (acc, v) -> acc + v (either operand order). */
  private def isSumLambda(f: Expression): Boolean = f match {
    case LambdaFunction(Add(l: NamedLambdaVariable, r: NamedLambdaVariable, _),
        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      Set(l.exprId, r.exprId) == Set(a.exprId, b.exprId)
    case _ => false
  }

  /** acc -> acc (the implicit finish of a 3-arg aggregate()). */
  private def isIdentity(f: LambdaFunction): Boolean = (f.function, f.arguments) match {
    case (v: NamedLambdaVariable, Seq(a: NamedLambdaVariable)) => v.exprId == a.exprId
    case _ => false
  }
}
