package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: recognize the declarative higher-order dot product
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)
  *
  * and rewrite it to the codegen'd [[DotProduct]] expression. Users
  * (and the library's own `VectorFunctions.dot`) can stay fully
  * declarative; the plan still runs the primitive loop. This is the
  * Catalyst-native way to accelerate a hot pattern: rewrite the
  * LOGICAL form once instead of asking every call site to opt in.
  *
  * Injected via `spark.sql.extensions=graft.plans.GraftExtensions` or
  * `GraftExtensions.register(spark)`.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private object MultiplyLambda {
    def unapply(f: Expression): Boolean = f match {
      case LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _), Seq(a, b), _) =>
        (x.exprId == a.exprId && y.exprId == b.exprId) ||
          (x.exprId == b.exprId && y.exprId == a.exprId)
      case _ => false
    }
  }

  private object AddLambda {
    def unapply(f: Expression): Boolean = f match {
      case LambdaFunction(Add(x: NamedLambdaVariable, y: NamedLambdaVariable, _), Seq(acc, v), _) =>
        (x.exprId == acc.exprId && y.exprId == v.exprId) ||
          (x.exprId == v.exprId && y.exprId == acc.exprId)
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b, MultiplyLambda()),
            Literal(0.0, DoubleType),
            AddLambda(),
            LambdaFunction(body: NamedLambdaVariable, Seq(acc: NamedLambdaVariable), _))
          if isDoubleArray(a) && isDoubleArray(b) && body.exprId == acc.exprId =>
        DotProduct(a, b)
    }
}
