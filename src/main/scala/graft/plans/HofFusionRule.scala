package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.SquaredL2Expr

/** Optimizer rule (the SURVEY decision-table "custom Rule[LogicalPlan]"
  * slot): rewrite the interpreted higher-order-function squared-L2
  * fold
  *
  *   aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
  *             0.0d, (acc, v) => acc + v)
  *
  * into the codegen'd [[SquaredL2Expr]] — HOF lambdas are evaluated
  * per element through the interpreter (BASELINE.md measured ~10× on
  * exactly this kernel), while the Expression emits a primitive loop
  * into whole-stage codegen.
  *
  * The rewrite is OBSERVATIONALLY EXACT, which is what licenses an
  * optimizer rule rather than a call-site change: [[SquaredL2Expr]]
  * reproduces every HOF behaviour — null on ragged pairs (zip_with's
  * null padding poisons the fold), null on a null element pair
  * (`acc + null`), null on a null array, same fold order, same
  * double-only arithmetic — so oracle-checked queries stay hash-green
  * with the rule on. Only deterministic array<double> inputs match
  * (float arrays do float-then-widen arithmetic in the HOF — not this
  * pattern). The replacement contains no ArrayAggregate, so the
  * fixed-point optimizer cannot re-match it.
  *
  * Registered cluster-wide via `spark.sql.extensions=graft.GraftExtensions`
  * or per-session with `GraftFunctions.installOptimizations(spark)`.
  */
object HofFusionRule extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case agg @ ArrayAggregate(
          ZipWith(a, b, LambdaFunction(
            Multiply(
              Subtract(x1: NamedLambdaVariable, y1: NamedLambdaVariable, _),
              Subtract(x2: NamedLambdaVariable, y2: NamedLambdaVariable, _),
              _),
            Seq(xv: NamedLambdaVariable, yv: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(
            Add(m1: NamedLambdaVariable, m2: NamedLambdaVariable, _),
            Seq(av: NamedLambdaVariable, vv: NamedLambdaVariable), _),
          LambdaFunction(fin: NamedLambdaVariable,
            Seq(fv: NamedLambdaVariable), _))
        if x1.exprId == xv.exprId && x2.exprId == xv.exprId &&
          y1.exprId == yv.exprId && y2.exprId == yv.exprId &&
          m1.exprId == av.exprId && m2.exprId == vv.exprId &&
          fin.exprId == fv.exprId &&
          a.deterministic && b.deterministic &&
          isDoubleArray(a) && isDoubleArray(b) =>
        SquaredL2Expr(a, b)
    }
}
