package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: recognize the portable higher-order-function dot
  * product — aggregate(zip_with(a, b, (x, y) -> x * y), 0d,
  * (acc, v) -> acc + v) — and replace it with the codegen'd DotProduct
  * kernel. Users keep writing standard HOF SQL (runnable on any engine)
  * and still get the fused primitive loop.
  *
  * The rewrite fires ONLY when both arrays are double-typed: there the
  * kernel is bitwise identical (left-to-right double accumulation; IEEE
  * multiply/add are bitwise commutative, so operand order in the lambdas
  * is free). Float arrays do NOT match — the HOF multiplies in float
  * before widening, the kernel widens first, and silently changing
  * numerics is exactly what an optimizer rule must never do.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _                        => false
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(a, b,
          LambdaFunction(Multiply(mx: NamedLambdaVariable, my: NamedLambdaVariable, _),
            Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), _)),
        Literal(init: java.lang.Double, DoubleType),
        LambdaFunction(Add(ax: NamedLambdaVariable, ay: NamedLambdaVariable, _),
          Seq(macc: NamedLambdaVariable, mv: NamedLambdaVariable), _),
        LambdaFunction(fin: NamedLambdaVariable, Seq(finv: NamedLambdaVariable), _))
      // raw-bits check: -0.0 == 0.0 under ==, but the HOF yields -0.0 for an
      // empty array with a -0.0 accumulator while the kernel yields 0.0 — a
      // stringified output change a bitwise-invisible rule must not make
      if java.lang.Double.doubleToRawLongBits(init) == 0L &&
        isDoubleArray(a) && isDoubleArray(b) &&
        Set(mx.exprId, my.exprId) == Set(zx.exprId, zy.exprId) &&
        Set(ax.exprId, ay.exprId) == Set(macc.exprId, mv.exprId) &&
        fin.exprId == finv.exprId =>
      DotProduct(a, b)
  }
}

/** Session extensions — `spark.sql.extensions=graft.functions.GraftExtensions`
  * registers the graft_dot function and the HOF-to-kernel rewrite at
  * session build time; `GraftExtensions.install` does the same post-hoc
  * on a live session (tests, REPLs, the driver's pre-built session).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(VectorFunctions.descriptor)
    ext.injectOptimizerRule(_ => RewriteHofDotProduct)
  }
}

object GraftExtensions {
  def install(spark: SparkSession): Unit = {
    VectorFunctions.register(spark)
    if (!spark.experimental.extraOptimizations.contains(RewriteHofDotProduct)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteHofDotProduct
    }
  }
}
