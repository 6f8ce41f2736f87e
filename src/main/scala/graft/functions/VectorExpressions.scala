package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `graft_dot(a, b)` — fused dot product over float/double arrays with
  * whole-stage-codegen support.
  *
  * Replaces the `aggregate(zip_with(...))` higher-order-function chain in
  * the similarity kernels: HOFs allocate an intermediate array and run a
  * lambda interpreter per element; this compiles to a tight primitive
  * loop inside the generated code, keeping the surrounding operators in
  * one WholeStageCodegen span.
  *
  * Numerics are pinned to the oracle semantics: elements widen to double
  * and accumulate LEFT TO RIGHT — bitwise identical to the HOF
  * formulation and to DuckDB's list_dot_product over double lists, so
  * swapping kernels cannot change a single output bit. NULL semantics
  * also match the HOF: length mismatch or a null element → NULL result,
  * never a silent partial sum.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects array<float|double> args, got ${left.dataType} / ${right.dataType}")

  private def getter(e: Expression): (ArrayData, Int) => Double =
    if (elemType(e).contains(FloatType)) (a, i) => a.getFloat(i).toDouble
    else (a, i) => a.getDouble(i)

  // NULL semantics match the aggregate(zip_with(...)) HOF formulation (and
  // therefore the DuckDB oracle): mismatched lengths or any null element
  // yield NULL — never a silently-truncated partial dot product.
  override def nullable: Boolean = true

  private def mayHaveNullElems(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _                          => true
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val gx = getter(left)
    val gy = getter(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += gx(x, i) * gy(y, i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getExpr(e: Expression, arr: String, i: String): String =
      if (elemType(e).contains(FloatType)) s"(double) $arr.getFloat($i)"
      else s"$arr.getDouble($i)"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val nullCheck =
        if (mayHaveNullElems(left) || mayHaveNullElems(right))
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $s += ${getExpr(left, a, i)} * ${getExpr(right, b, i)};
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

/** Session-level registration — idempotent, no session-builder config
  * needed (works however the driver constructed the SparkSession).
  */
object VectorFunctions {
  /** (identifier, info, builder) triple — shared by the post-hoc register
    * below and GraftExtensions' build-time injectFunction.
    */
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    (children: Seq[Expression]) => {
      if (children.length != 2) {
        throw new IllegalArgumentException(
          s"graft_dot requires exactly 2 arguments, got ${children.length}")
      }
      DotProduct(children.head, children(1))
    })

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      descriptor._1, descriptor._2, descriptor._3)
}
