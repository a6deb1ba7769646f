package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression: dot product of two ARRAY<DOUBLE> /
  * ARRAY<FLOAT> columns — the third fused-loop distance primitive
  * (CosineSimilarity, L2DistanceSq, this). Used by the hyperplane-LSH
  * projection, where the HOF fold runs once per (row × table × plane):
  * the multiplier that makes per-element overhead matter. Index-ascending
  * accumulation, same as the fold it replaces — results are
  * bit-identical. Type checking and the NULL-on-ragged-length contract
  * live in [[VectorPairExpression]]. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorPairExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val lDouble = elemType(left) == DoubleType
    val rDouble = elemType(right) == DoubleType
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xi = if (lDouble) x.getDouble(i) else x.getFloat(i).toDouble
      val yi = if (rDouble) y.getDouble(i) else y.getFloat(i).toDouble
      acc += xi * yi
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      def get(arr: String, e: Expression) =
        if (elemType(e) == DoubleType) s"$arr.getDouble($i)"
        else s"(double) $arr.getFloat($i)"
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $acc += ${get(a, left)} * ${get(b, right)};
          }
          ${ev.value} = $acc;
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
