package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression: squared Euclidean distance of two
  * ARRAY<DOUBLE> / ARRAY<FLOAT> columns — one fused codegen loop, the
  * CosineSimilarity pattern applied to the OTHER hot distance in the
  * engine (kNN graph edges, IVF cell assignment, PQ ADC tables).
  *
  * The composed `aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)))` form it
  * replaces builds an intermediate array and dispatches two lambda chains
  * per row; this loop allocates nothing. Accumulation is index-ascending
  * — the SAME order as the HOF left fold — so swapping the
  * implementations cannot move a result by even an ulp, and the
  * DuckDB-oracle'd kNN distances hash-match unchanged. Returns NULL on
  * NULL inputs; mixed float/double element widths are read per the
  * child's actual type (the getDouble-over-float trap, as in
  * CosineSimilarity). Type checking and the NULL-on-ragged-length
  * contract live in [[VectorPairExpression]]. */
case class L2DistanceSq(left: Expression, right: Expression)
    extends VectorPairExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_sq"

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
      val d = xi - yi
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val dd = ctx.freshName("dd")
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
            double $dd = ${get(a, left)} - ${get(b, right)};
            $acc += $dd * $dd;
          }
          ${ev.value} = $acc;
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
