package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression: cosine similarity of two ARRAY<DOUBLE> or
  * ARRAY<FLOAT> columns with full whole-stage codegen (one fused primitive
  * loop, no per-element boxing or lambda dispatch).
  *
  * This is preference order (b) from SURVEY.md §4.2: the composed
  * higher-order-function formulation (Similarity.cosine — zip_with +
  * aggregate ×3) is semantically identical but evaluates three lambda
  * chains per row; this expression does one fused loop. Registered for SQL
  * as `cosine_sim` via GraftFunctions / GraftExtensions.
  *
  * Elements are read per the child's ACTUAL array element type — float
  * arrays are never read through getDouble (that reads 8-byte slots over
  * 4-byte data and silently returns garbage; `ExpectsInputTypes` is
  * sql-private so the analyzer inserts no cast for externally-registered
  * expressions — [[VectorPairExpression.checkInputDataTypes]] rejects
  * unsupported types at analysis instead). Returns NULL on NULL input
  * rows and on unequal vector lengths (the VectorPairExpression
  * contract); NaN when either vector has zero norm (rankers should null
  * it — Similarity.safeCosine).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorPairExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val lDouble = elemType(left) == DoubleType
    val rDouble = elemType(right) == DoubleType
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = if (lDouble) x.getDouble(i) else x.getFloat(i).toDouble
      val yi = if (rDouble) y.getDouble(i) else y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      // x/y must be fresh too: a hardcoded name that shadows an enclosing
      // generated-scope local is a Java compile error → whole-stage
      // fallback to interpreted mode
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      def get(arr: String, e: Expression) =
        if (elemType(e) == DoubleType) s"$arr.getDouble($i)"
        else s"(double) $arr.getFloat($i)"
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $dot = 0.0, $nx = 0.0, $ny = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            double $x = ${get(a, left)};
            double $y = ${get(b, right)};
            $dot += $x * $y; $nx += $x * $x; $ny += $y * $y;
          }
          ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
