package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Shared contract of the three fused-loop vector primitives
  * (CosineSimilarity, L2DistanceSq, DotProduct):
  *
  *  - **Analysis-time type checking.** `ExpectsInputTypes` is sql-private
  *    for externally-registered expressions, so without this override a
  *    mistyped argument surfaced as a runtime `IllegalArgumentException`
  *    mid-job. `checkInputDataTypes` turns it into an `AnalysisException`
  *    at plan time, before any task runs.
  *  - **Ragged input returns NULL.** The `zip_with + aggregate` folds these
  *    expressions replaced pad the shorter array with nulls, which nulls
  *    the whole fold — so unequal-length vectors yielded NULL there. The
  *    fused loops now mirror that exactly (previously they silently
  *    truncated to the shorter length — a semantic drift on ragged input).
  *    Equal-length inputs are bit-identical to the folds, as before.
  */
trait VectorPairExpression extends BinaryExpression {

  protected def elemTypeOf(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (DoubleType | FloatType), _) => Some(t)
    case _ => None
  }

  /** Element type for eval/codegen — analysis already vetted it. */
  protected def elemType(e: Expression): DataType = elemTypeOf(e).getOrElse(
    throw new IllegalArgumentException(
      s"$prettyName expects array<double> or array<float>, got ${e.dataType}"))

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemTypeOf(left).isDefined && elemTypeOf(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<double> or array<float> arguments, " +
          s"got (${left.dataType.sql}, ${right.dataType.sql})")

  /** NULL on null input (BinaryExpression's null-safe path) OR on
    * unequal lengths — so nullable regardless of the children. */
  override def nullable: Boolean = true
}
