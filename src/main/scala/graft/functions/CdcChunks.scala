package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native content-defined-chunking expression: text → array of chunk
  * strings, boundaries where the Rabin-style rolling hash of the
  * trailing `w`-char window hits 0 mod `divisor` (the LBFS/FastCDC
  * family; see [[graft.llm.Cdc]] for the operator built on it).
  *
  * Exact contract (identical to the HOF formulation it replaces, and to
  * the DuckDB oracle): over CODE POINTS, H(i) is the left fold
  * acc ← (acc·b + cp(i+k)) mod `mask` for k in [0, w); a cut lands
  * AFTER the window (at i+w) when H(i) mod divisor == 0, cuts at the
  * very end are dropped, and chunks are the code-point substrings
  * between [0] ++ cuts ++ [len]. A doc shorter than one window is one
  * whole-doc chunk.
  *
  * Why a native expression and not the higher-order-function fold: HOF
  * lambda bodies are evaluated by the INTERPRETED expression evaluator
  * per element — O(len·w) interpreted steps per document (tens of
  * millions per MB). This kernel is one compiled JVM loop per row
  * (same arithmetic, ~two orders of magnitude cheaper per byte), and
  * chunk extraction slices the code-point array directly instead of
  * per-chunk substring scans (the O(len²/64) tail the HOF form carried).
  * Codegen emits a single static kernel call per row, so the expression
  * stays inside whole-stage codegen instead of forcing a fallback.
  * CdcChunksSpec pins kernel == HOF equality; the q_text_cdc /
  * q_dedup_cdc oracle hashes re-prove the contract at every gate run.
  */
case class CdcChunks(child: Expression, w: Int, b: Long, mask: Long,
                     divisor: Long) extends UnaryExpression {
  require(w >= 1 && b > 0 && mask > 1 && divisor > 0,
    s"cdc_chunks: bad params (w=$w b=$b mask=$mask divisor=$divisor)")
  require(mask <= Long.MaxValue / b - 1,
    s"cdc_chunks: mask·b must not overflow long (mask=$mask b=$b)")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "cdc_chunks"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks expects a string argument, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    CdcChunks.kernel(input.asInstanceOf[UTF8String], w, b, mask, divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.CdcChunks.kernel($s, $w, ${b}L, ${mask}L, ${divisor}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcChunks {
  /** The compiled per-row kernel (public static for generated code). */
  def kernel(s: UTF8String, w: Int, b: Long, mask: Long,
             divisor: Long): ArrayData = {
    val str = s.toString
    val cps = str.codePoints().toArray
    val len = cps.length
    // boundary list: 0, every qualifying cut, len
    val cuts = new java.util.ArrayList[Integer]()
    var i = 0
    while (i <= len - w) {
      var acc = 0L
      var k = 0
      while (k < w) { acc = (acc * b + cps(i + k)) % mask; k += 1 }
      if (acc % divisor == 0L && i + w < len) cuts.add(i + w)
      i += 1
    }
    val nChunks = cuts.size() + 1
    val out = new Array[AnyRef](nChunks)
    var from = 0
    var c = 0
    while (c < nChunks) {
      val until = if (c < cuts.size()) cuts.get(c).intValue() else len
      out(c) = UTF8String.fromString(new String(cps, from, until - from))
      from = until
      c += 1
    }
    new GenericArrayData(out)
  }
}
