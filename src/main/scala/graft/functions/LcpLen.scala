package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native longest-common-prefix length: `lcp_len(text, pos, ptext, ppos)`
  * returns the number of equal leading CODE POINTS of `text[pos..]` vs
  * `ptext[ppos..]` (0-based code-point offsets), naturally capped at the
  * shorter remaining suffix. A position at or beyond its string's end
  * contributes an empty suffix (LCP 0).
  *
  * This is [[graft.llm.Suffix.dedupSuffixMaxrep]]'s candidate-pair probe.
  * The declarative form it replaces —
  * `array_position(zip_with(slice(split(text,'')…), slice(split(ptext,'')…),
  * (x,y) -> x <> y), true)` — SPLITS BOTH WHOLE TEXTS into per-character
  * string arrays per candidate row (O(len) allocations for an O(lcp)
  * answer) and then walks the zipped pair with the interpreted HOF
  * evaluator. This kernel is one compiled byte-walk over the two
  * UTF8Strings: no String conversion, no arrays, O(pos + lcp) work per
  * row. Same rationale as [[CdcChunks]]; LcpLenSpec pins kernel == HOF
  * on randomized input (ASCII + BMP non-ASCII + astral plane), and the
  * q_dedup_suffix_maxrep oracle hash re-proves the consumer per gate.
  *
  * Code-point counting note: equal code points have equal UTF-8
  * encodings, so the walk compares raw bytes and counts a match only
  * when the full encoded sequence matches — a partial multi-byte match
  * is a mismatch, exactly like the per-code-point zip_with.
  */
case class LcpLen(first: Expression, second: Expression,
                  third: Expression, fourth: Expression)
  extends QuaternaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "lcp_len"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (StringType, LongType, StringType, LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c, d) => TypeCheckResult.TypeCheckFailure(
        s"lcp_len expects (string, bigint, string, bigint), got " +
          s"(${a.sql}, ${b.sql}, ${c.sql}, ${d.sql})")
    }

  override def nullSafeEval(t: Any, p: Any, pt: Any, pp: Any): Any =
    LcpLen.kernel(t.asInstanceOf[UTF8String], p.asInstanceOf[Long],
      pt.asInstanceOf[UTF8String], pp.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, p, pt, pp) =>
      s"graft.functions.LcpLen.kernel($t, $p, $pt, $pp)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond,
      third = newThird, fourth = newFourth)
}

object LcpLen {
  /** Byte offset of the `cp`-th code point (0-based), or -1 when the
    * string has fewer than `cp` code points. UTF-8 lead bytes delimit
    * code points, so this is a lead-byte count walk — no decoding. */
  private def offsetOf(s: UTF8String, cp: Long): Int = {
    val n = s.numBytes
    var i = 0
    var c = 0L
    while (c < cp && i < n) {
      i += UTF8String.numBytesForFirstByte(s.getByte(i))
      c += 1
    }
    if (c == cp && i <= n) i else -1
  }

  /** The compiled per-row kernel (public static for generated code). */
  def kernel(t: UTF8String, pos: Long, p: UTF8String, ppos: Long): Long = {
    if (pos < 0 || ppos < 0) return 0L
    var ti = offsetOf(t, pos)
    var pi = offsetOf(p, ppos)
    if (ti < 0 || pi < 0) return 0L
    val tn = t.numBytes
    val pn = p.numBytes
    var lcp = 0L
    var go = true
    while (go && ti < tn && pi < pn) {
      val w = UTF8String.numBytesForFirstByte(t.getByte(ti))
      if (ti + w > tn || pi + w > pn) go = false // malformed-tail guard
      else {
        var k = 0
        var eq = true
        while (eq && k < w) {
          eq = t.getByte(ti + k) == p.getByte(pi + k)
          k += 1
        }
        if (eq) { ti += w; pi += w; lcp += 1L } else go = false
      }
    }
    lcp
  }
}
