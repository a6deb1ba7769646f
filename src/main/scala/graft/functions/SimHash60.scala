package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 60-bit SimHash expression: text → fingerprint, one compiled
  * pass per row — the per-document kernel behind the near-dup operators
  * (q_dedup_simhash, q_dedup_incremental, q_split_leakage).
  *
  * Exact contract (identical to the aggregation formulation it replaces
  * — [[graft.llm.Dedup.simhashAgg]] — which SimHash60Spec pins it
  * against, and to the DuckDB oracles): tokens are `split(text, ' ')`
  * with ALL empty strings kept (Java regex split, limit -1 — a split on
  * the single-space pattern never drops leading/inner/trailing empties);
  * each token hashes to the first 15 hex digits of its md5 read as a
  * 60-bit integer (`conv(substring(md5(t),1,15),16,10)`); bit j of the
  * fingerprint is set iff Σ_tokens (bit j of hash ? +1 : −1) > 0.
  *
  * Why a native expression and not explode + 60-column aggregation
  * (guide §2.3/§4 — remove the shuffle outright, then make the per-task
  * work compiled): the fingerprint is a pure per-row function of `text`,
  * so tokenize → explode → hash → 60 conditional sums → re-group by
  * doc_id paid a corpus-wide row explosion plus one full Exchange per
  * fingerprint pass just to undo the explode. This kernel is one
  * byte-level scan per document inside whole-stage codegen: split at
  * 0x20 (never a UTF-8 continuation byte, so byte-split == char-split),
  * md5 each token slice in place, ±1 the 60 counters — zero shuffles,
  * zero row amplification, and the md5 work itself is unchanged. The
  * integer counters make the result bit-exact regardless of token
  * order, so expression == aggregation is an identity, not an
  * approximation.
  */
case class SimHash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash60 expects a string argument, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHash60.kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.SimHash60.kernel($s)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash60 {
  // one digest instance per executor thread, reused across rows/tokens
  private val localMd = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** The compiled per-row kernel (public static for generated code). */
  def kernel(s: UTF8String): Long = {
    val bytes = s.getBytes // UTF-8; 0x20 never occurs in a multibyte seq
    val md = localMd.get()
    val counters = new Array[Int](60)
    val n = bytes.length
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == 0x20) {
        md.reset()
        md.update(bytes, start, i - start)
        val d = md.digest()
        // first 15 md5 hex digits as a 60-bit integer: bytes 0..6 whole,
        // byte 7's high nibble last — conv(substring(hex,1,15),16,10)
        val hv = ((d(0) & 0xFFL) << 52) | ((d(1) & 0xFFL) << 44) |
          ((d(2) & 0xFFL) << 36) | ((d(3) & 0xFFL) << 28) |
          ((d(4) & 0xFFL) << 20) | ((d(5) & 0xFFL) << 12) |
          ((d(6) & 0xFFL) << 4) | ((d(7) & 0xF0L) >>> 4)
        var j = 0
        while (j < 60) {
          if (((hv >>> j) & 1L) == 1L) counters(j) += 1 else counters(j) -= 1
          j += 1
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 60) { if (counters(j) > 0) out |= 1L << j; j += 1 }
    out
  }
}
