package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native DSIR feature kernel: text → length-`buckets` histogram of its
  * hashed word-BIGRAMS, one compiled pass per row — the per-document
  * front half of [[graft.llm.Selection.textDsir]].
  *
  * Exact contract (identical to the explode formulation it replaces,
  * pinned by DsirBucketsSpec, and to the DuckDB oracle): tokens are
  * `split(text, ' ')` with empties kept; bigram i is
  * `tok(i) + " " + tok(i+1)` for i in [0, n_tok−1) (none below 2
  * tokens); its bucket is the first 6 md5 hex digits of
  * (salt ++ bigram) read as an integer, mod `buckets`
  * (`conv(substring(md5(concat(salt, g)),1,6),16,10) % buckets`).
  *
  * Two kernel facts make this cheap: adjacent tokens are separated by
  * exactly ONE 0x20 (that is what split-keeping-empties means), so
  * bigram bytes are a contiguous slice of the original text — no
  * concatenation, the md5 runs over (saltBytes, slice) in place; and
  * the first 6 hex digits are just the digest's first 3 bytes.
  *
  * Why (guide §2.3/§4): the explode form materialized one ROW per gram
  * occurrence (corpus_tokens-sized) carrying an md5 per row through a
  * persist and two aggregation passes; this kernel emits 64 longs per
  * document with the identical md5 count and zero row amplification —
  * the downstream model fit and scoring then shuffle (doc, bucket)
  * integers instead of gram strings.
  */
case class DsirBuckets(child: Expression, salt: String, buckets: Int)
  extends UnaryExpression {
  require(buckets >= 1 && buckets <= (1 << 24),
    s"dsir_buckets: buckets must be in [1, 2^24], got $buckets")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "dsir_buckets"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"dsir_buckets expects a string argument, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    DsirBuckets.kernel(input.asInstanceOf[UTF8String],
      salt.getBytes("UTF-8"), buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val saltRef = ctx.addReferenceObj("salt", salt.getBytes("UTF-8"),
      "byte[]")
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.DsirBuckets.kernel($s, $saltRef, $buckets)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DsirBuckets {
  private val localMd = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** The compiled per-row kernel (public static for generated code). */
  def kernel(s: UTF8String, salt: Array[Byte], buckets: Int): ArrayData = {
    val bytes = s.getBytes // UTF-8; 0x20 never occurs in a multibyte seq
    val md = localMd.get()
    val counts = new Array[Long](buckets)
    val n = bytes.length
    // token i spans [prevStart, prevEnd); bigram = [prevStart, end)
    var prevStart = -1
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == 0x20) {
        if (prevStart >= 0) {
          // bigram bytes = previous token start .. this token end
          md.reset()
          md.update(salt)
          md.update(bytes, prevStart, i - prevStart)
          val d = md.digest()
          val v = ((d(0) & 0xFF) << 16) | ((d(1) & 0xFF) << 8) | (d(2) & 0xFF)
          counts(v % buckets) += 1L
        }
        prevStart = start
        start = i + 1
      }
      i += 1
    }
    val out = new Array[Any](buckets)
    var b = 0
    while (b < buckets) { out(b) = counts(b); b += 1 }
    new GenericArrayData(out)
  }
}
