package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Minimum md5 over word k-gram shingles of a token array — the
  * document fingerprint ([[graft.text.TextAnalysis.fingerprint]]) as
  * one native loop.
  *
  * The column formulation (`array_min(transform(shingles, md5))`, with
  * `shingles` itself a transform over slice+concat_ws) evaluates every
  * higher-order function interpreted and materializes both the shingle
  * and digest arrays per document. This expression digests each window
  * incrementally (token bytes + single-space separators — byte-wise
  * identical to hashing `concat_ws(" ", slice(toks, i, k))`), tracks
  * the minimum digest with an unsigned byte compare (hex encoding is
  * order-preserving over unsigned bytes), and hex-encodes only the
  * winner. Semantics match the SQL formulation exactly, including the
  * short-document rule: fewer than k tokens (or zero) hash the whole
  * token stream as one shingle.
  */
case class FingerprintMinMd5(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    FingerprintMinMd5.compute(input.asInstanceOf[ArrayData], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.FingerprintMinMd5.compute($a, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_fingerprint_min_md5"
}

object FingerprintMinMd5 {

  private val mdLocal: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
  private val SPACE = Array(' '.toByte)
  private val HEX = "0123456789abcdef".toCharArray

  /** Unsigned lexicographic compare — the byte-level equivalent of
    * comparing lowercase-hex md5 strings.
    */
  private def lessUnsigned(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length && i < b.length) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    a.length < b.length
  }

  def compute(arr: ArrayData, k: Int): UTF8String = {
    val n = arr.numElements()
    val md = mdLocal.get()
    val toks = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i).getBytes; i += 1 }
    def digestWindow(start: Int, len: Int): Array[Byte] = {
      md.reset()
      var j = 0
      while (j < len) {
        if (j > 0) md.update(SPACE)
        md.update(toks(start + j))
        j += 1
      }
      md.digest()
    }
    var best: Array[Byte] = null
    if (n < k) {
      best = digestWindow(0, n) // whole stream as the singleton shingle
    } else {
      i = 0
      val windows = n - k + 1
      while (i < windows) {
        val d = digestWindow(i, k)
        if (best == null || lessUnsigned(d, best)) best = d
        i += 1
      }
    }
    val out = new Array[Byte](best.length * 2)
    i = 0
    while (i < best.length) {
      out(2 * i) = HEX((best(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HEX(best(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  def apply(tokens: Column, k: Int): Column =
    Bridge.column(FingerprintMinMd5(Bridge.expression(tokens), k))
}
