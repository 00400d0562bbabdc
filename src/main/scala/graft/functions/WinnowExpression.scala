package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
  * SIGMOD 2003 — the MOSS algorithm): hash every word `k`-gram
  * shingle, slide a window of `w` consecutive hashes, and select each
  * window's minimum (ties to the RIGHTMOST position, the paper's
  * robust-winnowing rule); the distinct selected hashes are the
  * document's local fingerprints. Winnowing guarantees every match of
  * length ≥ w+k-1 tokens shares at least one fingerprint while keeping
  * the fingerprint density ~2/(w+1) — the position-robust upgrade of
  * t04's single global min-hash (one edit can change THE min; it
  * cannot change most window minima).
  *
  * One native loop per document: incremental md5 over token bytes +
  * single-space separators (byte-identical to hashing
  * `concat_ws(" ", slice(toks, i, k))`), windows walked over the hex
  * digests with unsigned-byte compares, selections deduplicated and
  * returned SORTED ascending — deterministic, so a SQL replay
  * (`list_sort(list_distinct(...))` over the same selection fold)
  * reaches identical bytes. Short-document rule matches t04: fewer
  * than k tokens hash the whole stream as one shingle; fewer than w
  * hashes form a single window.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k > 0 && w > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires k > 0 and w > 0, got k=$k w=$w")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprints.compute(input.asInstanceOf[ArrayData], k, w)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.WinnowFingerprints.compute($a, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_winnow_fingerprints"
}

object WinnowFingerprints {

  private val mdLocal: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
  private val SPACE = Array(' '.toByte)
  private val HEX = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): String = {
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = HEX((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HEX(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  def compute(arr: ArrayData, k: Int, w: Int): ArrayData = {
    val n = arr.numElements()
    val md = mdLocal.get()
    val toks = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i).getBytes; i += 1 }
    def digestWindow(start: Int, len: Int): String = {
      md.reset()
      var j = 0
      while (j < len) {
        if (j > 0) md.update(SPACE)
        md.update(toks(start + j))
        j += 1
      }
      hex(md.digest())
    }
    // shingle digests; < k tokens → the whole stream as one shingle
    val hs: Array[String] =
      if (n < k) Array(digestWindow(0, n))
      else Array.tabulate(n - k + 1)(s => digestWindow(s, k))
    val nh = hs.length
    val nw = math.max(nh - w + 1, 1)
    val selected = new java.util.TreeSet[String]()
    var wi = 0
    while (wi < nw) {
      val end = math.min(wi + w, nh)
      var best = wi
      var j = wi + 1
      // min hash, ties to the RIGHTMOST position (robust winnowing)
      while (j < end) {
        if (hs(j).compareTo(hs(best)) <= 0) best = j
        j += 1
      }
      selected.add(hs(best))
      wi += 1
    }
    val out = new Array[AnyRef](selected.size())
    val it = selected.iterator()
    i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  def apply(tokens: Column, k: Int = 5, w: Int = 4): Column =
    Bridge.column(WinnowFingerprints(Bridge.expression(tokens), k, w))
}
