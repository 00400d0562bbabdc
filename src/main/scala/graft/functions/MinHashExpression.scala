package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** The whole MinHash signature of a shingle-set column in ONE native
  * loop: md5 each shingle once, take its first 28 bits as the base
  * hash, and fold every Carter-Wegman permutation `(a·v + b) mod p`
  * min-wise in the same pass.
  *
  * The column formulation — `transform(sh, md5…)` to base hashes, then
  * `numHashes` separate `array_min(transform(bh, pmod…))` towers —
  * evaluates every higher-order function interpreted (per-element
  * lambda dispatch + a materialized array per hash function), which
  * dominated the d02/d05 bench at 12s+. Semantics are identical
  * bit-for-bit for every non-empty input (and shingle sets are never
  * empty — [[graft.text.TextAnalysis.shingles]] emits the whole token
  * stream as a singleton for short docs), so the DuckDB oracle that
  * replays the column formulation still matches exactly.
  */
case class MinHashSignature(child: Expression, coeffs: Seq[(Long, Long)], p: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }

  private lazy val as: Array[Long] = coeffs.map(_._1).toArray
  private lazy val bs: Array[Long] = coeffs.map(_._2).toArray

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val k = as.length
    val mins = Array.fill(k)(Long.MaxValue)
    val md = MinHashSignature.mdLocal.get()
    var i = 0
    while (i < n) {
      val bytes = arr.getUTF8String(i).getBytes
      md.reset()
      val d = md.digest(bytes)
      // first 7 hex chars of the digest = the top 28 bits, exactly
      // conv(substring(md5(s), 1, 7), 16, 10)
      val v = ((d(0) & 0xffL) << 20) | ((d(1) & 0xffL) << 12) |
        ((d(2) & 0xffL) << 4) | ((d(3) & 0xff) >>> 4)
      var j = 0
      while (j < k) {
        val h = (v * as(j) + bs(j)) % p // all operands positive, no pmod fixup
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mhsig", this, classOf[MinHashSignature].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash_sig"
}

object MinHashSignature {

  private[functions] val mdLocal: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  def apply(shingleSet: Column, coeffs: Seq[(Long, Long)], p: Long): Column =
    Bridge.column(MinHashSignature(Bridge.expression(shingleSet), coeffs, p))
}

/** `transform(arr, s => conv(substring(md5(s), 1, hexChars), 16, 10))`
  * as one native loop — the md5-prefix hash array that feeds SimHash
  * (and the spec form of MinHash). The interpreted transform pays
  * per-element lambda dispatch on every token of every document.
  * `hexChars` ≤ 15 keeps the value inside a positive BIGINT.
  */
case class Md5PrefixLongs(child: Expression, hexChars: Int)
    extends UnaryExpression {

  require(hexChars >= 1 && hexChars <= 15,
    s"hexChars must be in [1, 15], got $hexChars")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    val md = MinHashSignature.mdLocal.get()
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(arr.getUTF8String(i).getBytes)
      // first hexChars hex digits = the top 4·hexChars bits of the digest
      var v = 0L
      var nib = 0
      while (nib < hexChars) {
        val b = d(nib / 2) & 0xff
        v = (v << 4) | (if (nib % 2 == 0) b >>> 4 else b & 0xf)
        nib += 1
      }
      out(i) = v
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("md5prefix", this, classOf[Md5PrefixLongs].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_md5_prefix_longs"
}

object Md5PrefixLongs {
  def apply(arr: Column, hexChars: Int): Column =
    Bridge.column(Md5PrefixLongs(Bridge.expression(arr), hexChars))
}
