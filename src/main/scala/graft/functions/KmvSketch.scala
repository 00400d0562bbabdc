package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** KMV (k-minimum-values) distinct-count sketch as a native Catalyst
  * [[TypedImperativeAggregate]] — the mergeable-sketch machinery a
  * 100 TB engine uses for cheap cardinalities: each partition keeps only
  * the k smallest distinct 60-bit hashes (a few KB), partial buffers
  * merge associatively map-side, and the final estimate is
  * `(k-1) · 2^60 / kth-smallest-hash`.
  *
  * Unlike HyperLogLog the whole computation is elementary arithmetic on
  * md5-derived hashes, so a SQL oracle replays it bit-for-bit: sort the
  * distinct hashes, keep k, apply the same closed form (see
  * `q26_kmv_distinct`). Accuracy is ~ 1/√(k−2) relative error (k=256 →
  * ~6%); with fewer than k distinct hashes the count is exact.
  *
  * Input is the hash itself (produce it with [[KmvSketch.hash64]]) so
  * the hash stays codegen'd in the projection and the aggregate's
  * per-row work is one comparison against the current kth-smallest.
  */
case class KmvDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 2, s"graft_kmv requires k >= 2, got $k")

  override def children: Seq[Expression] = Seq(child)
  // AbstractDataType (ExpectsInputTypes) is private[sql] in Spark 4 —
  // validate the input type directly instead
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kmv requires a BIGINT hash input (see KmvSketch.hash64), " +
        s"got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    // keep the k smallest distinct values: skip anything >= the current
    // kth once the buffer is full (the common case — O(1) via last())
    if (buf.size() < k) { buf.add(h); () }
    else if (h < buf.last() && buf.add(h)) { buf.pollLast(); () }
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  /** Exact when the buffer never filled (every distinct hash is still
    * present); otherwise the KMV estimator. The arithmetic — int·2^60
    * as an exact double product, one division, floor — is replayed
    * verbatim by the DuckDB oracle, so results are bit-identical.
    */
  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size() < k) buf.size().toLong
    else math.floor((k - 1).toDouble * KmvSketch.TwoPow60 / buf.last().toDouble).toLong

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size())
    bb.putInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** The sketch CONTENTS instead of the estimate: the k smallest distinct
  * hashes as a sorted ARRAY<BIGINT>. This is what makes KMV a set
  * ALGEBRA, not just a counter — union sketches merge by
  * sort-distinct-take-k on the arrays, intersection estimates follow by
  * inclusion–exclusion, all closed-form arithmetic a SQL oracle replays
  * bit-for-bit (`q65_kmv_setops`). Shares [[KmvDistinct]]'s buffer and
  * serialization.
  */
case class KmvHashes(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  private val inner = KmvDistinct(child, k)

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult = inner.checkInputDataTypes()
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv_hashes"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    inner.createAggregationBuffer()
  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] =
    inner.update(buf, input)
  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] =
    inner.merge(buf, other)
  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] =
    inner.serialize(buf)
  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] =
    inner.deserialize(bytes)

  /** Ascending k-min hashes (TreeSet iteration order). */
  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Any](buf.size())
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvHashes =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvHashes =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object KmvSketch {

  /** 2^60 — exactly representable as a double, like every product
    * (k−1)·2^60 for k ≤ 2^44, so the estimator's arithmetic carries no
    * engine-dependent rounding.
    */
  val TwoPow60: Double = 1152921504606846976.0d

  /** The engine-portable 60-bit uniform hash (15 hex chars of md5 —
    * always positive, never saturates a BIGINT). DuckDB replay:
    * `('0x' || substr(md5(x), 1, 15))::BIGINT`.
    *
    * Float caveat: the string cast renders `-0.0` and `0.0` distinctly,
    * while exact COUNT(DISTINCT) treats them as one value — callers
    * hashing FLOAT/DOUBLE columns where negative zero can occur should
    * normalize first (`when(c === 0.0, lit(0.0)).otherwise(c)`);
    * [[ApproxDistinctRewrite]] does this automatically with the
    * engine's own float normalizer.
    */
  def hash64(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Aggregate Column: KMV distinct estimate over a pre-hashed LONG
    * column (see [[hash64]]).
    */
  def kmv(hashed: Column, k: Int = 256): Column =
    Bridge.column(KmvDistinct(Bridge.expression(hashed), k).toAggregateExpression())

  /** Convenience: hash + sketch in one call for any input column. */
  def kmvDistinct(c: Column, k: Int = 256): Column = kmv(hash64(c), k)

  /** Aggregate Column: the sorted k-min hash ARRAY itself (set-algebra
    * form — see [[KmvHashes]]).
    */
  def kmvHashes(hashed: Column, k: Int = 256): Column =
    Bridge.column(KmvHashes(Bridge.expression(hashed), k).toAggregateExpression())
}
