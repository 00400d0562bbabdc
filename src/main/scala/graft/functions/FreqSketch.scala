package graft.functions

import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters summary (Metwally, Agrawal & El Abbadi,
  * "Efficient computation of frequent and top-k elements in data
  * streams", ICDT 2005) as a native [[TypedImperativeAggregate]] — the
  * frequency sibling of [[KmvDistinct]]: each partition keeps at most
  * `k` counters (a few KB), partials merge associatively map-side, and
  * the result is a bounded-error summary with the two guarantees the
  * sketch-guided pipelines below rely on:
  *
  *   1. OVERESTIMATE: `est(x) >= true(x)` for every item, so filtering
  *      candidates by `est > T` can never drop a true heavy hitter;
  *   2. BOUNDED ERROR: `est(x) - true(x) <= err(x) <= N/k` (summed
  *      across merged partials — the mergeable-summaries bound of
  *      Agarwal et al., PODS 2012), so any item with
  *      `true(x) > N/k` is guaranteed present in the summary.
  *
  * Together: a summary of size k finds every item above frequency N/k
  * in ONE pass with NO per-item state beyond the k counters — the
  * 100 TB alternative to a full `groupBy` over an unbounded key domain.
  * The intended pattern is sketch-guided exact verification: the
  * summary nominates ≤ k candidates, an exact recount over just those
  * (a broadcast semi-join, not a full-domain aggregate) makes the final
  * answer exact (`t17_heavy_hitters`).
  *
  * Buffer ops are O(log k) per row (hash map + an ordered (est, item)
  * index for the eviction minimum); ties break on (est, item) so every
  * step is deterministic.
  */
case class SpaceSavingTopK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqSketch.SSBuffer] {

  require(k >= 1, s"graft_spacesaving requires k >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_spacesaving requires a STRING input, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_spacesaving"

  override def createAggregationBuffer(): FreqSketch.SSBuffer =
    new FreqSketch.SSBuffer(k)

  override def update(
      buf: FreqSketch.SSBuffer, input: InternalRow): FreqSketch.SSBuffer = {
    val v = child.eval(input)
    if (v != null) buf.insertOne(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(
      buf: FreqSketch.SSBuffer,
      other: FreqSketch.SSBuffer): FreqSketch.SSBuffer = buf.mergeWith(other)

  /** Summary rows sorted (est desc, item asc) — fully deterministic. */
  override def eval(buf: FreqSketch.SSBuffer): Any = {
    val rows = buf.sortedEntries.map { case (item, est, err) =>
      new GenericInternalRow(
        Array[Any](UTF8String.fromString(item), est, err))
    }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: FreqSketch.SSBuffer): Array[Byte] = {
    val entries = buf.sortedEntries
    val payloads = entries.map { case (item, est, err) =>
      (item.getBytes(StandardCharsets.UTF_8), est, err)
    }
    val bb = java.nio.ByteBuffer.allocate(
      4 + payloads.map(p => 4 + p._1.length + 16).sum)
    bb.putInt(payloads.size)
    payloads.foreach { case (bytes, est, err) =>
      bb.putInt(bytes.length); bb.put(bytes); bb.putLong(est); bb.putLong(err)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): FreqSketch.SSBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf.upsert(new String(arr, StandardCharsets.UTF_8),
        bb.getLong(), bb.getLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object FreqSketch {

  /** k-counter SpaceSaving buffer: item → (est, err) plus an ordered
    * (est, item) index so the eviction minimum is O(log k).
    */
  final class SSBuffer(val k: Int) {
    private val counts = mutable.HashMap.empty[String, (Long, Long)]
    private val order = mutable.TreeSet.empty[(Long, String)]

    def size: Int = counts.size

    /** Smallest estimate in a FULL buffer — the upper bound on the true
      * count of anything NOT in the summary (0 while there is room:
      * absent then means truly unseen).
      */
    def minEst: Long = if (counts.size < k) 0L else order.head._1

    /** Add `est`/`err` mass to an item, inserting it if absent. */
    def upsert(item: String, est: Long, err: Long): Unit = {
      counts.get(item) match {
        case Some((e0, r0)) =>
          order.remove((e0, item))
          counts.update(item, (e0 + est, r0 + err))
          order.add((e0 + est, item))
        case None =>
          counts.update(item, (est, err))
          order.add((est, item))
      }
    }

    /** One observed occurrence — the SpaceSaving step: bump if present,
      * claim a free counter if there is room, otherwise take over the
      * minimum counter (est = min+1, err = min: the overestimate that
      * makes guarantee 1 hold).
      */
    def insertOne(item: String): Unit = {
      if (counts.contains(item) || counts.size < k) upsert(item, 1L, 0L)
      else {
        val (mEst, mItem) = order.head
        order.remove((mEst, mItem))
        counts.remove(mItem)
        counts.update(item, (mEst + 1L, mEst))
        order.add((mEst + 1L, item))
      }
    }

    /** Mergeable-summaries combine: absent items take the other side's
      * minEst as their (over)estimate AND error contribution, then the
      * union is cut back to the k largest (est desc, item asc). Errors
      * add, so the N/k bound holds across any merge tree.
      */
    def mergeWith(other: SSBuffer): SSBuffer = {
      if (other.size == 0) return this
      val mSelf = minEst
      val mOther = other.minEst
      val union = mutable.HashMap.empty[String, (Long, Long)]
      counts.foreach { case (item, (e, r)) =>
        val (oe, or) = other.counts.getOrElse(item, (mOther, mOther))
        union.update(item, (e + oe, r + or))
      }
      other.counts.foreach { case (item, (oe, or)) =>
        if (!counts.contains(item))
          union.update(item, (mSelf + oe, mSelf + or))
      }
      val kept = union.toSeq
        .sortBy { case (item, (e, _)) => (-e, item) }
        .take(k)
      counts.clear(); order.clear()
      kept.foreach { case (item, (e, r)) =>
        counts.update(item, (e, r)); order.add((e, item))
      }
      this
    }

    /** (item, est, err) sorted (est desc, item asc). */
    def sortedEntries: Seq[(String, Long, Long)] =
      counts.toSeq.map { case (item, (e, r)) => (item, e, r) }
        .sortBy { case (item, e, _) => (-e, item) }
  }

  /** Aggregate Column: SpaceSaving summary of a STRING column —
    * ARRAY<STRUCT<item, est, err>> sorted by descending estimate.
    */
  def spaceSavingTopK(c: Column, k: Int): Column =
    Bridge.column(
      SpaceSavingTopK(Bridge.expression(c), k).toAggregateExpression())
}
