package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.Bridge

/** Whole-operator extension demo — the (c) rung of the engine-extension
  * ladder (custom expressions, aggregates, and optimizer rules being
  * the others): a custom LogicalPlan node, a SparkStrategy, and a
  * physical SparkPlan for per-key top-k with MAP-SIDE pruning.
  *
  * Why the built-ins can't express it: the rank-window formulation
  * (`row_number().over(partitionBy(key).orderBy(ord)) <= k`) shuffles
  * EVERY row to the key's reducer and sorts the full key group before
  * discarding all but k. This operator runs a bounded per-key heap on
  * the map side first — each input partition forwards at most k rows
  * per key — so the exchange carries O(partitions × keys × k) rows
  * instead of the whole table, and no full per-key sort ever happens.
  * The same shape as Spark's global `TakeOrderedAndProject`, per key.
  * (`Scale.topNPerKey` approximates this compositionally with an extra
  * shuffle; here it is one exchange, zero extra passes.)
  *
  * `order` must be a TOTAL order (add unique tie-break columns) for
  * deterministic results — same contract as every rank window in this
  * repo. Output row order within a key is unspecified, like any
  * aggregate.
  */
case class TopKPerKeyPlan(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k >= 1, s"top-k requires k >= 1, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

/** Physical per-key top-k: bounded heap per key within each partition.
  * Runs twice — a partial pass before the exchange (any distribution)
  * and a final pass that requires clustering on the keys, so
  * `EnsureRequirements` inserts exactly one hash exchange between them.
  */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan,
    partial: Boolean) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil
  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKeyFinal"

  override protected def doExecute(): RDD[InternalRow] = {
    val (keyExprs, ordExprs, childOutput, limit) = (keys, order, child.output, k)
    // Memory bound: the heap map grows with the distinct keys seen in a
    // partition — unbounded for hyper-cardinality keys. The PARTIAL
    // pass flushes its map whenever it reaches maxPartialKeys: flushed
    // rows are a superset of the per-key top-k (the final pass enforces
    // the exact k), so correctness is unaffected and pruning merely
    // degrades toward a plain exchange as key cardinality explodes.
    // The FINAL pass never flushes (it must see every row of its key
    // group); its residency is keys-per-reducer × k rows — the same
    // order as a hash aggregate over the same grouping.
    val maxKeys =
      if (partial)
        conf.getConfString("spark.graft.topk.maxPartialKeys", "65536").toInt
      else Int.MaxValue
    child.execute().mapPartitions { rows =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // copy rows out of the iterator's reused buffer before buffering
      val rowCopy = UnsafeProjection.create(childOutput, childOutput)
      val ordering = GenerateOrdering.generate(ordExprs, childOutput)
      // max-heap per key under the total order: head is the WORST kept
      // row; a new row replaces it only if strictly better
      val heaps = new java.util.HashMap[UnsafeRow, scala.collection.mutable.PriorityQueue[UnsafeRow]]()
      def insert(row: InternalRow): Unit = {
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue.empty[UnsafeRow](
            ordering.on((r: UnsafeRow) => r: InternalRow))
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) heap.enqueue(rowCopy(row).copy())
        else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(rowCopy(row).copy())
        }
      }
      def drain(): Iterator[UnsafeRow] = {
        import scala.jdk.CollectionConverters._
        val kept = heaps.values().asScala.toVector
        heaps.clear()
        kept.iterator.flatMap(_.iterator)
      }
      new Iterator[InternalRow] {
        private var out: Iterator[UnsafeRow] = Iterator.empty
        override def hasNext: Boolean = {
          while (!out.hasNext && rows.hasNext) {
            insert(rows.next())
            if (heaps.size() >= maxKeys) out = drain()
          }
          if (!out.hasNext && !heaps.isEmpty) out = drain()
          out.hasNext
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("empty iterator")
          out.next()
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Plans [[TopKPerKeyPlan]] as partial → (exchange) → final. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, child) =>
      val partial = TopKPerKeyExec(keys, order, k, planLater(child), partial = true)
      TopKPerKeyExec(keys, order, k, partial, partial = false) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {

  /** Top `k` rows per `keys` group under the total order `orderBy`,
    * via the custom operator. Registers [[TopKPerKeyStrategy]] with the
    * session's experimental strategies (idempotent).
    */
  def apply(df: DataFrame, keyCols: Seq[String], orderBy: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    // Route the order through a throwaway Dataset-API sort and take the
    // analyzed Sort node's SortOrders: that is the official Column →
    // catalyst conversion path, so no internal (non-serializable,
    // unresolved) column nodes survive into the custom plan.
    val sortPlan = Bridge.logicalPlan(df.sortWithinPartitions(orderBy: _*))
    val (order, child) = sortPlan match {
      case s: org.apache.spark.sql.catalyst.plans.logical.Sort => (s.order, s.child)
      case other => sys.error(s"expected a Sort node, got ${other.nodeName}")
    }
    val keyExprs: Seq[Expression] = keyCols.map { n =>
      child.output.find(_.name == n).getOrElse(
        sys.error(s"key column '$n' not in ${child.output.map(_.name)}"))
    }
    Bridge.ofRows(spark, TopKPerKeyPlan(keyExprs, order, k, child))
  }
}
