package graft.plans

import java.util.{Comparator, PriorityQueue}

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** TopKPerKey: keep the `k` rows with the smallest `order` value per
  * key (negate/struct-pack the order expression for descending or
  * tie-broken variants).
  *
  * The window formulation (`row_number over partitionBy(key) orderBy o
  * <= k`) shuffles and fully sorts EVERY row of every key. This
  * operator runs two bounded-heap passes instead — a partial pass on
  * each input partition caps the shuffle at k rows per (partition,
  * key), and the final pass after the key shuffle is exact because all
  * survivors of a key are co-located. No full sort anywhere; memory is
  * O(distinct-keys-per-partition × k) rows, the same contract as a
  * partial aggregation.
  *
  * Like row_number, rows tying at the k boundary are kept
  * arbitrarily — include a tiebreaker in `order` for determinism.
  *
  * NULL contract: rows whose `order` expression evaluates to NULL are
  * DROPPED, not ranked (unlike a row_number window, which would order
  * them first/last but keep them). Callers that must retain NULL-order
  * rows should coalesce the order expression to a sentinel first.
  */
case class TopKPerKey(k: Int, keys: Seq[Expression], order: Expression, child: LogicalPlan)
    extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

abstract class TopKExecBase extends UnaryExecNode {
  def k: Int
  def keys: Seq[Expression]
  def order: Expression

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  protected def topKPartition(iter: Iterator[InternalRow]): Iterator[InternalRow] = {
    val boundKeys = keys.map(BindReferences.bindReference(_, child.output))
    val keyProj = UnsafeProjection.create(boundKeys)
    val boundOrder = BindReferences.bindReference(order, child.output)
    val ordering = TypeUtils.getInterpretedOrdering(order.dataType)

    // per key: max-heap of the kept rows keyed by order value, so the
    // current worst is O(1) to inspect/replace
    final case class Entry(value: Any, row: InternalRow)
    val cmp = new Comparator[Entry] {
      override def compare(a: Entry, b: Entry): Int = ordering.compare(b.value, a.value)
    }
    val heaps = new mutable.HashMap[InternalRow, PriorityQueue[Entry]]
    while (iter.hasNext) {
      val row = iter.next()
      val key = keyProj(row).copy()
      val v0 = boundOrder.eval(row)
      if (v0 != null) {
        // struct/array order values are views into the reused row
        // buffer — copy them like the row itself
        val v = v0 match {
          case r: InternalRow => r.copy()
          case a: org.apache.spark.sql.catalyst.util.ArrayData => a.copy()
          case other => other
        }
        val heap = heaps.getOrElseUpdate(key, new PriorityQueue[Entry](k + 1, cmp))
        if (heap.size < k) heap.add(Entry(v, row.copy()))
        else if (ordering.compare(v, heap.peek().value) < 0) {
          heap.poll()
          heap.add(Entry(v, row.copy()))
        }
      }
    }
    import scala.jdk.CollectionConverters._
    heaps.valuesIterator.flatMap(h => h.iterator().asScala.map(_.row))
  }
}

/** Map-side partial: bounds shuffle volume at k rows per (partition, key). */
case class PartialTopKExec(k: Int, keys: Seq[Expression], order: Expression, child: SparkPlan)
    extends TopKExecBase {
  override def requiredChildDistribution: Seq[Distribution] = Seq(UnspecifiedDistribution)
  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions(topKPartition)
  override protected def withNewChildInternal(newChild: SparkPlan): PartialTopKExec =
    copy(child = newChild)
}

/** Final pass: exact because all of a key's survivors are co-located. */
case class FinalTopKExec(k: Int, keys: Seq[Expression], order: Expression, child: SparkPlan)
    extends TopKExecBase {
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(keys))
  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions(topKPartition)
  override protected def withNewChildInternal(newChild: SparkPlan): FinalTopKExec =
    copy(child = newChild)
}
