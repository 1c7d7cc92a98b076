package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types.LongType

/** Whole-operator top-k-per-key (SURVEY.md §3): Spark expresses this as
  * row_number() over a keyed window, which SORTS every key group in
  * full — O(n log n) per partition and a full sort buffer — to keep k
  * rows. This operator keeps a bounded k-row heap per key instead:
  * O(n log k), no partition-wide sort, memory bounded by
  * (#keys-in-partition × k) rows.
  *
  * Demonstrates the (c)-tier extension path: custom LogicalPlan +
  * SparkStrategy + SparkPlan, registered either at builder time via
  * [[GraftSparkExtensions]] or into a live session via
  * [[TopK.install]]. Semantics are identical to the window formulation
  * (including the appended rank column and deterministic tie-breaks via
  * the sort order), so it is gated by the same SQL oracle.
  */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                      rankAttr: Attribute, child: LogicalPlan) extends UnaryNode {
  // rankAttr is a constructor field (not a val) so plan copies during
  // analysis/optimization keep the same exprId — a fresh attribute per
  // copy orphans upstream references.
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKey =
    copy(child = c)
}

object TopKPerKey {
  def apply(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
            child: LogicalPlan): TopKPerKey =
    TopKPerKey(keys, order, k,
      AttributeReference("rnk", LongType, nullable = false)(), child)
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                          rankAttr: Attribute, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)

  /** Each key's rows must be co-located (one hash shuffle, same as the
    * window operator's requirement — but no sort requirement).
    */
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(keys))

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val kLocal = k
    val orderLocal = order
    val keysLocal = keys
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(keysLocal, childOutput)
      val rowOrd: Ordering[InternalRow] =
        org.apache.spark.sql.catalyst.expressions.RowOrdering
          .create(orderLocal, childOutput)
      val unsafeOrd: Ordering[UnsafeRow] = new Ordering[UnsafeRow] {
        override def compare(a: UnsafeRow, b: UnsafeRow): Int = rowOrd.compare(a, b)
      }
      // head of the queue = WORST kept row (greatest in sort order)
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      while (it.hasNext) {
        val row = it.next().asInstanceOf[UnsafeRow]
        val key = keyProj(row)
        val heap = heaps.getOrElseUpdate(key.copy(),
          mutable.PriorityQueue.empty[UnsafeRow](unsafeOrd))
        if (heap.size < kLocal) heap.enqueue(row.copy())
        else if (rowOrd.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      val outProj = UnsafeProjection.create(childOutput :+ rankAttr, childOutput :+ rankAttr)
      val joined = new JoinedRow
      val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      heaps.valuesIterator.flatMap { heap =>
        val rows: Array[UnsafeRow] = heap.dequeueAll.toArray.reverse
        rows.iterator.zipWithIndex.map { case (row, i) =>
          rankRow.setLong(0, i + 1L)
          outProj(joined(row, rankRow))
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case t: TopKPerKey =>
      TopKPerKeyExec(t.keys, t.order, t.k, t.rankAttr, planLater(t.child)) :: Nil
    case _ => Nil
  }
}

/** Builder-time registration: `.withExtensions(new GraftSparkExtensions)`. */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectPlannerStrategy(_ => TopKStrategy)
}

object TopK {
  /** Install the planner strategy into a live session (idempotent). */
  def install(spark: SparkSession): Unit = Shims.addStrategy(spark, TopKStrategy)

  /** Top-k rows per key by `order`, with a 1-based `rnk` column appended
    * — drop-in for row_number().over(Window.partitionBy(keys).orderBy
    * (order)) <= k, without the per-partition sort.
    */
  def perKey(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession
    install(spark)
    val sortOrder = order.map(Shims.toCatalyst(_) match {
      case s: SortOrder => s
      case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
    })
    Shims.ofRows(spark,
      TopKPerKey(keys.map(Shims.toCatalyst), sortOrder, k, Shims.logicalPlan(df)))
  }
}
