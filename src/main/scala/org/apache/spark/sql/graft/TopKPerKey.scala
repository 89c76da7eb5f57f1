package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** Top-k rows per key as a first-class operator: logical node + planner
  * strategy + physical exec, registered through the public extension points
  * (`experimental.extraStrategies` / `SparkSessionExtensions`).
  *
  * The declarative spelling — `row_number() OVER (PARTITION BY key ORDER BY
  * ord) <= k` — plans as Exchange + FULL SORT of every partition + Window +
  * Filter: O(n log n) comparisons and a complete sorted copy of the input,
  * to keep k rows per key. This exec keeps a bounded worst-first heap of k
  * rows per key instead: one pass, O(n log k), memory bounded by
  * (#keys-in-partition × k) rows regardless of input size — the difference
  * between "sorts 100 TB" and "streams 100 TB" when k is small.
  *
  * The node still declares `ClusteredDistribution(keys)`, so the planner
  * inserts the same single hash shuffle the window variant needs; only the
  * per-partition algorithm changes.
  */
case class TopKPerKeyNode(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: LogicalPlan,
    rankAttr: Attribute = AttributeReference("rk", LongType, nullable = false)())
  extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output :+ rankAttr
  // rankAttr is generated here, not consumed from the child
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: TopKPerKeyNode =>
      TopKPerKeyExec(n.keys, n.order, n.k, n.rankAttr, planLater(n.child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    rankAttr: Attribute, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil
  // rows only shrink per key group; the child's partitioning survives
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val kLocal = k
    child.execute().mapPartitionsInternal { iter =>
      val keyProj = UnsafeProjection.create(keys, childOutput)
      val ord = GenerateOrdering.generate(order, childOutput)
      // worst-first (reversed) heap per key: head is the row to evict
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var pq = heaps.get(key)
        if (pq == null) {
          pq = new java.util.PriorityQueue[InternalRow](kLocal + 1, ord.reverse)
          heaps.put(key.copy(), pq)
        }
        if (pq.size() < kLocal) pq.add(row.copy())
        else if (ord.compare(row, pq.peek()) < 0) {
          pq.poll()
          pq.add(row.copy())
        }
      }
      val outProj = UnsafeProjection.create(output, output)
      val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
      val it = heaps.values().iterator()
      new Iterator[InternalRow] {
        private var current: Array[InternalRow] = Array.empty
        private var i = 0
        override def hasNext: Boolean = {
          while (i >= current.length && it.hasNext) {
            current = it.next().toArray(Array.empty[InternalRow]).sorted(ord)
            i = 0
          }
          i < current.length
        }
        override def next(): InternalRow = {
          val row = current(i)
          rankRow.setLong(0, i + 1L)
          i += 1
          outProj(joined(row, rankRow))
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Public entry: `TopKPerKey(df, keys, order, k)` appends a `rk` rank column
  * (1-based within each key, following `order`) and keeps rows with
  * `rk <= k`. Ensures the strategy is registered on the session.
  */
object TopKPerKey {

  def registerStrategy(session: org.apache.spark.sql.SparkSession): Unit = {
    val exp = session.experimental
    if (!exp.extraStrategies.contains(TopKStrategy))
      exp.extraStrategies = TopKStrategy +: exp.extraStrategies
  }

  /** Hook for `spark.sql.extensions` wiring (see graft.functions.GraftExtensions). */
  def inject(ext: SparkSessionExtensions): Unit =
    ext.injectPlannerStrategy(_ => TopKStrategy)

  def apply(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    val session = df.sparkSession.asInstanceOf[ClassicSession]
    registerStrategy(session)
    val orderExprs = order.map(c =>
      ColumnBridge.catalystExpression(session, c) match {
        case so: SortOrder => so
        case e             => SortOrder(e, Ascending)
      })
    Dataset.ofRows(session,
      TopKPerKeyNode(keys.map(ColumnBridge.catalystExpression(session, _)),
        orderExprs, k, df.queryExecution.analyzed))
  }
}
