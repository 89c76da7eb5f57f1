package org.apache.spark.sql.graft

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException, File, FileInputStream, FileOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.TaskContext
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
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
    rankAttr: Attribute = AttributeReference("rk", LongType, nullable = false)(),
    localOnly: Boolean = false)
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
      TopKPerKeyExec(n.keys, n.order, n.k, n.rankAttr, planLater(n.child),
        n.localOnly) :: Nil
    case _ => Nil
  }
}

/** One-pass per-partition top-k with a disk spill path.
  *
  * The fast path buffers a worst-first heap of ≤k rows per key. That is
  * (#keys × k) rows of memory — fine for "top products per region", an OOM
  * for "top events per user" at 10⁹ users, where the Window spelling's sort
  * would have spilled. So the heap map tracks its approximate byte size;
  * past `spark.graft.topk.spillThreshold` (default 64 MB per task) it is
  * flushed to a spill file SORTED BY KEY BYTES and rebuilt empty. Each
  * spill run holds ≤k rows per key with unique keys in byte order, so the
  * final answer is a k-way merge over runs: rows of equal keys are
  * combined (≤k × #runs candidates) and re-selected to top-k. Peak memory
  * is max(threshold, #runs × k rows) — bounded regardless of key count.
  *
  * Key grouping across runs relies on UnsafeProjection determinism: equal
  * key values from the same projection produce identical bytes, so
  * byte-lexicographic order groups them adjacently (the same property that
  * lets UnsafeRow keys drive Spark's own hash maps).
  */
case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    rankAttr: Attribute, child: SparkPlan,
    localOnly: Boolean = false) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  // Three distribution modes: per-key (hash shuffle on the keys, same as
  // the Window spelling), localOnly (no requirement — per-partition partial
  // top-k, stage 1 of a global ranking), and keyless-global (AllTuples —
  // the ≤ k×partitions surviving rows of a local pass merge on ONE task).
  override def requiredChildDistribution: Seq[Distribution] =
    (if (localOnly) UnspecifiedDistribution
     else if (keys.isEmpty) AllTuples
     else ClusteredDistribution(keys)) :: Nil
  // rows only shrink per key group; the child's partitioning survives
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "spillCount" -> SQLMetrics.createMetric(sparkContext, "number of heap spills"),
    "spillBytes" -> SQLMetrics.createSizeMetric(sparkContext, "spilled bytes"))

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val kLocal = k
    val threshold = conf.getConfString(
      "spark.graft.topk.spillThreshold", (64L << 20).toString).toLong
    val spillCount = longMetric("spillCount")
    val spillBytes = longMetric("spillBytes")
    child.execute().mapPartitionsInternal { iter =>
      val keyProj = UnsafeProjection.create(keys, childOutput)
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      val ord = GenerateOrdering.generate(order, childOutput)
      // worst-first (reversed) heap per key: head is the row to evict
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      var buffered = 0L
      val spills = ArrayBuffer.empty[File]
      Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] { _ =>
        spills.foreach(_.delete())
      })

      def spillHeaps(): Unit = {
        val file = TopKPerKeyExec.newSpillFile()
        val out = new DataOutputStream(
          new BufferedOutputStream(new FileOutputStream(file), 1 << 16))
        try {
          val entries = new ArrayBuffer[(Array[Byte], java.util.PriorityQueue[UnsafeRow])](heaps.size())
          heaps.forEach((key: UnsafeRow, pq: java.util.PriorityQueue[UnsafeRow]) =>
            entries += key.getBytes -> pq)
          val sorted = entries.sortWith((a, b) =>
            java.util.Arrays.compareUnsigned(a._1, b._1) < 0)
          for ((keyB, pq) <- sorted) {
            out.writeInt(keyB.length)
            out.write(keyB)
            out.writeInt(pq.size())
            val it = pq.iterator()
            while (it.hasNext) {
              val bytes = it.next().getBytes
              out.writeInt(bytes.length)
              out.write(bytes)
            }
          }
        } finally out.close()
        spills += file
        spillCount += 1
        spillBytes += file.length()
        heaps.clear()
        buffered = 0L
      }

      while (iter.hasNext) {
        val raw = iter.next()
        val row = toUnsafe(raw)
        val key = keyProj(raw)
        var pq = heaps.get(key)
        if (pq == null) {
          pq = new java.util.PriorityQueue[UnsafeRow](kLocal + 1, ord.reverse)
          val keyCopy = key.copy()
          heaps.put(keyCopy, pq)
          buffered += keyCopy.getSizeInBytes + 48 // map-entry overhead estimate
        }
        if (pq.size() < kLocal) {
          val c = row.copy()
          pq.add(c)
          buffered += c.getSizeInBytes + 16
        } else if (ord.compare(row, pq.peek()) < 0) {
          val evicted = pq.poll()
          buffered -= evicted.getSizeInBytes + 16
          val c = row.copy()
          pq.add(c)
          buffered += c.getSizeInBytes + 16
        }
        if (buffered > threshold) spillHeaps()
      }

      val outProj = UnsafeProjection.create(output, output)
      val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow

      def ranked(groups: Iterator[Array[InternalRow]]): Iterator[InternalRow] =
        new Iterator[InternalRow] {
          private var current: Array[InternalRow] = Array.empty
          private var i = 0
          override def hasNext: Boolean = {
            while (i >= current.length && groups.hasNext) {
              current = groups.next()
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

      if (spills.isEmpty) {
        // fast path: everything fit — emit each heap sorted best-first
        val it = heaps.values().iterator()
        ranked(new Iterator[Array[InternalRow]] {
          override def hasNext: Boolean = it.hasNext
          override def next(): Array[InternalRow] = {
            val arr: Array[InternalRow] =
              it.next().toArray(Array.empty[UnsafeRow]).toArray[InternalRow]
            java.util.Arrays.sort(arr, ord)
            arr
          }
        })
      } else {
        // spill path: flush the live map too, then k-way merge the sorted
        // runs; rows for one key are adjacent within a run and runs are
        // key-ordered, so each key group is assembled from ≤k rows per run
        if (!heaps.isEmpty) spillHeaps()
        val readers = spills.map(f =>
          new TopKPerKeyExec.SpillReader(f, childOutput.length)).filter(_.key != null)
        val merge = new java.util.PriorityQueue[TopKPerKeyExec.SpillReader](
          math.max(readers.size, 1),
          (a: TopKPerKeyExec.SpillReader, b: TopKPerKeyExec.SpillReader) =>
            java.util.Arrays.compareUnsigned(a.key, b.key))
        readers.foreach(merge.add)
        ranked(new Iterator[Array[InternalRow]] {
          override def hasNext: Boolean = !merge.isEmpty
          override def next(): Array[InternalRow] = {
            val first = merge.poll()
            val keyB = first.key
            val cands = ArrayBuffer.empty[InternalRow]
            cands ++= first.rows
            first.advance()
            if (first.key != null) merge.add(first)
            while (!merge.isEmpty &&
                java.util.Arrays.equals(merge.peek().key, keyB)) {
              val r = merge.poll()
              cands ++= r.rows
              r.advance()
              if (r.key != null) merge.add(r)
            }
            val arr = cands.toArray
            java.util.Arrays.sort(arr, ord)
            if (arr.length <= kLocal) arr else arr.take(kLocal)
          }
        })
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKeyExec {

  /** Spill files live in Spark's local dirs (same disks as shuffle spill)
    * when an executor context exists, java.io.tmpdir otherwise.
    */
  private[graft] def newSpillFile(): File =
    Option(org.apache.spark.SparkEnv.get) match {
      case Some(env) => env.blockManager.diskBlockManager.createTempLocalBlock()._2
      case None => File.createTempFile("graft-topk-", ".spill")
    }

  /** Streams one sorted spill run: (key bytes, ≤k rows) records in
    * byte-lexicographic key order. `key == null` marks exhaustion.
    */
  private[graft] final class SpillReader(file: File, numFields: Int) {
    private val in = new DataInputStream(
      new BufferedInputStream(new FileInputStream(file), 1 << 16))
    var key: Array[Byte] = _
    var rows: Array[UnsafeRow] = _
    advance()

    def advance(): Unit = {
      val keyLen = try in.readInt() catch { case _: EOFException => -1 }
      if (keyLen < 0) {
        key = null
        rows = null
        in.close()
      } else {
        key = new Array[Byte](keyLen)
        in.readFully(key)
        rows = Array.fill(in.readInt()) {
          val len = in.readInt()
          val bytes = new Array[Byte](len)
          in.readFully(bytes)
          val row = new UnsafeRow(numFields)
          row.pointTo(bytes, len)
          row
        }
      }
    }
  }
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

  /** Opt-in: also rewrite the declarative `row_number() <= k` window
    * spelling into the bounded-heap node (see [[TopKRewriteRule]]).
    */
  def registerRewrite(session: org.apache.spark.sql.SparkSession): Unit = {
    registerStrategy(session)
    val exp = session.experimental
    if (!exp.extraOptimizations.contains(TopKRewriteRule))
      exp.extraOptimizations = TopKRewriteRule +: exp.extraOptimizations
  }

  /** Remove the rewrite (the strategy stays; it is inert without nodes). */
  def unregisterRewrite(session: org.apache.spark.sql.SparkSession): Unit = {
    val exp = session.experimental
    exp.extraOptimizations = exp.extraOptimizations.filterNot(_ == TopKRewriteRule)
  }

  /** Hook for `spark.sql.extensions` wiring (see graft.functions.GraftExtensions):
    * the planner strategy plus the window-spelling rewrite rule — sessions
    * built with the extension get the bounded-heap plan for the standard
    * `row_number() <= k` pattern automatically.
    */
  def inject(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => TopKStrategy)
    ext.injectOptimizerRule(_ => TopKRewriteRule)
  }

  /** Test hook: the optimizer rules an extensions object would install
    * (buildOptimizerRules is private[sql], reachable from this package).
    */
  def injectedOptimizerRules(ext: SparkSessionExtensions,
      session: org.apache.spark.sql.SparkSession): Seq[Any] =
    ext.buildOptimizerRules(session.asInstanceOf[ClassicSession])

  def apply(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int,
      localOnly: Boolean = false): DataFrame = {
    val session = df.sparkSession.asInstanceOf[ClassicSession]
    registerStrategy(session)
    val orderExprs = order.map(c =>
      ColumnBridge.catalystExpression(session, c) match {
        case so: SortOrder => so
        case e             => SortOrder(e, Ascending)
      })
    Dataset.ofRows(session,
      TopKPerKeyNode(keys.map(ColumnBridge.catalystExpression(session, _)),
        orderExprs, k, df.queryExecution.analyzed, localOnly = localOnly))
  }

  /** Global (keyless) top-k as two chained execs: a per-partition partial
    * pass with no distribution requirement (each task keeps its own ≤k
    * heap), then an AllTuples merge of the ≤ k×partitions survivors that
    * assigns the final ranks on one task. The exchange moves k×partitions
    * rows, never the input — the same bounded-heap shape as Spark's
    * TakeOrderedAndProject, but available mid-pipeline as a DataFrame (and
    * with the exec's spill path for large k).
    */
  def global(df: DataFrame, order: Seq[Column], k: Int): DataFrame = {
    val local = apply(df, Seq.empty, order, k, localOnly = true)
      .drop("rk") // partial ranks are per-partition; the merge re-ranks
    apply(local, Seq.empty, order, k)
  }
}
