package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Scalable global running sum — the distributed two-phase prefix scan.
  *
  * Spark has no safe spelling of "cumulative sum over the WHOLE dataset":
  * `Window.orderBy(x)` without `partitionBy` moves every row into ONE
  * partition (Spark even warns), which is the definition of a plan that
  * does not survive a 100× scale-up. The textbook fix is two passes over
  * range-partitioned data:
  *
  *   1. range-partition + sort by the order column (the one shuffle);
  *   2. per-partition totals → driver (one long per partition — this is
  *      control-plane data, like IvfIndex's probed cell ids);
  *   3. exclusive-scan the totals on the driver, broadcast the per-
  *      partition base offsets;
  *   4. a second pass adds base + local running sum per row.
  *
  * Passes 2 and 4 are `mapPartitionsWithIndex` — the documented
  * last-resort case, used here because the logic is genuinely
  * per-partition-imperative (a sequential accumulator) and every
  * declarative alternative either collapses to one partition or pays an
  * extra full shuffle (`Window.partitionBy(pid)` re-exchanges all rows to
  * land each partition on one reducer).
  *
  * Both passes run over the SAME materialized RDD (one `df.rdd` lineage):
  * the range exchange's map stage executes once and pass 4 re-reads its
  * shuffle files via Spark's stage reuse, so the partitioning — whose
  * boundaries come from a nondeterministic sample — is pinned between
  * passes with no cache to manage (and nothing to leak).
  *
  * Cost: one range shuffle + two reduce-side scans; the driver holds
  * O(partitions) longs. Wide-row caveat: rows cross the Tungsten↔JVM
  * boundary in pass 4 — project down to the columns you need first when
  * the payload is wide.
  */
object PrefixSum {

  /** Append `outCol` = exclusive prefix sum of `valueCol` (a LONG) in
    * ascending `orderCol` order: the sum of all STRICTLY EARLIER rows'
    * values (0 for the global first row). Rows tied in `orderCol` get
    * distinct offsets in an arbitrary-but-fixed order — pass a unique key
    * (or make one) for reproducible output.
    */
  def exclusive(df: DataFrame, orderCol: String, valueCol: String,
      outCol: String, partitions: Int = 0): DataFrame =
    exclusive(df, Seq(col(orderCol)), valueCol, outCol, partitions)

  /** Multi-column (and direction-aware) ordering variant: pass e.g.
    * `Seq(col("merit").desc, col("doc_id"))` — ranges and the within-
    * partition sort follow the same sort orders.
    */
  def exclusive(df: DataFrame, orderCols: Seq[org.apache.spark.sql.Column],
      valueCol: String, outCol: String, partitions: Int): DataFrame = {
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val sorted = df
      .repartitionByRange(n, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    val rdd0 = sorted.rdd // one lineage shared by both passes

    // pass 1: per-partition totals (one long per partition to the driver)
    val totals = rdd0
      .mapPartitionsWithIndex { (pid, it) =>
        var s = 0L
        it.foreach(r => s += r.getLong(vIdx))
        Iterator((pid, s))
      }
      .collect().sortBy(_._1).map(_._2)

    // driver-side exclusive scan of the partition totals
    val base = new Array[Long](totals.length)
    var acc = 0L
    for (i <- totals.indices) { base(i) = acc; acc += totals(i) }
    val bcBase = spark.sparkContext.broadcast(base)

    // pass 2: base offset + local running sum (shuffle files reused)
    val outSchema = sorted.schema.add(outCol, LongType, nullable = false)
    val rows = rdd0.mapPartitionsWithIndex { (pid, it) =>
      var run = if (pid < bcBase.value.length) bcBase.value(pid) else 0L
      it.map { r =>
        val out = Row.fromSeq(r.toSeq :+ run)
        run += r.getLong(vIdx)
        out
      }
    }
    spark.createDataFrame(rows, outSchema)
  }
}
