package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** graft-facing facade over the custom top-k-per-key physical operator
  * (org.apache.spark.sql.graft.TopKPerKey): appends a 1-based `rk` column
  * per key following `order` and keeps rows with rk <= k, executed as a
  * bounded per-key heap instead of Window's full partition sort.
  */
object TopK {
  def perKey(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int): DataFrame =
    org.apache.spark.sql.graft.TopKPerKey(df, keys, order, k)

  /** Global top-k: per-partition partial heaps, then an AllTuples merge of
    * the ≤ k×partitions survivors (the exchange never carries the input).
    */
  def global(df: DataFrame, order: Seq[Column], k: Int): DataFrame =
    org.apache.spark.sql.graft.TopKPerKey.global(df, order, k)

  /** `rank() <= k` semantics (competition rank — ALL rows tied on the
    * order values share a rank, so the kept set can exceed k). The heap
    * exec can't express this (its per-key memory bound is exactly what
    * ties break), so it gets the composed declarative spelling instead:
    * count rows per (key, order-value group), rank the GROUPS by a
    * partitioned cumulative count (state = distinct value groups per key,
    * not rows), keep groups whose strictly-better row count is < k, and
    * semi-join the input back on (key, value group). Two shuffles on the
    * keys — Catalyst reuses the partitioning — and the tie blow-up never
    * sits in one task's memory, which is why this beats a tie-aware heap
    * at scale. `order` pairs each value column with its ascending flag.
    */
  def perKeyRank(df: DataFrame, keys: Seq[String],
      order: Seq[(Column, Boolean)], k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    def withRval(d: DataFrame): DataFrame =
      d.withColumn("__rval", struct(order.zipWithIndex.map {
        case ((c, _), i) => c.as(s"_$i")
      }: _*))
    val sortCols = order.zipWithIndex.map { case ((_, asc), i) =>
      if (asc) col(s"__rval._$i").asc else col(s"__rval._$i").desc
    }
    val groups = withRval(df)
      .groupBy(keys.map(col) :+ col("__rval"): _*)
      .agg(count(lit(1)).as("__cnt"))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val qualifying = groups
      .withColumn("rk", coalesce(sum(col("__cnt")).over(w), lit(0L)) + 1L)
      .filter(col("rk") <= k)
      .select(keys.map(col) :+ col("__rval") :+ col("rk"): _*)
    withRval(df).join(qualifying, keys :+ "__rval").drop("__rval")
  }
}
