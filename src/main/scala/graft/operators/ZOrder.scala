package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) multi-column clustering — the general form of the
  * geohash sort (K5): interleaving the bits of several dimensions gives a
  * single sort key under which rows close in ANY dimension land close in
  * the written order, so parquet row-group min/max stats stay tight on
  * EVERY interleaved column at once and a selective filter on any one of
  * them skips most of the file. Sorting on (a, b) instead would keep `a`
  * pruning perfect and make `b` pruning useless.
  *
  * The key is a literal expression tree of shifts/masks (codegen'd,
  * no UDF): bit i of dimension d lands at position i × dims + d. Inputs
  * must be non-negative and fit in `bits` bits (clamped here); map raw
  * values to bounded ranks/buckets first (e.g. `ts` → minutes since the
  * data's epoch) the way any Z-order implementation requires.
  *
  * NORMALIZE WIDTHS: every dimension must occupy the SAME `bits` — the
  * curve alternates bits strictly by position, so interleaving a 16-bit
  * key with an 8-bit key leaves the wide key's high bits on top and the
  * sort degenerates to single-column order (no skipping on the narrow
  * one). Scale narrow dimensions up (`col * (1 << gap)`) or rank both
  * into the same bucket count.
  */
object ZOrder {

  /** Morton-interleave `cols` (LONG, non-negative) at `bits` bits each.
    * 2 dims × 31 bits or 3 dims × 20 bits stay inside a positive LONG.
    */
  def interleave(cols: Seq[Column], bits: Int = 21): Column = {
    require(cols.nonEmpty, "at least one column")
    require(cols.size * bits <= 62, s"${cols.size} dims × $bits bits overflow a LONG")
    val dims = cols.size
    val clamped = cols.map(c => least(greatest(c, lit(0L)), lit((1L << bits) - 1)))
    val terms = for {
      (c, d) <- clamped.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * dims + d)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Rewrite `df` clustered by the Z-order of `dimCols` (each already a
    * bounded non-negative LONG expression): range-partition + sort by the
    * interleaved key so every output file covers a compact hyper-rectangle.
    */
  def cluster(df: DataFrame, dimCols: Seq[Column], bits: Int = 21,
      partitions: Int = 0): DataFrame = {
    val n = if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val z = interleave(dimCols, bits)
    df.withColumn("__z", z)
      .repartitionByRange(n, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
