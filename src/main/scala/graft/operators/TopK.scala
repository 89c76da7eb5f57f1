package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

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
}
