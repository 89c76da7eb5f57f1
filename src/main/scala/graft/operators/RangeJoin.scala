package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval-containment) join: points ⋈ intervals where
  * `start <= point <= end`, with no equi-key. Spark plans a raw inequality
  * join as BroadcastNestedLoopJoin — O(|points|·|intervals|) comparisons —
  * which is exactly what dies first at scale.
  *
  * Bucketize instead: a point lands in the single bucket `point DIV width`;
  * an interval is replicated to every bucket it overlaps
  * (`sequence(start DIV width, end DIV width)`). An equi shuffle join on the
  * bucket id then meets each qualifying (point, interval) pair exactly once
  * — a point lives in one bucket, so no dedup pass is needed — and the
  * residual containment predicate filters within the bucket.
  *
  * Cost at 100 TB: one hash shuffle of points (each once) and of intervals
  * (× their bucket span), candidate space bounded by interval density per
  * bucket instead of |points|·|intervals|. Pick `bucketWidth` near the
  * typical interval length: ~1 replica per interval while keeping buckets
  * selective. A hot bucket (many long intervals) is ordinary join skew —
  * AQE's skew-join split applies because this IS a plain equi join.
  */
object RangeJoin {

  /** Inner join of `points` to `intervals` on containment
    * (`startCol <= pointCol <= endCol`, inclusive). Column values must be
    * integral (epoch µs, ids, …); all columns of both inputs survive.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("__bucket", expr(s"$pointCol DIV $bucketWidth"))
    val i = intervals.withColumn("__bucket",
      explode(sequence(expr(s"$startCol DIV $bucketWidth"),
        expr(s"$endCol DIV $bucketWidth"))))
    p.join(i, Seq("__bucket"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bucket")
  }

  /** Inner join of two interval sets on overlap (inclusive bounds:
    * `lStart <= rEnd && rStart <= lEnd`). Both sides replicate to every
    * bucket they span, which would meet a qualifying pair once per SHARED
    * bucket — so the residual keeps a pair only in its canonical bucket,
    * the one containing `greatest(lStart, rStart)` (the overlap's start,
    * which lies inside both intervals whenever they overlap). Exactly-once
    * semantics without a distinct pass; the join stays a plain equi join
    * on the bucket id, so AQE's skew split still applies to hot buckets.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val l = left.withColumn("__bucket",
      explode(sequence(expr(s"$lStart DIV $bucketWidth"),
        expr(s"$lEnd DIV $bucketWidth"))))
    val r = right.withColumn("__bucket",
      explode(sequence(expr(s"$rStart DIV $bucketWidth"),
        expr(s"$rEnd DIV $bucketWidth"))))
    l.join(r, Seq("__bucket"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(expr(s"greatest($lStart, $rStart) DIV $bucketWidth") ===
        col("__bucket"))
      .drop("__bucket")
  }
}
