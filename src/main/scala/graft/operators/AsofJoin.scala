package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the right row nearest in time
  * within the same key group — the point-in-time lookup every event
  * pipeline needs (DuckDB/Pandas expose it as ASOF JOIN / merge_asof;
  * Spark has no built-in). Three directions, matching merge_asof:
  * `Backward` (latest right with r.ts <= l.ts, the default), `Forward`
  * (earliest right with r.ts >= l.ts), `Nearest` (closer of the two,
  * ties to the backward match).
  *
  * Spark-first plan, not a range join: tag both sides, UNION them, and run
  * one `last(_, ignoreNulls) OVER (PARTITION BY keys ORDER BY ts ROWS
  * UNBOUNDED PRECEDING)` window — ascending for Backward, descending for
  * Forward, both windows over the same partitioning for Nearest (one
  * shuffle, two in-partition sorts). Cost is a single hash shuffle on the
  * keys plus per-partition sorts — the same shape as a groupBy — instead
  * of the O(|left|·|right|) candidate space a `l.ts >= r.ts` theta-join
  * explodes into. At 100 TB both inputs shuffle once on the key and
  * nothing else moves; a skewed key degrades to one fat sorted partition,
  * the usual salting/AQE-skew knobs apply.
  *
  * Tie semantics match DuckDB ASOF (inclusive comparison): a right row at
  * exactly the left timestamp wins in either direction, because right rows
  * sort before left rows at equal ts (side marker 0 < 1). Multiple right
  * rows sharing the winning timestamp resolve deterministically to the
  * largest payload struct (field-by-field comparison).
  */
object AsofJoin {

  sealed trait Direction
  case object Backward extends Direction
  case object Forward extends Direction
  /** Requires a numeric timestamp column (distances are subtracted). */
  case object Nearest extends Direction

  /** Left rows with `payload` columns from the as-of-matched right row
    * (null when no right row matches in the direction). `keys` must exist
    * on both sides; `ts` columns are compared raw (any orderable type —
    * numeric for Nearest). Right columns other than keys/ts/payload are
    * dropped; left columns all survive.
    */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      direction: Direction = Backward): DataFrame = {
    val keyCols = keys.map(col)
    // one struct carries the whole right payload through the window so a
    // single `last` resolves the match (not one window per column); it
    // leads with the right timestamp so Nearest can compare distances —
    // within an equal-ts group that field is constant, so ties still fall
    // through to the payload fields
    val taggedRight = right.select(
      keyCols :+ col(rightTs).as("__ts") :+ lit(0).as("__side") :+
        struct(col(rightTs).as("__rts") +: payload.map(col): _*).as("__asof"): _*)
    val leftCols = left.columns.filterNot(keys.contains).map(col)
    val taggedLeft = left.select(
      keyCols :+ col(leftTs).as("__ts") :+ lit(1).as("__side") :+
        lit(null).cast(taggedRight.schema("__asof").dataType).as("__asof") :+
        struct(leftCols: _*).as("__left"): _*)

    val unioned = taggedRight
      .withColumn("__left", lit(null).cast(taggedLeft.schema("__left").dataType))
      .unionByName(taggedLeft)

    // __asof as the final sort key makes equal-timestamp right rows resolve
    // deterministically (largest payload struct wins) instead of by
    // partition-internal order; descending ts turns "latest preceding"
    // into "earliest following" with identical inclusive-tie handling
    def pass(descending: Boolean): Column = {
      val ts = if (descending) col("__ts").desc else col("__ts").asc
      val w = Window.partitionBy(keyCols: _*)
        .orderBy(ts, col("__side"), col("__asof"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      last(col("__asof"), ignoreNulls = true).over(w)
    }

    val matched = direction match {
      case Backward => unioned.withColumn("__match", pass(descending = false))
      case Forward  => unioned.withColumn("__match", pass(descending = true))
      case Nearest  => unioned
        .withColumn("__b", pass(descending = false))
        .withColumn("__f", pass(descending = true))
        .withColumn("__match",
          when(col("__f").isNull, col("__b"))
            .when(col("__b").isNull, col("__f"))
            .when(col("__ts") - col("__b.__rts") <= col("__f.__rts") - col("__ts"),
              col("__b"))
            .otherwise(col("__f")))
    }

    val out = matched.filter(col("__side") === 1)
    val outLeft = left.columns.map(c =>
      if (keys.contains(c)) col(c) else col(s"__left.$c").as(c))
    val outRight = payload.map(p => col(s"__match.$p").as(p))
    out.select(outLeft ++ outRight: _*)
  }

  /** Convenience overload: same timestamp column name on both sides. */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
      ts: String, payload: Seq[String]): DataFrame =
    asof(left, right, keys, ts, ts, payload)
}
