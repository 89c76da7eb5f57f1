package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Q-digest — the quantile sketch over a large integer domain [0, 2^bits)
  * (Shrivastava et al., "Medians and Beyond", SenSys'04). Completes the
  * repo's sketch family (HLL distinct / KMV distinct / CMS heavy hitters /
  * q-digest quantiles).
  *
  * Determinism contract (the same trick as d_cms_heavy): the sketch is
  * built FROM the exact per-value counts, not from the raw stream. Counts
  * are an order-independent hash aggregate — the ONE data-sized shuffle —
  * and the compression that follows is a deterministic function of the
  * histogram, so both engines (and any partitioning) produce the
  * bit-identical sketch. The exact counts are also the MERGEABLE state:
  * histograms of two corpus shards union by plain `+`, and re-sketching
  * the merged histogram is associativity-free by construction (merging
  * lossy q-digests directly is order-dependent — the standard pitfall).
  *
  * Compression (bottom-up, one pass per level): children c1,c2 with parent
  * p merge into p when cnt(c1)+cnt(c2)+cnt(p) ≤ ⌊n/k⌋. All pairs at one
  * level are independent (distinct parents), so one level is ONE grouped
  * aggregation: every row maps to a family key — children to their parent
  * id, everything else to itself (the ranges cannot collide) — and each
  * family either collapses to the merged parent or re-emits its rows
  * unchanged (a bounded ≤3-element array, exploded back). Crucially the
  * state is referenced ONCE per level, so the whole `bits`-level compress
  * is a single linear plan — no per-level checkpoint barriers (a
  * self-join spelling references the state 3× per level and the recursive
  * plan grows 3^levels). Frames shrink monotonically and are bounded by
  * the number of DISTINCT values present (sparse leaves — the 2^bits
  * domain is never materialized).
  *
  * Guarantee: for every node, rank error of a quantile read off the sketch
  * is ≤ n·bits/k; sketch size is O(k·bits) nodes — which is why the final
  * quantile extraction may use a plain window: it runs over a frame
  * bounded by the sketch parameter, not by the data.
  *
  * Node ids: root = 1, children of v = 2v/2v+1, leaf for value x =
  * 2^bits + x; level(v) = ⌊log2 v⌋ spelled as length(bin(v))-1 (integer-
  * exact on both engines, no float log).
  */
object QDigest {

  /** `counts`: (v: LONG in [0, 2^bits), cnt: LONG) exact histogram.
    * Returns the sketch as (id: LONG, cnt: LONG).
    *
    * `statePartitions` sizes the compress frames: the state is bounded by
    * min(distinct values, 2^bits) rows INDEPENDENT of data volume, so the
    * default single partition is the right shape up to ~24-bit domains;
    * pass more for wider domains (the early levels then run wide and the
    * tail levels AQE-coalesce). */
  def sketch(counts: DataFrame, bits: Int, k: Int,
      statePartitions: Int = 1): DataFrame = {
    require(bits >= 1 && bits <= 40 && k >= 2)
    val leafBase = 1L << bits
    // ⌊n/k⌋ as a 1-row frame, attached by broadcast where needed — the
    // threshold is data-derived, so it must stay in-plan (no driver eval)
    val thr = counts.agg(expr(s"sum(cnt) div $k").as("thr"))
      .localCheckpoint(true)
    var state = counts
      .select((col("v") + leafBase).as("id"), col("cnt"))
      .repartition(statePartitions)
      .crossJoin(broadcast(thr))
    for (l <- bits to 1 by -1) {
      val lo = 1L << l
      val hi = (1L << (l + 1)) - 1L
      val isChild = col("id") >= lo && col("id") <= hi
      val isParentRange = col("fam") >= lo / 2 && col("fam") < lo
      state = state
        // children group under their parent id; everyone else under its
        // own id (child ids map into [2^(l-1), 2^l) — parent ids — which
        // no non-child row outside that range can occupy)
        .withColumn("fam", when(isChild, shiftright(col("id"), 1))
          .otherwise(col("id")))
        .groupBy("fam")
        .agg(
          sum(when(isChild, col("cnt"))).as("cs"),
          sum(when(!isChild, col("cnt"))).as("pc"),
          collect_list(struct(col("id"), col("cnt"))).as("entries"),
          first(col("thr")).as("thr"))
        .withColumn("mg", isParentRange && col("cs").isNotNull &&
          coalesce(col("cs"), lit(0L)) + coalesce(col("pc"), lit(0L))
            <= col("thr"))
        .select(col("thr"), explode(when(col("mg"),
            array(struct(col("fam").as("id"),
              (coalesce(col("cs"), lit(0L)) +
                coalesce(col("pc"), lit(0L))).as("cnt"))))
          .otherwise(col("entries"))).as("e"))
        .select(col("e.id").as("id"), col("e.cnt").as("cnt"), col("thr"))
    }
    state.select("id", "cnt")
  }

  /** Per-node value range [lo, hi] of a sketch frame (id, cnt). */
  def withRanges(sketch: DataFrame, bits: Int): DataFrame =
    sketch
      .withColumn("lvl", (length(bin(col("id"))) - 1).cast("int"))
      .withColumn("width", expr(s"shiftleft(1L, $bits - lvl)"))
      .withColumn("lo",
        (col("id") - expr("shiftleft(1L, lvl)")) * col("width"))
      .withColumn("hi", col("lo") + col("width") - 1)
      .drop("lvl", "width")

  /** Quantile estimates: for each (label, target rank r) return the
    * q-digest estimate — the smallest node upper bound whose cumulative
    * count (nodes ordered by (hi, lo)) reaches r. `targets` must be a
    * SMALL literal frame (label, r). The window is over the sketch, whose
    * size is bounded by O(k·bits), not by the data. */
  def quantiles(sketch: DataFrame, bits: Int, targets: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("hi"), col("lo"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = withRanges(sketch, bits).withColumn("cum", sum(col("cnt")).over(w))
    cum.crossJoin(broadcast(targets))
      .filter(col("cum") >= col("r"))
      .groupBy(col("label"), col("r"))
      .agg(min(col("hi")).as("est"))
  }
}
