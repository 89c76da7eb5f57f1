package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual fallback when AQE's skew-join
  * split cannot apply (it only rewrites sort-merge joins whose partitions
  * exceed the skew thresholds, and never helps a hot build side that
  * cannot broadcast).
  *
  * `big ⋈ dim` on `keys` where a handful of hot key values dominate the
  * big side: a plain hash join sends every row of a hot key to ONE
  * reducer — the straggler that decides job wall-clock at 100 TB. Salting
  * spreads each key over `salts` reducers:
  *
  *   - big side: salt = xxhash64(whole row) % salts — deterministic under
  *     task retries (rand() would re-deal rows on replay, corrupting
  *     speculative execution), uniform over a hot key's rows;
  *   - dim side: replicated `salts`× (explode over the salt range) — the
  *     dim pays `salts`× its size in shuffle, which is the explicit trade:
  *     use it when dim ≪ big but too large (or too mid-plan) to broadcast;
  *   - join on keys :+ salt, drop the salt.
  *
  * Result is row-identical to the unsalted join (every big row still meets
  * every matching dim row exactly once — on its own salt).
  */
object SkewJoin {

  def salted(big: DataFrame, dim: DataFrame, keys: Seq[String],
      salts: Int = 16): DataFrame = {
    require(salts > 0, "salts must be positive")
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(salts.toLong))
        .cast("int"))
    val dimS = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bigS.join(dimS, keys :+ "__salt").drop("__salt")
  }

  /** Two-phase salted aggregation for exchange-resistant aggregates
    * (collect_list/array_agg-style, where map-side combine cannot shrink a
    * hot group): phase 1 aggregates on (keys, salt) — the hot group's rows
    * land on `salts` reducers, each producing a bounded partial — phase 2
    * merges the ≤`salts` partials per key. `partial` builds the phase-1
    * aggregate column; `merge` combines partial columns in phase 2.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int,
      partial: Column => Column, valueCol: String,
      merge: Column => Column): DataFrame = {
    require(salts > 0, "salts must be positive")
    df.withColumn("__salt",
        pmod(xxhash64(struct(df.columns.map(col): _*)), lit(salts.toLong))
          .cast("int"))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partial(col(valueCol)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(merge(col("__partial")).as(valueCol))
  }
}
