package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Runtime Bloom-filter join pruning — the semi-join reduction that decides
  * 100 TB join cost: when `dim` is filtered selectively but the filter's
  * column is not the join key, the fact side would still ship EVERY row
  * through the join shuffle. A Bloom filter of the surviving dim keys,
  * pushed to the fact scan, drops non-matching fact rows BEFORE the
  * exchange — shuffle bytes fall by the join's selectivity, at the cost of
  * one tiny binary blob broadcast.
  *
  * This is the same rewrite Spark's own InjectRuntimeFilter performs (and
  * `GraftExtensions` sessions enable it), exposed as an explicit operator
  * for plans the optimizer rule does not cover — e.g. a dim that is itself
  * the output of graft operators, a non-equi pruning key, or DSv1 sources
  * where the injected subquery cannot push.
  *
  * Everything stays distributed and codegen'd: the filter is built by the
  * native `BloomFilterAggregate` (ONE binary value out of a partial/final
  * aggregate — never a driver-side collect), attached as a 1-row broadcast
  * scalar, and probed with the native `BloomFilterMightContain` over
  * xxhash64 of the fact key — no UDF, no boxing.
  *
  * LOSSLESS by construction: a Bloom filter has no false negatives, and
  * false positives survive pruning only to be removed by the real join
  * that follows. `prunedJoin`'s result is row-identical to the plain join
  * (the q_bloom_prune oracle is the plain-join SQL).
  */
object BloomPrune {

  /** The filter side: ONE row, one binary column `bf`. */
  private def filterOf(dim: DataFrame, dimKey: Column,
      expectedItems: Long, numBits: Long): DataFrame = {
    val hashed = new XxHash64(
      Seq(ColumnBridge.expression(dimKey)))
    val agg = new BloomFilterAggregate(hashed,
      ColumnBridge.expression(lit(expectedItems)),
      ColumnBridge.expression(lit(numBits)))
    dim.agg(ColumnBridge.column(agg.toAggregateExpression()).as("bf"))
  }

  /** `fact` minus the rows whose `factKey` cannot appear in `dim.dimKey`.
    * May keep false positives (at the optimal hash count,
    * fpp ≈ 0.6185^(numBits/actualItems) — the defaults give ~8 bits/item
    * ≈ 2% when sized right); never drops a true match. */
  def semiFilter(fact: DataFrame, factKey: Column, dim: DataFrame,
      dimKey: Column, expectedItems: Long = 1L << 20,
      numBits: Long = 1L << 23): DataFrame = {
    // might_contain requires its filter side to be a constant or a scalar
    // subquery — the subquery runs ONCE and its blob lands in codegen
    val bf = ColumnBridge.scalarSubquery(
      filterOf(dim, dimKey, expectedItems, numBits))
    val contains = ColumnBridge.column(BloomFilterMightContain(
      bf, new XxHash64(Seq(ColumnBridge.expression(factKey)))))
    fact.filter(contains)
  }

  /** The pruned equi join: row-identical to `fact.join(dim, fact(factKey)
    * === dim(dimKey))`, but the join exchange only carries fact rows that
    * might match. */
  def prunedJoin(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, expectedItems: Long = 1L << 20,
      numBits: Long = 1L << 23): DataFrame = {
    val pruned = semiFilter(fact, col(factKey), dim, col(dimKey),
      expectedItems, numBits)
    pruned.join(dim, pruned(factKey) === dim(dimKey))
  }
}
