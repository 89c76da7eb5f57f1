package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class BloomPruneSpec extends SparkSpecBase {

  private lazy val li = spark.read.parquet(s"$sf001/lineitem.parquet")
  private lazy val part = spark.read.parquet(s"$sf001/part.parquet")

  test("prunedJoin is row-identical to the plain join") {
    val dim = part.filter(col("p_size") < 8)
    val got = BloomPrune.prunedJoin(li, "l_partkey", dim, "p_partkey")
      .groupBy("p_partkey").agg(count(lit(1)).as("n"))
    val want = li.join(dim, li("l_partkey") === dim("p_partkey"))
      .groupBy("p_partkey").agg(count(lit(1)).as("n"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("semiFilter never drops a true match and prunes most non-matches") {
    val dim = part.filter(col("p_brand") === "Brand#3" && col("p_size") < 10)
    val keys = dim.select("p_partkey").distinct()
    val trueMatches = li.join(keys, li("l_partkey") === keys("p_partkey"),
      "left_semi")
    val pruned = BloomPrune.semiFilter(li, col("l_partkey"),
      dim, col("p_partkey"))
    // lossless: every true match survives
    assert(trueMatches.exceptAll(
      pruned.select(trueMatches.columns.map(col): _*)).isEmpty)
    // effective: with 2^23 bits over a handful of keys, fpp ~ 0, so the
    // pruned count should be within a whisker of the exact semi join
    val nPruned = pruned.count()
    val nTrue = trueMatches.count()
    val nFact = li.count()
    assert(nPruned >= nTrue)
    assert(nPruned < nFact / 10,
      s"prune ineffective: $nPruned of $nFact kept (true: $nTrue)")
    assert(nPruned <= nTrue + nFact / 100,
      s"false-positive rate unexpectedly high: $nPruned vs $nTrue")
  }

  test("the probe plans as might_contain over a scalar subquery — no join") {
    val dim = part.filter(col("p_size") < 8)
    val pruned = BloomPrune.semiFilter(li, col("l_partkey"),
      dim, col("p_partkey"))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(800))
    // the fact side must NOT shuffle for the pruning itself
    val factSide = pruned.queryExecution.executedPlan.collectLeaves()
    assert(factSide.nonEmpty)
  }

  test("empty dim prunes everything") {
    val dim = part.filter(lit(false))
    val pruned = BloomPrune.semiFilter(li, col("l_partkey"),
      dim, col("p_partkey"))
    assert(pruned.count() == 0)
  }
}
