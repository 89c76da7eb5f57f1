package graft.queries

import graft.SparkSpecBase

class RelationalSpec extends SparkSpecBase {

  test("entry returns rows") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs on sf0.001 and has a deterministic schema") {
    Relational.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf001)
      val n = df.count()
      withClue(s"$name: ") { assert(n >= 0) }
    }
  }

  test("q1 aggregates are exact against a direct computation") {
    val df = Relational.queries("q1_pricing_summary")(spark, sf001)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val totalCount = rows.map(_.getAs[Long]("count_order")).sum
    assert(totalCount == spark.read.parquet(s"$sf001/lineitem.parquet").count())
  }

  test("every oracle key has a matching query") {
    val extra = Relational.oracles.keySet -- Relational.queries.keySet
    assert(extra.isEmpty, s"oracles without queries: $extra")
  }

  test("the IVM cutoff splits events non-trivially (merge gate is not vacuous)") {
    import org.apache.spark.sql.functions._
    // if either side were empty, the incremental merge would degenerate to a
    // plain rollup and the q_ivm_rollup oracle would prove nothing
    val ev = t(spark, sf001, "events")
    val cut = 1705797000L * 1000000000L
    val before = ev.filter(col("ts") < cut).count()
    val after = ev.filter(col("ts") >= cut).count()
    assert(before > 0 && after > 0, s"degenerate cutoff: $before/$after")
    // the half-past-the-hour cut must put the spanning hour bucket on BOTH
    // sides, so the full-outer merge exercises its matched-key ADD path
    // (not just disjoint unions) under the oracle's full-recompute check.
    // (hour, type) keys only collide at the oracle's own scale — assert
    // there (sf0.01, where 4 keys span the cut), hour-level here.
    def keysOf(df: org.apache.spark.sql.DataFrame) = df
      .select(expr("ts div 3600000000000").as("h"), col("event_type"))
      .distinct().collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val hours = (s: Set[(Long, String)]) => s.map(_._1)
    val b001 = keysOf(ev.filter(col("ts") < cut))
    val a001 = keysOf(ev.filter(col("ts") >= cut))
    assert(hours(b001).intersect(hours(a001)).nonEmpty,
      "no hour bucket spans the cut at sf0.001")
    val ev01 = t(spark, sf01, "events")
    val overlap = keysOf(ev01.filter(col("ts") < cut))
      .intersect(keysOf(ev01.filter(col("ts") >= cut)))
    assert(overlap.nonEmpty,
      "no view key spans the cut at the gate scale — matched path untested")
  }

  test("pagerank: node census, mass floor, near-conservation") {
    import org.apache.spark.sql.functions._
    val rows = Relational.queries("q_pagerank")(spark, sf001).collect()
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
    val nSupp = li.select(col("l_suppkey")).distinct().count()
    val nPart = li.select(col("l_partkey")).distinct().count()
    assert(rows.count(_.getAs[String]("kind") == "supplier") == nSupp)
    assert(rows.count(_.getAs[String]("kind") == "part") == nPart)
    // every node keeps at least the damping base; integer floors only
    // LOSE mass, so the total stays within (damped lower bound, N*1e6]
    val n = rows.length
    val total = rows.map(_.getAs[Long]("mass")).sum
    assert(rows.forall(_.getAs[Long]("mass") >= 150000L))
    assert(total <= n * 1000000L, s"mass created: $total > ${n * 1000000L}")
    assert(total > n * 900000L, s"too much floor loss: $total")
  }
}
