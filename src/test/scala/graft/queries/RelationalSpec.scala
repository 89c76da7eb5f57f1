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
