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
}
