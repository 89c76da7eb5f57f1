package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class KmvSketchSpec extends SparkSpecBase {

  private def brute(values: Seq[Long], k: Int): (Long, Long) = {
    val sorted = values.sorted
    (values.length.toLong,
      if (sorted.length >= k) sorted(k - 1) else Long.MinValue)
  }

  test("sketch equals brute force regardless of partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val values = Seq.fill(5000)(rnd.nextLong().abs)
    val expected = brute(values, 256)
    for (parts <- Seq(1, 3, 32)) {
      val agg = udaf(new KmvSketchAggregator(256))
      val r = values.toDF("h").repartition(parts)
        .agg(agg(col("h")).as("r"))
        .select("r.n_exact", "r.hk").collect().head
      assert((r.getLong(0), r.getLong(1)) == expected, s"parts=$parts")
    }
  }

  test("fewer than k values yields the sentinel; exact count still right") {
    import spark.implicits._
    val agg = udaf(new KmvSketchAggregator(256))
    val r = (1L to 100L).toDF("h").repartition(5)
      .agg(agg(col("h")).as("r")).select("r.n_exact", "r.hk").collect().head
    assert(r.getLong(0) == 100L && r.getLong(1) == Long.MinValue)
  }

  test("duplicate inputs still match multiset brute force (order-free)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val base = Seq.fill(1000)(rnd.nextLong().abs)
    val withDups = base ++ base ++ base.take(500)
    val agg = udaf(new KmvSketchAggregator(256))
    def run(vs: Seq[Long]) = vs.toDF("h").repartition(7)
      .agg(agg(col("h")).as("r")).select("r.hk").collect().head.getLong(0)
    // the buffer keeps the MULTISET k-minima (the documented contract
    // feeds pre-distinct hashes; this pins that duplicates neither crash
    // the binary-search insert nor break merge associativity)
    assert(run(base) == brute(base, 256)._2)
    assert(run(withDups) == brute(withDups, 256)._2)
  }
}
