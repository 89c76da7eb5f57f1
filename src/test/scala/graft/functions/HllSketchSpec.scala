package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class HllSketchSpec extends SparkSpecBase {
  import HllSketchAggregator.{M, RhoCap}

  /** Register-level brute force: the sketch is DEFINED by these three
    * lines, so partition-independence below is a pure merge test. */
  private def brute(values: Seq[Long]): (Long, Long, Long) = {
    val regs = new Array[Int](M)
    values.foreach { h =>
      val b = (h % M).toInt
      val w = h / M
      val rho = if (w == 0L) RhoCap else java.lang.Long.numberOfTrailingZeros(w) + 1
      if (rho > regs(b)) regs(b) = rho
    }
    (values.length.toLong,
      regs.map(r => 1L << (RhoCap - r)).sum,
      regs.count(_ == 0).toLong)
  }

  private def run(values: Seq[Long], parts: Int): (Long, Long, Long) = {
    import spark.implicits._
    val agg = udaf(new HllSketchAggregator())
    val r = values.toDF("h").repartition(parts)
      .agg(agg(col("h")).as("r"))
      .select("r.n_exact", "r.s", "r.zeros").collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("registers equal brute force regardless of partitioning") {
    val rnd = new scala.util.Random(13)
    // 60-bit hashes, like conv(substring(md5,1,15),16,10) produces
    val values = Seq.fill(8000)(rnd.nextLong().abs % (1L << 60))
    val expected = brute(values)
    for (parts <- Seq(1, 3, 32))
      assert(run(values, parts) == expected, s"parts=$parts")
  }

  test("estimate lands within the p=8 error envelope") {
    val rnd = new scala.util.Random(29)
    val n = 50000
    val values = Seq.fill(n)(rnd.nextLong().abs % (1L << 60)).distinct
    val (_, s, _) = run(values, 16)
    val est = HllSketchAggregator.AlphaNum / s.toDouble
    // 1.04/sqrt(256) ≈ 6.5% standard error; 4σ bound for a fixed seed
    assert(math.abs(est - values.length) < 0.26 * values.length,
      s"est=$est exact=${values.length}")
  }

  test("w = 0 saturates the register at RhoCap (not a shift overflow)") {
    // h < M makes the 52-bit suffix zero — the rarest observable pattern
    val (_, s, zeros) = run(Seq(3L), 2)
    assert(zeros == M - 1)
    assert(s == (M - 1).toLong * (1L << RhoCap) + 1L)
  }

  test("merge with an empty partial is the identity") {
    val values = Seq.fill(100)(new scala.util.Random(5).nextLong().abs % (1L << 60))
    import spark.implicits._
    val agg = udaf(new HllSketchAggregator())
    // grouped so one group's rows land in few partitions while the
    // aggregation still merges against empty partials from the others
    val r = values.toDF("h").withColumn("g", lit(1)).repartition(32)
      .groupBy("g").agg(agg(col("h")).as("r"))
      .select("r.s").collect().head.getLong(0)
    assert(r == brute(values)._2)
  }
}
