package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class QDigestSpec extends SparkSpecBase {

  private val Bits = 10 // domain [0, 1024)
  private val K = 32

  /** Seeded skewed histogram: value v with count ~ zipf-ish. */
  private def histogram(seed: Int, nVals: Int): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    (0 until nVals)
      .map(_ => rnd.nextInt(1 << Bits))
      .map(v => if (v % 7 == 0) v / 8 else v) // skew mass toward low values
      .groupBy(identity).map { case (v, vs) => (v.toLong, vs.size.toLong) }
      .toSeq.toDF("v", "cnt")
  }

  private def exactRank(hist: Seq[(Long, Long)], x: Long): Long =
    hist.filter(_._1 <= x).map(_._2).sum

  test("every quantile estimate is within the n·bits/k rank bound") {
    val hist = histogram(1, 4000)
    val rows = hist.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val n = rows.map(_._2).sum
    val sk = QDigest.sketch(hist, Bits, K)
    import spark.implicits._
    val targets = Seq(("p10", n / 10), ("p25", n / 4), ("p50", n / 2),
      ("p75", 3 * n / 4), ("p90", 9 * n / 10), ("p99", 99 * n / 100))
      .toDF("label", "r")
    val est = QDigest.quantiles(sk, Bits, targets).collect()
    assert(est.length == 6)
    val bound = n * Bits / K
    for (row <- est) {
      val r = row.getAs[Long]("r")
      val e = row.getAs[Long]("est")
      val rank = exactRank(rows, e)
      // q-digest guarantee: rank(est) >= r (cum over node ubs reaches r)
      // and overshoot bounded by the compressed mass on the search path
      assert(rank >= r - bound && rank <= r + bound,
        s"${row.getAs[String]("label")}: rank($e)=$rank target=$r bound=$bound")
    }
  }

  test("sketch size is bounded and far below the distinct-value count") {
    val hist = histogram(2, 8000)
    val nDistinct = hist.count()
    val nNodes = QDigest.sketch(hist, Bits, K).count()
    // O(k log U) bound (3k(bits+1) is the paper's constant)
    assert(nNodes <= 3L * K * (Bits + 1), s"$nNodes nodes")
    assert(nNodes < nDistinct, s"$nNodes nodes vs $nDistinct distinct")
  }

  test("total count is preserved exactly through compression") {
    val hist = histogram(3, 2000)
    val total = hist.agg(sum("cnt")).head().getLong(0)
    val skTotal = QDigest.sketch(hist, Bits, K)
      .agg(sum("cnt")).head().getLong(0)
    assert(skTotal == total)
  }

  test("shard-merged histogram sketches identically to the whole") {
    // the mergeable state is the exact histogram: shard counts union by +
    val a = histogram(4, 1500)
    val b = histogram(5, 2500)
    val merged = a.union(b).groupBy("v").agg(sum("cnt").as("cnt"))
    val whole = QDigest.sketch(merged, Bits, K)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // recompute from a re-partitioned copy: result must be identical
    val again = QDigest.sketch(merged.repartition(7), Bits, K)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(whole == again)
    assert(whole.nonEmpty)
  }

  test("uncompressible input (k >= n) stays at the leaves") {
    import spark.implicits._
    // every value distinct with count far above n/k: nothing merges
    val hist = (0L until 16L).map(v => (v * 64, 100L)).toDF("v", "cnt")
    val sk = QDigest.sketch(hist, Bits, 1600) // thr = floor(1600/1600)=1
    val ids = sk.orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(ids == (0L until 16L).map(v => (1L << Bits) + v * 64))
  }
}
