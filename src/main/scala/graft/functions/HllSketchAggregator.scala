package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable HyperLogLog distinct sketch as a typed Aggregator — the third
  * sketch class beside KMV (order statistics) and Count-Min (frequency):
  * fixed 256-byte registers per group, so the map-side partial and the
  * exchange payload are CONSTANT regardless of how many distinct values a
  * partition holds — the property that makes HLL the industry default for
  * distinct counting at 100 TB (one register array per (group, partition)
  * rides the shuffle, merged by elementwise max, which is commutative,
  * associative, and idempotent — re-aggregation safe).
  *
  * Determinism contract (the oracle mirrors every step in SQL):
  *  - input = the 60-bit md5 hash `conv(substring(md5(v),1,15),16,10)`,
  *    pre-deduplicated per group (n_exact audits the estimate);
  *  - bucket = h mod m; w = h div m (52 bits);
  *  - rho = trailing-zero count of w, plus 1 — `1 + bit_count((w & -w)-1)`
  *    in both engines — or RhoCap when w = 0. Trailing (not leading) zeros
  *    keep the register exactly SQL-expressible: no log2/float anywhere.
  *  - finish() folds the registers into the integer-exact harmonic-sum
  *    numerator S = Σ_j 2^(RhoCap - r_j) (empty register → 2^RhoCap), so
  *    the float estimate α·m²·2^RhoCap / S is ONE double division on both
  *    engines. Max S = m·2^RhoCap = 2^61 — no BIGINT overflow.
  */
final case class HllBuffer(regs: Array[Byte], n: Long)

/** (exact distinct-input count, harmonic-sum numerator, empty registers). */
final case class HllResult(n_exact: Long, s: Long, zeros: Long)

final class HllSketchAggregator(m: Int = HllSketchAggregator.M)
    extends Aggregator[Long, HllBuffer, HllResult] {
  import HllSketchAggregator.RhoCap

  override def zero: HllBuffer = HllBuffer(new Array[Byte](m), 0L)

  override def reduce(buf: HllBuffer, h: Long): HllBuffer = {
    val b = (h % m).toInt
    val w = h / m
    val rho =
      (if (w == 0L) RhoCap else java.lang.Long.numberOfTrailingZeros(w) + 1).toByte
    if (rho > buf.regs(b)) buf.regs(b) = rho
    HllBuffer(buf.regs, buf.n + 1)
  }

  override def merge(a: HllBuffer, b: HllBuffer): HllBuffer = {
    val out = new Array[Byte](m)
    var i = 0
    while (i < m) {
      out(i) = if (a.regs(i) >= b.regs(i)) a.regs(i) else b.regs(i)
      i += 1
    }
    HllBuffer(out, a.n + b.n)
  }

  override def finish(buf: HllBuffer): HllResult = {
    var s = 0L
    var zeros = 0L
    var i = 0
    while (i < m) {
      s += 1L << (RhoCap - buf.regs(i))
      if (buf.regs(i) == 0) zeros += 1
      i += 1
    }
    HllResult(buf.n, s, zeros)
  }

  override def bufferEncoder: Encoder[HllBuffer] = Encoders.product[HllBuffer]
  override def outputEncoder: Encoder[HllResult] = Encoders.product[HllResult]
}

object HllSketchAggregator {
  /** Register count (2^8 buckets — standard precision p=8 for the gate;
    * production raises p, nothing else changes). */
  val M = 256

  /** rho assigned to w = 0 (the 52-bit suffix has at most 51 trailing
    * zeros, so 53 = "strictly rarer than anything observable"). */
  val RhoCap = 53

  /** α_m · m² · 2^RhoCap — the estimate's constant numerator, folded here
    * once so the Spark column and the DuckDB oracle share the literal
    * (Double.toString round-trips bit-exactly through both parsers). */
  val AlphaNum: Double =
    0.7213 / (1.0 + 1.079 / M.toDouble) * (M.toDouble * M.toDouble) *
      (1L << RhoCap).toDouble
}
