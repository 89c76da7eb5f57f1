package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable k-minimum-values distinct sketch as a typed Aggregator — the
  * single-pass aggregate-function spelling of the KMV estimate that
  * d_distinct_kmv builds through the TopK exec.
  *
  * Buffer = the k smallest hashes seen, kept as a SORTED ascending
  * Array[Long] (≤ k elements) plus the exact running distinct-input count.
  * `reduce` is a binary-search insert (the common case — a hash above the
  * current kth — is one comparison, no allocation); `merge` is a sorted
  * merge-and-trim. Spark's partial aggregation gives the sketch its
  * textbook property for free: map-side partials bound every task at k
  * longs however many distinct values a partition holds, and the exchange
  * carries ≤ k longs per group.
  *
  * The input contract matches d_distinct_kmv: values must already be the
  * deterministic 60-bit md5 hashes, pre-deduplicated per group (the exact
  * count rides along only to audit the estimate; a production caller
  * drops it and feeds raw hashes — duplicates then inflate nothing but
  * the count, since the k-min set is duplicate-insensitive).
  *
  * Output: (n_exact, hk) — hk = the kth smallest hash, or MinValue
  * sentinel → null handling is the caller's `when(n_exact < k)` branch,
  * mirroring the TopK spelling's left join.
  */
final case class KmvBuffer(mins: Array[Long], n: Long)

final class KmvSketchAggregator(k: Int = 256)
    extends Aggregator[Long, KmvBuffer, KmvResult] {

  override def zero: KmvBuffer = KmvBuffer(Array.emptyLongArray, 0L)

  override def reduce(buf: KmvBuffer, h: Long): KmvBuffer = {
    val m = buf.mins
    if (m.length >= k && h >= m(m.length - 1)) return KmvBuffer(m, buf.n + 1)
    val idx = {
      val i = java.util.Arrays.binarySearch(m, h)
      if (i >= 0) i else -(i + 1)
    }
    val outLen = math.min(m.length + 1, k)
    val out = new Array[Long](outLen)
    System.arraycopy(m, 0, out, 0, idx)
    out(idx) = h
    System.arraycopy(m, idx, out, idx + 1, outLen - idx - 1)
    KmvBuffer(out, buf.n + 1)
  }

  override def merge(a: KmvBuffer, b: KmvBuffer): KmvBuffer = {
    val (ma, mb) = (a.mins, b.mins)
    if (ma.isEmpty) return KmvBuffer(mb, a.n + b.n)
    if (mb.isEmpty) return KmvBuffer(ma, a.n + b.n)
    val out = new Array[Long](math.min(ma.length + mb.length, k))
    var (i, j, o) = (0, 0, 0)
    while (o < out.length) {
      if (j >= mb.length || (i < ma.length && ma(i) <= mb(j))) {
        out(o) = ma(i); i += 1
      } else {
        out(o) = mb(j); j += 1
      }
      o += 1
    }
    KmvBuffer(out, a.n + b.n)
  }

  override def finish(buf: KmvBuffer): KmvResult =
    KmvResult(buf.n, if (buf.mins.length >= k) buf.mins(k - 1) else Long.MinValue)

  override def bufferEncoder: Encoder[KmvBuffer] = Encoders.product[KmvBuffer]
  override def outputEncoder: Encoder[KmvResult] = Encoders.product[KmvResult]
}

/** (exact distinct-input count, kth-smallest hash or MinValue if < k seen). */
final case class KmvResult(n_exact: Long, hk: Long)
