package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Z-order clustering: the interleave expression against a bit-twiddling
  * reference, and the property the layout exists for — a filter on EITHER
  * dimension of a Z-ordered file skips most row groups (measured via the
  * scan's own output-rows metric), where a lexicographic (a, b) sort only
  * prunes on `a`.
  */
class ZOrderSpec extends SparkSpecBase {

  import spark.implicits._

  private def refInterleave(vals: Seq[Long], bits: Int): Long = {
    var z = 0L
    for (i <- 0 until bits; d <- vals.indices)
      z |= ((vals(d) >> i) & 1L) << (i * vals.size + d)
    z
  }

  test("interleave matches the bit-twiddling reference") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((rnd.nextLong(1L << 21), rnd.nextLong(1L << 21)))
    val got = rows.toDF("a", "b")
      .select(col("a"), col("b"),
        ZOrder.interleave(Seq(col("a"), col("b"))).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == refInterleave(Seq(r.getLong(0), r.getLong(1)), 21))
    }
    // 3-dim variant stays positive and in bounds
    val z3 = Seq((5L, 9L, 1000L)).toDF("a", "b", "c")
      .select(ZOrder.interleave(Seq(col("a"), col("b"), col("c")), 20).as("z"))
      .head().getLong(0)
    assert(z3 == refInterleave(Seq(5L, 9L, 1000L), 20) && z3 > 0)
  }

  /** Rows the parquet scan emitted after row-group/page skipping. */
  private def scannedRows(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collectLeaves().collect {
      case s: FileSourceScanExec => s.metrics("numOutputRows").value
    }.sum
  }

  test("a filter on either dimension skips row groups of a z-ordered file") {
    // 200k rows; u is HIGH-cardinality (64k values — a user-id-like key
    // whose per-value runs are far smaller than any page, so a
    // lexicographic (u, t) sort leaves t with full-range stats at every
    // granularity), t is a 256-value bucket column
    val base = spark.range(200000).select(
      pmod(col("id") * 37L, lit(65536L)).as("u"),
      pmod(col("id") * 101L, lit(256L)).as("t"),
      col("id").as("payload"))
    val root = Files.createTempDirectory("zorder").toString
    def write(df: DataFrame, name: String): String = {
      val p = s"$root/$name"
      df.coalesce(1).write
        .option("parquet.block.size", (64 * 1024).toString)
        .parquet(p)
      p
    }
    // t is scaled to u's 16-bit width (see ZOrder's NORMALIZE WIDTHS note:
    // un-normalized, u's high bits dominate and t never prunes — the
    // first version of this spec proved that empirically)
    val zpath = write(ZOrder.cluster(base,
      Seq(col("u"), col("t") * lit(256L)), bits = 16, partitions = 1), "zorder")
    val lex = write(base.orderBy("u", "t"), "lex")

    def rowsFor(path: String, c: String, v: Long): Long =
      scannedRows(spark.read.parquet(path).filter(col(c) === v))

    val total = 200000L
    val (zU, lexU) = (rowsFor(zpath, "u", 7), rowsFor(lex, "u", 7))
    val (zT, lexT) = (rowsFor(zpath, "t", 7), rowsFor(lex, "t", 7))
    info(f"scanned for u=7: z-order $zU%,d vs lexicographic $lexU%,d of $total%,d")
    info(f"scanned for t=7: z-order $zT%,d vs lexicographic $lexT%,d of $total%,d")
    // u: both layouts prune
    assert(zU < total / 4, s"z-order failed to prune on u: $zU")
    assert(lexU < total / 4, s"lex failed to prune on u: $lexU")
    // t: only the z-order prunes — u's runs are shorter than a page, so
    // the lexicographic layout's t stats are full-range everywhere
    assert(zT < total / 2, s"z-order failed to prune on t: $zT of $total")
    assert(lexT > (total * 3) / 4, s"expected no t pruning for lex: $lexT")
    assert(zT * 4 < lexT, s"z-order not clearly ahead: $zT vs $lexT")
  }
}
