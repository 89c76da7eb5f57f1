package graft

import org.apache.spark.sql.SparkSession

/** Session tuning knobs shared by Bench / Verify / Main so the benched,
  * gated, and CLI plans are the same plans.
  *
  * The one non-default here is AQE's INITIAL shuffle-partition count.
  * With coalescing on, the initial count bounds per-partition bytes
  * (spill) while the effective count stays data-sized — but a flat
  * `8×cores` (the r10 spelling) taxes every small stage with 256-way
  * initial shuffles: generalization on a 100 MB extract measured
  * 2.84 s at 32 initial vs 5.6–7.2 s at 256, a pure scheduling cost
  * that also rode along at scales where it bought nothing. So the
  * count is sized to the INPUT BYTES of the phase about to run
  * (r10 verdict #2), clamped to [cores, 8×cores]:
  *
  *  - ~100 MB compressed PBF (synth400) → cores (r9 behavior, no tax);
  *  - ~1 GB (synth4000, 79M elements) → 8×cores — the setting that took
  *    the J1 assembly from 284.6 s / 13.5 GB mem-spill (32 partitions ≈
  *    2.5 GB each) to 144.9 s with 0.39 GB peak task memory.
  *
  * The divisor models observed expansion: 1.05 GB of compressed PBF
  * produced 10.4 GB of assembly shuffle write (~10×), so one initial
  * partition per 4 MB of input targets ≤ ~40–64 MB post-shuffle
  * partitions. On a cluster the same arithmetic holds per executor —
  * size initial partitions to data, never to a core-count constant.
  */
object Tuning {

  val InitialPartitionsKey =
    "spark.sql.adaptive.coalescePartitions.initialPartitionNum"

  /** Recursive byte size of a file or directory, resolved through the
    * Hadoop FileSystem so URI-form paths (`file:/…`, `hdfs://…`, `s3a://…`)
    * size correctly — `java.io.File` alone would report 0 for those and
    * silently pick the spill-prone narrow partition count. Returns 0 when
    * the path can't be sized (missing, glob, no filesystem). */
  def inputBytes(spark: SparkSession, path: String): Long =
    try {
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getContentSummary(p).getLength
    } catch { case _: Exception => 0L }

  /** Initial shuffle-partition count for `bytes` of compressed input:
    * one partition per 4 MB, clamped to [cores, 8×cores]. An UNSIZEABLE
    * input (bytes ≤ 0) gets the 8×cores ceiling: the failure modes are
    * asymmetric — a too-wide count costs a flat few seconds of scheduling
    * on a small input, a too-narrow one re-enters the measured
    * 2.5 GB-partition spill regime (284.6 s at 79M elements). */
  def initialPartitionsFor(bytes: Long, cores: Int): Int =
    if (bytes <= 0) 8 * cores
    else math.max(cores, math.min(8L * cores, bytes / (4L << 20)).toInt)

  /** Set the AQE initial partition count for the phase about to execute,
    * sized to its input paths. `SPARK_GRAFT_INITIAL_PARTITIONS` still wins
    * (the documented override). Safe to call between phases: AQE reads the
    * conf at query execution, not plan construction. Returns the count. */
  def sizeToInput(spark: SparkSession, paths: Seq[String]): Int = {
    val bytes = paths.map(inputBytes(spark, _)).sum
    val n = sys.env.get("SPARK_GRAFT_INITIAL_PARTITIONS").map(_.toInt)
      .getOrElse(
        initialPartitionsFor(bytes, spark.sparkContext.defaultParallelism))
    spark.conf.set(InitialPartitionsKey, n.toString)
    System.err.println(
      s"[tuning] initial shuffle partitions = $n (${bytes >> 20} MB input)")
    n
  }
}
