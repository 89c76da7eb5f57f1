package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic (Test/runMain graft.tools.DeterminismProbe, not part of
  * `sbt test`): runs EVERY SparkEntry query twice in one session and
  * compares the collected rows. The DuckDB oracle only catches
  * nondeterminism when a run happens to disagree with DuckDB; this
  * catches the rest — partial-aggregation-order float sums, unordered
  * collect_list assumptions, partition-dependent tie-breaks — by
  * demanding run-to-run identity on the same input. Caches are cleared
  * between runs so persisted intermediates can't mask a flaky plan.
  */
object DeterminismProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    var bad = 0
    for (name <- graft.SparkEntry.queries.keys.toSeq.sorted) {
      try {
        val a = graft.SparkEntry.queries(name)(spark, dir).collect().toSeq
        spark.catalog.clearCache()
        val b = graft.SparkEntry.queries(name)(spark, dir).collect().toSeq
        spark.catalog.clearCache()
        if (a != b) {
          bad += 1
          val firstDiff = a.zip(b).indexWhere { case (x, y) => x != y }
          println(s"[determinism] FLAKY $name: sizes ${a.size}/${b.size}, " +
            s"first diff at row $firstDiff")
        }
      } catch { case e: Throwable =>
        bad += 1
        println(s"[determinism] ERROR $name: ${e.getMessage}")
      }
    }
    println(s"[determinism] ${graft.SparkEntry.queries.size} queries, " +
      s"$bad flaky/errored")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
