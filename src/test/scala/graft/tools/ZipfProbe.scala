package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic (Test/runMain graft.tools.ZipfProbe [nDocs]): the
  * frequency-sensitive operators on a POWER-LAW vocabulary instead of the
  * sf* ~31-word degenerate one. The prefix-filter paper's prediction
  * (Bayardo et al. / Xiao et al.): on Zipfian data the rare-first prefix
  * concentrates postings on low-df shingles, so the candidate join stays
  * small while a df-capped index still floods on the mid-frequency band —
  * the prefix path should WIN here, where on the synthetic 31-word corpus
  * it loses (documented small-vocab caveat, TextOps d_dedup_ngram_prefix).
  */
object ZipfProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(30000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = s"/tmp/graft-zipf-$nDocs"
    if (!new java.io.File(s"$dir/documents.parquet").isDirectory) {
      graft.sources.ZipfCorpus.generate(spark, dir, nDocs = nDocs)
      // ride-along tables so any registered query resolves
      for (t <- Seq("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "embeddings"))
        spark.read.parquet(s"/root/testdata/sf0.01/$t.parquet")
          .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val vocabSize = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
        .as("tok")).agg(countDistinct(col("tok"))).head().getLong(0)
    println(s"[zipf] corpus: $nDocs docs, $vocabSize distinct tokens")

    // head-to-head: df-capped+count-pruned vs lossless prefix-filtered.
    // (thresholds differ by design — J>0.5 vs J>=0.7 — so the comparison
    // is each path doing its own job on the same corpus; the prefix path
    // does strictly more work per candidate and still should win here)
    for (name <- Seq("d_dedup_ngram_prefix", "d_dedup_ngram",
        "d_dedup_minhash", "d_bm25", "d_search_bm25", "d_top_terms",
        "d_distinct_hll", "d_fuzzy_term", "d_bpe_merges")) {
      val t0 = System.nanoTime()
      try {
        val n = graft.SparkEntry.queries(name)(spark, dir).count()
        println(f"[zipf] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
      } catch { case e: Throwable =>
        println(s"[zipf] $name FAILED: ${e.getMessage}")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
