package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Cell-bucketed IVF index: the written layout must (a) return byte-identical
  * results to the on-the-fly `s_ann_ivf` plan and (b) prove that probes prune
  * to partition directories instead of scanning the corpus.
  */
class IvfIndexSpec extends SparkSpecBase {

  private lazy val indexDir = {
    val d = Files.createTempDirectory("ivf-index").toString + "/idx"
    IvfIndex.build(spark, spark.read.parquet(s"$sf001/embeddings.parquet"), d)
    d
  }

  test("index layout is one directory per cell") {
    val cells = new java.io.File(indexDir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(cells.length > 1 && cells.length <= 16)
  }

  test("index-backed search equals the on-the-fly IVF plan") {
    val queries = spark.read.parquet(s"$sf001/embeddings.parquet")
      .filter(col("vec_id") < 10)
    val viaIndex = IvfIndex.search(spark, indexDir, queries).collect()
    val onTheFly =
      graft.SparkEntry.queries("s_ann_ivf")(spark, sf001).collect()
    assert(viaIndex.length == onTheFly.length)
    viaIndex.zip(onTheFly).foreach { case (a, b) => assert(a == b) }
  }

  test("probes prune to partition directories") {
    val queries = spark.read.parquet(s"$sf001/embeddings.parquet")
      .filter(col("vec_id") < 2)
    val searched = IvfIndex.search(spark, indexDir, queries, nProbe = 2)
    val plan = searched.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the isin over the probed cells must land in the scan's partition
    // filters (directory-level pruning), not in the data filters
    val scanSection = plan.split("\n")
      .filter(_.contains("PartitionFilters"))
    assert(scanSection.exists(l => l.contains("cell") && l.contains("IN")),
      s"no partition filter over cell in:\n$plan")
  }
}
