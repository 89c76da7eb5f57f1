package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Incremental IVF maintenance: appending a delta against frozen
  * centroids must be search-identical to rebuilding over the union, the
  * drift report must account for every delta row, and probes must stay
  * partition-pruned after the append.
  */
class IvfAppendSpec extends SparkSpecBase {

  private lazy val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
  private lazy val base = emb.filter(col("vec_id") < 30)
  private lazy val delta = emb.filter(col("vec_id") >= 30)
  private lazy val queries = emb.filter(col("vec_id") < 5)
    .select("vec_id", "embedding")

  private def results(dir: String): Seq[String] =
    IvfIndex.search(spark, dir, queries, nProbe = 2, k = 5)
      .collect().map(_.mkString("|")).toSeq

  test("build+append equals a rebuild over the union, search-for-search") {
    val incDir = Files.createTempDirectory("ivf-inc").toString + "/idx"
    val fullDir = Files.createTempDirectory("ivf-full").toString + "/idx"
    val cents = IvfIndex.centroidsOf(base, nCells = 8).localCheckpoint(true)

    IvfIndex.build(spark, base, incDir, centroids = Some(cents))
    val report = IvfIndex.append(spark, incDir, delta)

    IvfIndex.build(spark, base.unionByName(delta), fullDir,
      centroids = Some(cents))

    assert(results(incDir) == results(fullDir))

    // the drift report accounts for every row on both sides
    val rep = report.collect()
    assert(rep.map(_.getLong(2)).sum == delta.count())
    assert(rep.map(_.getLong(1)).sum == base.count())
  }

  test("appended index keeps probes partition-pruned") {
    val dir = Files.createTempDirectory("ivf-prune").toString + "/idx"
    IvfIndex.build(spark, base, dir, nCells = 8)
    IvfIndex.append(spark, dir, delta)
    val plan = IvfIndex.search(spark, dir, queries, nProbe = 2, k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell"), plan.take(600))
  }
}
