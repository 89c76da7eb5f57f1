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

  private def recallAt5(name: String): Double = {
    val truth = graft.SparkEntry.queries("s_cosine_topk")(spark, sf01)
      .select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = graft.SparkEntry.queries(name)(spark, sf01)
      .select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    (truth & got).size.toDouble / truth.size
  }

  /** Spherical k-means objective: mean cosine of each indexed vector to its
    * assigned centroid — the quantity Lloyd iterations provably improve.
    */
  private def objective(cents: Option[org.apache.spark.sql.DataFrame]): Double = {
    val corpus = spark.read.parquet(s"$sf01/embeddings.parquet")
    val d = Files.createTempDirectory("ivf-obj").toString + "/idx"
    IvfIndex.build(spark, corpus, d, centroids = cents)
    val cdf = spark.read.parquet(s"$d.centroids")
    spark.read.parquet(d).withColumn("cell", col("cell").cast("long"))
      .join(cdf, col("cell") === col("c_id"))
      .select(avg(graft.functions.VectorFunctions.vecDot(col("e"), col("ce"))
        / (col("nrm") * col("cn"))))
      .head().getDouble(0)
  }

  test("Lloyd rounds improve the spherical quantization objective") {
    // The synthetic corpus is isotropic (within-label mean cos 0.0016 vs
    // cross-label 0.0003 at sf0.01), so recall@5 across centroid schemes is
    // sampling noise — the guaranteed k-means win is the quantization
    // objective, which must improve over the lowest-id seeds and not
    // degrade with more rounds. Measured here: 0.246 (seeds) → 0.309
    // (1 round) → 0.323 (2 rounds).
    val corpus = spark.read.parquet(s"$sf01/embeddings.parquet")
    val seed = objective(None)
    val one = objective(Some(IvfIndex.kmeansCentroids(corpus, 16, 1)))
    val two = objective(Some(IvfIndex.kmeansCentroids(corpus, 16, 2)))
    info(f"objective seeds=$seed%.4f iter1=$one%.4f iter2=$two%.4f")
    assert(one > seed && two >= one,
      f"objective not improving: $seed%.4f -> $one%.4f -> $two%.4f")
  }

  test("k-means cells keep recall in the working range") {
    val base = recallAt5("s_ann_ivf_indexed")
    val km = recallAt5("s_ann_ivf_kmeans")
    info(f"recall@5 lowest-id=$base%.3f kmeans=$km%.3f")
    // same probe budget (2 of 16 cells, near-equal cell sizes); on
    // isotropic data both sit in the 0.8-0.95 band
    assert(km >= 0.7, f"kmeans recall $km%.3f below working floor")
  }

  test("fast-path avg centroids match the exact fold and assign identically") {
    val corpus = spark.read.parquet(s"$sf001/embeddings.parquet")
    val ex = IvfIndex.kmeansCentroids(corpus, 8, 2, exact = true)
    val fast = IvfIndex.kmeansCentroids(corpus, 8, 2, exact = false)
    val exRows = ex.orderBy("c_id").collect()
    val fastRows = fast.orderBy("c_id").collect()
    assert(exRows.length == 8 && fastRows.length == 8)
    exRows.zip(fastRows).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0))
      val ae = a.getSeq[Float](1); val be = b.getSeq[Float](1)
      ae.zip(be).foreach { case (x, y) =>
        assert(math.abs(x - y) <= 1e-6,
          s"cell ${a.getLong(0)}: exact $x vs fast $y")
      }
    }
    // last-ulp drift must not flip any cell assignment (similarity is
    // rounded to 1e-6 before ranking, so sub-1e-6 centroid deltas vanish)
    def assignments(cents: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
      val d = Files.createTempDirectory("ivf-flag").toString + "/idx"
      IvfIndex.build(spark, corpus, d, nCells = 8, centroids = Some(cents))
      spark.read.parquet(d).select(col("vec_id"), col("cell").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    }
    assert(assignments(ex) == assignments(fast))
  }

  test("kmeansCentroids is deterministic across runs") {
    val corpus = spark.read.parquet(s"$sf001/embeddings.parquet")
    val a = IvfIndex.kmeansCentroids(corpus, 8, 2).orderBy("c_id").collect()
    val b = IvfIndex.kmeansCentroids(corpus, 8, 2).orderBy("c_id").collect()
    assert(a.length == 8)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
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
