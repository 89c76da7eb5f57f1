package graft.tools

import org.apache.spark.sql.functions._

/** Diagnostic: recall@5 + scanned-candidate cost for lowest-id vs k-means
  * IVF cells across Lloyd iteration counts. Not part of `sbt test`.
  */
object IvfRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val corpus = spark.read.parquet(s"$dir/embeddings.parquet")
    val truth = graft.SparkEntry.queries("s_cosine_topk")(spark, dir)
      .select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    def stats(label: String, cents: Option[org.apache.spark.sql.DataFrame]): Unit = {
      val idx = java.nio.file.Files.createTempDirectory("probe").toString + "/idx"
      graft.operators.IvfIndex.build(spark, corpus, idx, centroids = cents)
      val sizes = spark.read.parquet(idx).groupBy("cell").count()
        .orderBy(desc("count")).collect().map(_.getLong(1))
      val res = graft.operators.IvfIndex.search(spark, idx,
          corpus.filter(col("vec_id") < 10))
        .select("q_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (truth & res).size.toDouble / truth.size
      // spherical k-means objective: mean cosine of each vector to its cell
      val cdf = spark.read.parquet(s"$idx.centroids")
      val obj = spark.read.parquet(idx).withColumn("cell", col("cell").cast("long"))
        .join(cdf, col("cell") === col("c_id"))
        .select(avg(graft.functions.VectorFunctions.vecDot(col("e"), col("ce"))
          / (col("nrm") * col("cn"))))
        .head().getDouble(0)
      println(f"$label%-16s recall=$recall%.3f obj=$obj%.4f cells=${sizes.length} " +
        f"max=${sizes.head} min=${sizes.last} top2=${sizes.take(2).sum}")
    }
    stats("lowest-id", None)
    for (it <- 1 to 5)
      stats(s"kmeans-iter$it",
        Some(graft.operators.IvfIndex.kmeansCentroids(corpus, 16, it)))
    spark.stop()
  }
}
