package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cell-bucketed IVF index — the storage half of the ANN scale path.
  *
  * `queries.Similarity.annIvf` demonstrates the probe algebra (assign every
  * vector to its nearest centroid, probe a query's nProbe nearest cells);
  * this operator makes the 100 TB claim real: the corpus is WRITTEN
  * partitioned by cell id (`…/cell=<c>/…`), so a probe is a partition-pruned
  * scan that reads nProbe/nCells of the data — Spark's directory-level
  * pruning does the skipping, no custom source needed.
  *
  * Default centroids are the data-derived ones of the query tier (lowest
  * `nCells` vec_ids) so index-backed search returns byte-identical results
  * to the on-the-fly `s_ann_ivf` plan; pass `kmeansCentroids` output to
  * `build` for Lloyd-refined cells (`s_ann_ivf_kmeans` gates that path).
  */
object IvfIndex {

  import graft.functions.VectorFunctions.{vecDot, vecNorm}

  /** Corpus/query frame with raw float vectors + double L2 norm. Arithmetic
    * matches the oracle (sequential-fold dot product in double; see
    * functions.VectorExpressions), and keeping `e` as float halves what the
    * written index stores per vector.
    */
  private def withNorm(df: DataFrame, vec: String): DataFrame =
    df.withColumn("e", col(vec))
      .withColumn("nrm", vecNorm(col(vec)))

  /** Deterministic data-derived centroids: the `nCells` lowest vec_ids. */
  def centroidsOf(corpus: DataFrame, nCells: Int): DataFrame =
    withNorm(corpus, "embedding").filter(col("vec_id") < nCells)
      .select(col("vec_id").as("c_id"), col("e").as("ce"), col("nrm").as("cn"))

  /** Lloyd-refined centroids, seeded from `centroidsOf` (deterministic).
    * Each round assigns every vector to its nearest cell (rounded cosine,
    * ties to the lowest cell id) and recomputes each cell's centroid as the
    * component-wise mean. Components are quantized back to float each round
    * (what a written index stores), and a cell that loses every member
    * keeps its previous centroid. Assignment is a broadcast cross join
    * (centroids are tiny); the update is one (cell, pos) shuffle of n×dim
    * skinny rows — both shapes survive a 100× corpus.
    *
    * Two spellings of the mean, switched by `exact`:
    *  - `exact = true` (oracle tier): a sequential fold in vec_id order so
    *    the float sum is bit-identical to the DuckDB oracle's
    *    `list_reduce(list(v ORDER BY vec_id))`. Costs `collect_list` of
    *    every member component per (cell, pos) — fine at oracle scale, an
    *    OOM risk for a hot cell at corpus scale.
    *  - `exact = false` (fleet tier): plain hash-partial `avg` with
    *    map-side combine — bounded state per group no matter how hot the
    *    cell, at the price of last-ulp summation-order drift (which cannot
    *    flip assignments: similarity is rounded to 1e-6 before ranking).
    */
  def kmeansCentroids(corpus: DataFrame, nCells: Int = 16, iters: Int = 2,
      exact: Boolean = true): DataFrame = {
    // every Lloyd round re-reads the corpus (assign) — persist the normed
    // frame once instead of re-scanning + re-norming per round
    val v = withNorm(corpus, "embedding").select(col("vec_id"), col("e"), col("nrm"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cents = centroidsOf(corpus, nCells)
    val mean =
      if (exact)
        expr("aggregate(array_sort(collect_list(struct(vec_id, vv))), " +
          "cast(0 as double), (a, x) -> a + x.vv) / count(1)")
      else avg(col("vv"))
    for (_ <- 1 to iters) {
      val assigned = nearestCells(v, cents, 1)
      val comp = assigned
        .select(col("c_id"), col("vec_id"), posexplode(col("e")).as(Seq("pos", "vv")))
        .groupBy("c_id", "pos")
        .agg(mean.as("cv"))
      val fresh = comp.groupBy("c_id")
        .agg(expr("transform(array_sort(collect_list(struct(pos, cv))), " +
          "x -> cast(x.cv as float))").as("ce_new"))
      cents = cents.select(col("c_id"), col("ce").as("ce_old"))
        .join(fresh, Seq("c_id"), "left")
        .withColumn("ce", coalesce(col("ce_new"), col("ce_old")))
        .withColumn("cn", vecNorm(col("ce")))
        .select(col("c_id"), col("ce"), col("cn"))
        // nCells rows: checkpoint PER ROUND, not only at the end — the next
        // round's broadcast(cents) builds in its own job and would re-run
        // every earlier round's assignment+mean aggregations (lazy chained
        // plans share no shuffle output across query executions); with the
        // checkpoint each round's aggs run exactly once (guide §3.3
        // materialize the intermediate; the r12 q_triangles lesson)
        .localCheckpoint()
    }
    v.unpersist()
    cents
  }

  // floor(x*1e6 + 0.5)/1e6, NOT round(x, 6): every op in the floor tree is
  // IEEE exactly-rounded, so the ranking an assignment argmax is decided on
  // is bit-identical across engines/library versions (a library-rounded
  // last digit landing on a 6-dp boundary could otherwise flip an argmax
  // between Spark and a DuckDB oracle).
  private val centroidSim =
    floor(vecDot(col("e"), col("ce")) / (col("nrm") * col("cn"))
      * lit(1e6) + lit(0.5)) / lit(1e6)

  /** Rank each input vector's cells by centroid similarity, keep top `n`
    * (custom TopKPerKeyExec: bounded heap, no partition sort). */
  private def nearestCells(vectors: DataFrame, cents: DataFrame, n: Int): DataFrame =
    TopK.perKey(
        vectors.crossJoin(broadcast(cents)).withColumn("csim", centroidSim),
        Seq(col("vec_id")), Seq(col("csim").desc, col("c_id").asc), n)
      .withColumnRenamed("rk", "crk")
      .drop("ce", "cn", "csim")

  /** Cell assignment for every corpus vector — (vec_id, cell, csim), the
    * same nearest-centroid rule build() partitions by, exposed for corpus
    * inspection (per-cell profiles, mixture balancing). csim is the
    * 6-dp-rounded centroid cosine the assignment was decided on.
    */
  def assign(corpus: DataFrame, cents: DataFrame): DataFrame =
    TopK.perKey(
        withNorm(corpus, "embedding").select("vec_id", "e", "nrm")
          .crossJoin(broadcast(cents)).withColumn("csim", centroidSim),
        Seq(col("vec_id")), Seq(col("csim").desc, col("c_id").asc), 1)
      .select(col("vec_id"), col("c_id").as("cell"), col("csim"))

  /** Top-`n` cell assignments WITH the decision similarity — (vec_id, c_id,
    * csim, crk). `assign` is the crk = 1 slice; rank 2 is "the nearest
    * OTHER centroid", which cluster-quality diagnostics (simplified
    * silhouette) need alongside the owner. Same broadcast-centroids ×
    * corpus-scan shape and the same floor-rounded ranking rule.
    */
  def assignTop(corpus: DataFrame, cents: DataFrame, n: Int): DataFrame =
    TopK.perKey(
        withNorm(corpus, "embedding").select("vec_id", "e", "nrm")
          .crossJoin(broadcast(cents)).withColumn("csim", centroidSim),
        Seq(col("vec_id")), Seq(col("csim").desc, col("c_id").asc), n)
      .select(col("vec_id"), col("c_id"), col("csim"), col("rk").as("crk"))

  /** Assign every corpus vector to its nearest cell and write the index:
    * parquet partitioned by `cell`, vectors stored with their norm so the
    * search path never touches the raw embeddings table.
    */
  def build(spark: SparkSession, corpus: DataFrame, indexDir: String,
      nCells: Int = 16, centroids: Option[DataFrame] = None): Unit = {
    val cents = centroids.getOrElse(centroidsOf(corpus, nCells))
    nearestCells(withNorm(corpus, "embedding").select("vec_id", "e", "nrm"),
        cents, 1)
      .withColumnRenamed("c_id", "cell").drop("crk")
      .write.mode("overwrite").partitionBy("cell").parquet(indexDir)
    // centroids ride along (single tiny file) so search is self-contained
    cents.coalesce(1).write.mode("overwrite").parquet(s"$indexDir.centroids")
  }

  /** Incremental index maintenance: assign ONLY the delta against the
    * index's own FROZEN centroids and append those rows into the affected
    * cell partitions (parquet append adds files; existing files are never
    * touched). With frozen centroids assignment is deterministic, so
    * `build(base) + append(delta)` and `build(base ∪ delta)` produce
    * search-identical indexes — IvfAppendSpec asserts row equality.
    *
    * Returns the drift report (cell, n_before, n_added): appends never
    * move centroids, so cell shares drift as the distribution shifts —
    * when a cell's share moves past the caller's bound, rebuild with
    * `kmeansCentroids`. At 100 TB the report costs one partition-local
    * count per side; the assignment is the same broadcast cross join as
    * `build`, sized by the DELTA.
    */
  def append(spark: SparkSession, indexDir: String,
      delta: DataFrame): DataFrame = {
    val cents = spark.read.parquet(s"$indexDir.centroids")
    // materialize BEFORE the append lands — the frame is lazy, and
    // without the barrier it would re-scan the directory post-append
    val before = spark.read.parquet(indexDir)
      .groupBy(col("cell").cast("long").as("cell"))
      .agg(count(lit(1)).as("n_before"))
      .localCheckpoint(true)
    val assigned = nearestCells(
        withNorm(delta, "embedding").select("vec_id", "e", "nrm"), cents, 1)
      .withColumnRenamed("c_id", "cell").drop("crk")
      .persist()
    try {
      assigned.write.mode("append").partitionBy("cell").parquet(indexDir)
      val added = assigned.groupBy("cell").agg(count(lit(1)).as("n_added"))
      before.join(added, Seq("cell"), "full_outer")
        .select(col("cell"),
          coalesce(col("n_before"), lit(0L)).as("n_before"),
          coalesce(col("n_added"), lit(0L)).as("n_added"))
        .orderBy("cell")
    } finally assigned.unpersist()
  }

  /** Probe-pruned top-k search against a built index. `queries` carries
    * (vec_id, embedding); each probes its `nProbe` nearest cells. The
    * `isin(cells)` filter lands in the scan's PartitionFilters, so only
    * nProbe-of-nCells directories are read.
    */
  def search(spark: SparkSession, indexDir: String, queries: DataFrame,
      nProbe: Int = 2, k: Int = 5): DataFrame = {
    val cents = spark.read.parquet(s"$indexDir.centroids")
    val probes = nearestCells(withNorm(queries, "embedding")
        .select("vec_id", "e", "nrm"), cents, nProbe)
      .select(col("vec_id").as("q_id"), col("e").as("qe"),
        col("nrm").as("qn"), col("c_id").as("cell"))
    val probedCells = probes.select("cell").distinct()
      .collect().map(_.getLong(0)) // nProbe × |queries| ids — driver-tiny
    // filter the raw (inferred-int) partition column BEFORE casting so the
    // predicate stays in PartitionFilters; re-type to long for the join
    val cand = spark.read.parquet(indexDir)
      .filter(col("cell").isin(probedCells: _*)) // partition pruning
      .withColumn("cell", col("cell").cast("long"))
      .join(broadcast(probes), Seq("cell"))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("sim_r",
        round(vecDot(col("qe"), col("e")) / (col("qn") * col("nrm")), 6))
    TopK.perKey(cand, Seq(col("q_id")),
        Seq(col("sim_r").desc, col("vec_id").asc), k)
      .withColumnRenamed("rk", "rnk")
      .select(col("q_id"), col("rnk"), col("vec_id").as("neighbor_id"),
        col("sim_r"), col("cell"))
      .orderBy("q_id", "rnk")
  }
}
