package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over an undirected edge list — the step that turns
  * pairwise near-dup verdicts into dedup CLUSTERS (pick one survivor per
  * component, drop the rest). Plain iterative min-label propagation on
  * DataFrames: each round every vertex takes the minimum label among itself
  * and its neighbors; fixpoint when a round changes nothing.
  *
  * Rounds are bounded by the component DIAMETER (not log n — the
  * large-star/small-star trick would buy that, at far more code), which is
  * the right trade for dedup graphs: near-dup components are dense and
  * shallow, so 2-4 rounds is typical. Each round is one shuffle join + one
  * aggregate; intermediate labels persist at MEMORY_AND_DISK and the driver
  * only ever sees a per-round change COUNT, never data.
  */
object ConnectedComponents {

  /** (id, cluster_id) for every vertex appearing in `edges`; cluster_id is
    * the minimum vertex id of the component.
    */
  def clusters(edges: DataFrame, a: String, b: String,
      maxRounds: Int = 50): DataFrame = {
    val sym = edges.select(col(a).as("s"), col(b).as("d"))
      .unionByName(edges.select(col(b).as("s"), col(a).as("d")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    var labels = sym.select(col("s").as("id")).distinct()
      .withColumn("label", col("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var rounds = 0
    var changed = 1L
    while (changed > 0 && rounds < maxRounds) {
      val neighborMin = sym
        .join(labels, sym("d") === labels("id"))
        .groupBy(col("s").as("n_id"))
        .agg(min(col("label")).as("n_min"))
      val next = labels
        .join(neighborMin, labels("id") === col("n_id"), "left_outer")
        .select(col("id"),
          least(col("label"), coalesce(col("n_min"), col("label"))).as("label"),
          col("label").as("old_label"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      changed = next.filter(col("label") =!= col("old_label")).count()
      val prev = labels
      labels = next.select("id", "label")
        .persist(StorageLevel.MEMORY_AND_DISK)
      prev.unpersist()
      next.unpersist()
      rounds += 1
    }
    sym.unpersist()
    labels.select(col("id"), col("label").as("cluster_id"))
  }
}
