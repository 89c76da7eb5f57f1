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
  * aggregate; per-round labels are locally checkpointed (lineage cut +
  * MEMORY_AND_DISK blocks) and the driver only ever sees a per-round
  * change COUNT, never data. Hitting maxRounds with labels still moving
  * throws — partial labels would silently split clusters.
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

    // Lineage is TRUNCATED every round (eager localCheckpoint → LogicalRDD):
    // the iterated plan references `labels` twice per round, so without the
    // cut round N's analyzed tree has 2^N nodes — driver-side planning and
    // AQE's explain strings blow up exponentially long before the data
    // does. The checkpoint also materializes each round exactly once (the
    // `changed` count reads the checkpointed blocks, never recomputes the
    // join); superseded rounds' blocks are freed by the ContextCleaner once
    // unreferenced.
    var labels = sym.select(col("s").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
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
        .localCheckpoint()
      changed = next.filter(col("label") =!= col("old_label")).count()
      labels = next.select("id", "label")
      rounds += 1
    }
    sym.unpersist()
    if (changed > 0)
      throw new IllegalStateException(
        s"connected components did not converge after $maxRounds rounds " +
          s"($changed labels still changing); raise maxRounds — silently " +
          "returning partial labels would split clusters")
    labels.select(col("id"), col("label").as("cluster_id"))
  }
}
