package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Trained PQ: the Lloyd rounds must actually buy quantization quality —
  * total squared quantization error (each subvector to its NEAREST
  * codeword) is non-increasing per Lloyd round from the seed
  * configuration, so the trained codebook's SSE must be <= the
  * first-16-vectors stand-in's, and on real data strictly better.
  */
class PqTrainedSpec extends SparkSpecBase {

  private def sse(subs: DataFrame, cb: DataFrame): Double = {
    val dist2 = (1 to 8).map { i =>
      s"(cast(element_at(sub, $i) as double) - cast(element_at(csub, $i) as double)) * " +
        s"(cast(element_at(sub, $i) as double) - cast(element_at(csub, $i) as double))"
    }.mkString(" + ")
    subs.join(broadcast(cb), Seq("m"))
      .withColumn("d2", expr(dist2))
      .groupBy("vec_id", "m").agg(min(col("d2")).as("mind"))
      .agg(sum(col("mind"))).head().getDouble(0)
  }

  test("Lloyd-trained codebooks strictly reduce quantization SSE") {
    val subs = Similarity.pqSubs(spark, sf001).persist()
    try {
      val seed = subs.filter(col("vec_id") < 16)
        .select(col("m"), col("vec_id").as("k"), col("sub").as("csub"))
      val trained = Similarity.pqTrainedCodebook(subs)
      assert(trained.count() == 16 * 8, "codebook must stay 8 subspaces x 16 codewords")
      val seedSse = sse(subs, seed)
      val trainedSse = sse(subs, trained)
      assert(trainedSse < seedSse,
        s"training did not improve quantization: $trainedSse vs $seedSse")
      // meaningful improvement, not last-ulp noise
      assert(trainedSse < 0.95 * seedSse,
        s"improvement under 5%: $trainedSse vs $seedSse")
    } finally subs.unpersist()
  }

  test("trained query is deterministic across runs") {
    val a = graft.SparkEntry.queries("s_ann_pq_trained")(spark, sf001)
      .collect().map(_.mkString("|")).toSeq
    spark.catalog.clearCache()
    val b = graft.SparkEntry.queries("s_ann_pq_trained")(spark, sf001)
      .collect().map(_.mkString("|")).toSeq
    assert(a == b && a.nonEmpty)
  }
}
