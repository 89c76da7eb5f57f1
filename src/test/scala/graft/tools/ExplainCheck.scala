package graft.tools

import org.apache.spark.sql.SparkSession
/** Diagnostic: exchange/join census of EVERY SparkEntry query plan — run
  * with `Test/runMain graft.tools.ExplainCheck [name...]`. Not part of
  * `sbt test`. Prints one line per query (hash/range/single exchanges,
  * broadcasts, windows) and a FLAG line for any plan containing a
  * CartesianProduct or a BroadcastNestedLoopJoin, so a new query that
  * accidentally degrades to the O(n·m) plan shows up in one scan of the
  * output. Known-legit BNLJs (broadcast query-vector × corpus scans in
  * the ANN family) are listed in `legitBnlj`.
  */
object ExplainCheck {
  /** Shared with PlanCensusSpec (the always-on regression gate). */
  private[graft] val legitBnlj = Set(
    "s_cosine_topk", "s_cosine_mrl", "s_ann_pq", "s_ann_ivfpq", "s_ann_ivf",
    "s_ann_ivf_indexed", "s_ann_ivf_kmeans", "s_ann_ivf_kmeans_fast",
    "s_contrastive_pairs", "s_hybrid_rrf", "s_ann_lsh", "s_ann_lsh_probe",
    "s_ann_rerank", "s_hamming_topk", "s_dedup_embedding", "s_dedup_semantic",
    "s_knn_graph", "s_cluster_profile", "s_quantize_int8", "s_hard_negatives",
    "s_bitext_mine", // broadcast smaller-language vectors × corpus scan
    "s_ann_graph_expand", // broadcast centroid assignment × corpus scan
    "s_ann_recall", // both audited legs are the broadcast-query × corpus shape
    "s_pack_semantic", // broadcast centroid assignment × corpus scan
    "s_silhouette", // broadcast k-means centroids × corpus scan (top-2 assign)
    "s_label_spread", // broadcast labeled seed set × unlabeled corpus scan
    "s_mmr_diversify", // broadcast query vectors × corpus scan (candidate step)
    "s_kcenter_select", // broadcast 1-row picked center × corpus scan per round
    "d_decontaminate",
    // crossJoin(broadcast(<=#groups-row aggregate>)) — the scalar-attach
    // pattern (grand totals, corpus counts, temperature rates); a BNLJ
    // against a broadcast 1-row side IS the right plan
    "d_bm25", "d_collocations", "d_mix_temperature", "d_sample_pps",
    "d_sparse_cosine_frac", "d_top_terms", "d_vocab", "d_quantile_norm",
    "d_dsir_weight", "d_quantile_sketch", // n/thr scalars + 4-row targets
    "d_sample_estimate", // two 1-row stats frames joined scalar-style
    "d_drift_chi2", // 1-row snapshot totals attached onto bucket counts
    "d_search_bm25", // 1-row (n_docs, sum_dl) stats attach onto posting rows
    "d_retrieval_eval", // same 1-row (n_docs, sum_dl) stats attach per term row
    "d_retrieval_eval_zipf", // identical body over the Zipf fixture
    "s_search_served", // same stats attach + broadcast centroid assignment
    "d_distinct_overlap", // six 1-row sketch/exact scalars assembled
    "q11_important_stock", "q22_idle_balance", "q_ntile_global", "q_share",
    "q_quantiles_exact", "q_skew_advisor",
    "q_resample") // 1-row (d0, d1) day-range attach onto distinct users

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val names =
      if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    var flagged = 0
    for (name <- names) {
      try {
        val plan = graft.SparkEntry.queries(name)(spark, dir)
          .queryExecution.executedPlan.toString
        val nHash = "Exchange hashpartitioning".r.findAllIn(plan).length
        val nRange = "Exchange rangepartitioning".r.findAllIn(plan).length
        val nSingle = "Exchange SinglePartition".r.findAllIn(plan).length
        val nBcast = "BroadcastExchange".r.findAllIn(plan).length
        val win = plan.contains("Window")
        val cart = plan.contains("CartesianProduct")
        val bnlj = plan.contains("BroadcastNestedLoopJoin")
        println(s"$name: hash=$nHash range=$nRange single=$nSingle " +
          s"bcast=$nBcast window=$win")
        if (cart || (bnlj && !legitBnlj.contains(name))) {
          flagged += 1
          println(s"  FLAG $name: cartesian=$cart bnlj=$bnlj")
        }
      } catch { case e: Throwable =>
        println(s"$name: ERROR ${e.getMessage}")
      }
    }
    println(s"[census] ${names.size} plans, $flagged flagged")
    spark.stop()
  }
}
