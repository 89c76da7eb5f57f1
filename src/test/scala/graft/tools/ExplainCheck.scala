package graft.tools

import org.apache.spark.sql.SparkSession
/** Diagnostic: exchange/window census of the newest query plans — run
  * with `Test/runMain graft.tools.ExplainCheck`. Not part of `sbt test`.
  */
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (name <- Seq("q2_min_cost_supplier", "q7_volume_shipping",
        "q8_market_share", "q9_product_profit", "q10_returned_items",
        "q11_important_stock", "q12_late_priority", "q14_promo_revenue",
        "q16_supplier_cnt", "q20_part_promotion", "q_funnel",
        "d_mix_temperature", "d_sample_per_class", "d_distinct_kmv")) {
      val plan = graft.SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      val nHash = "Exchange hashpartitioning".r.findAllIn(plan).length
      val nRange = "Exchange rangepartitioning".r.findAllIn(plan).length
      val nSingle = "Exchange SinglePartition".r.findAllIn(plan).length
      val nBcast = "BroadcastExchange".r.findAllIn(plan).length
      val win = plan.contains("Window")
      println(s"$name: hash=$nHash range=$nRange single=$nSingle bcast=$nBcast window=$win")
    }
    spark.stop()
  }
}
