package graft.tools
import org.apache.spark.sql.SparkSession

object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q6_filtered_revenue", "q3_revenue_by_segment", "d_dedup_minhash", "s_cosine_topk")
    for (name <- names) {
      println(s"===== $name =====")
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
      println(plan.split("\n").filter(l =>
        l.contains("Scan") || l.contains("PushedFilters") || l.contains("Join") ||
        l.contains("Exchange") || l.contains("WholeStageCodegen") || l.contains("ReadSchema")
      ).take(25).mkString("\n"))
    }
    spark.stop()
  }
}
