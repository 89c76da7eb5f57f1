package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage timing for q_triangles at sf0.1 (diagnostic, not in
  * `sbt test`): where do the seconds go — distinct projection, pair
  * aggregation, or the wedge joins?
  */
object TriProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def timed[T](l: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[tri] $l%-18s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val ps = li.select(col("l_partkey").as("p"), col("l_suppkey").as("sk")).distinct()
    timed("ps distinct")(ps.count())
    val weighted = ps.as("a")
      .join(ps.as("b"), col("a.p") === col("b.p") && col("a.sk") < col("b.sk"))
      .groupBy(col("a.sk").as("u"), col("b.sk").as("v"))
      .agg(count(lit(1)).as("shared"))
    timed("weighted agg")(weighted.count())
    val wp = weighted.persist()
    timed("weighted persist")(wp.count())
    timed("max probe")(wp.agg(max(col("shared"))).head())
    timed("full query")(
      graft.SparkEntry.queries("q_triangles")(spark, dir).count())
    timed("full query again")(
      graft.SparkEntry.queries("q_triangles")(spark, dir).count())
    spark.stop()
  }
}
