package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage timing for q_pagerank at sf0.1 (diagnostic, not in
  * `sbt test`): ~240k edges × 3 rounds should be ~1s — where does the
  * bench time go?
  */
object PrProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def timed[T](l: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pr] $l%-18s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    val sp = spark.read.parquet(s"$dir/lineitem.parquet")
      .select((col("l_suppkey").cast("long") * 2).as("src"),
        (col("l_partkey").cast("long") * 2 + 1).as("dst"))
      .distinct()
    val edges = sp.unionAll(sp.select(col("dst").as("src"), col("src").as("dst")))
    val g = edges
      .join(edges.groupBy("src").agg(count(lit(1)).as("outdeg")), Seq("src"))
      .persist()
    timed("g persist")(g.count())
    var mass = g.select(col("src").as("node")).distinct()
      .withColumn("mass", lit(1000000L))
    for (it <- 1 to 3) {
      mass = g.join(mass.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), expr("mass div outdeg").as("c"))
        .groupBy("node")
        .agg((lit(150000L) + expr("(85 * sum(c)) div 100")).as("mass"))
    }
    val out = mass.persist()
      .select(col("node"),
        when(col("node") % 2 === 0, lit("supplier")).otherwise(lit("part")).as("kind"),
        expr("node div 2").as("node_key"), col("mass"))
      .orderBy(col("mass").desc, col("node"))
    timed("full")(out.write.format("noop").mode("overwrite").save())
    timed("full 2nd")(out.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
