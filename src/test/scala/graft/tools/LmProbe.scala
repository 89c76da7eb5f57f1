package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage timing for d_char_lm at sf0.1 (diagnostic, not in
  * `sbt test`): ~1.5M trigram positions should be sub-second — where do
  * the bench seconds go?
  */
object LmProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def timed[T](l: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[lm] $l%-18s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val tg = docs
      .repartition(32, col("doc_id"))
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(1, length(text) - 2), j -> substring(text, j, 3))"))
        .as(Seq("pos0", "t")))
      .select(col("doc_id"), (col("pos0") + 1).as("i"), col("t"))
    timed("tg count")(tg.count())
    val c3 = tg.groupBy("t").agg(count(lit(1)).as("c3"))
    timed("c3 agg")(c3.count())
    val c2 = c3.groupBy(expr("substring(t, 1, 2)").as("b"))
      .agg(sum(col("c3")).as("c2"))
    timed("c2 agg")(c2.count())
    val p = tg.join(broadcast(c3), Seq("t"))
      .withColumn("b", expr("substring(t, 1, 2)"))
      .join(broadcast(c2), Seq("b"))
      .withColumn("p", (col("c3") + lit(1)).cast("double") /
        (col("c2") + lit(128)).cast("double"))
    timed("joined count")(p.count())
    val folded = p.groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_pos"),
        expr("aggregate(transform(array_sort(collect_list(struct(i, p))), " +
          "x -> x.p), cast(0 as double), (a, x) -> a + x)").as("psum"))
    timed("fold only")(folded.write.format("noop").mode("overwrite").save())
    val out = folded
      .select(col("doc_id"), col("n_pos"),
        (col("psum") / col("n_pos").cast("double")).as("avg_p"))
      .orderBy("doc_id")
    timed("full")(out.write.format("noop").mode("overwrite").save())
    timed("full 2nd")(out.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
