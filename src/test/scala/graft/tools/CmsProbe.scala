package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage timing for d_cms_heavy at sf0.1 (diagnostic, not in
  * `sbt test`): the query is 4 md5s per token + two small aggregates —
  * where do ~10 bench seconds go?
  */
object CmsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def timed[T](l: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[cms] $l%-18s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    timed("docs count")(docs.count())
    val toks = docs.select(explode(
      expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("tok"))
    timed("tok count")(toks.count())
    def cellExpr(i: Int, tok: String): String =
      s"cast(conv(substring(md5(concat('cms-$i-', $tok)), 1, 8), 16, 10) as bigint) % 256"
    val sketch = toks
      .select(posexplode(array((0 until 4).map(i =>
        expr(cellExpr(i, "tok"))): _*)).as(Seq("row_idx", "cell")))
      .groupBy("row_idx", "cell").agg(count(lit(1)).as("c"))
    timed("sketch agg")(sketch.count())
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("exact_cnt"))
    timed("exact agg")(exact.count())
    val top = graft.operators.TopK.global(exact,
      Seq(col("exact_cnt").desc, col("tok").asc), 20).drop("rk")
    timed("topk")(top.count())
    val probes = top.select(col("tok"), col("exact_cnt"),
      posexplode(array((0 until 4).map(i =>
        expr(cellExpr(i, "tok"))): _*)).as(Seq("row_idx", "cell")))
    val joined = probes.join(sketch, Seq("row_idx", "cell"))
      .groupBy("tok", "exact_cnt")
      .agg(min(col("c")).as("est_cnt"))
      .orderBy("tok")
    timed("probe join")(joined.count())
    timed("full 2nd run")(joined.count())
    spark.stop()
  }
}
