package graft.tools

import org.apache.spark.sql.SparkSession

/** Stage decomposition of d_dedup_ngram_prefix (prefix-filter join).
  * Run: sbt "Test/runMain graft.tools.PrefixJoinProbe [sfDir]"
  */
object PrefixJoinProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pfx] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s -> $r")
      r
    }
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), expr(
        "array_distinct(transform(sequence(1, greatest(length(text) - 4, 1)), " +
          "i -> substring(text, i, 5)))").as("ss")).persist()
    timed("shingle + persist")(d.count())
    val inv = d.select(col("doc_id"), explode(col("ss")).as("s"))
    timed("inv count")(inv.count())
    val dfs = inv.groupBy("s").agg(count(lit(1)).as("df"))
    timed("dfs count")(dfs.count())
    val joined = inv.join(dfs, Seq("s"))
      .join(d.select(col("doc_id"), size(col("ss")).as("nss")), Seq("doc_id"))
    timed("inv+dfs+size join")(joined.count())
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy(col("df"), col("s"))
    val prefix = joined.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= expr("nss - (7 * nss + 9) DIV 10 + 2"))
      .select(col("doc_id"), col("s")).persist()
    timed("prefix rank+filter")(prefix.count())
    val cand = prefix.select(col("doc_id").as("a_id"), col("s"))
      .join(prefix.select(col("doc_id").as("b_id"), col("s")), Seq("s"))
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("c_pfx"))
      .persist()
    timed("candidate pairs")(cand.count())
    val survivors = cand.filter(col("c_pfx") >= 2).select("a_id", "b_id")
      .persist()
    timed("survivors (c_pfx>=2)")(survivors.count())
    val verified = survivors
      .join(d.select(col("doc_id").as("a_id"), col("ss").as("a_ss")), Seq("a_id"))
      .join(d.select(col("doc_id").as("b_id"), col("ss").as("b_ss")), Seq("b_id"))
      .withColumn("c", size(array_intersect(col("a_ss"), col("b_ss"))).cast("long"))
      .withColumn("u", (size(col("a_ss")) + size(col("b_ss"))).cast("long") - col("c"))
      .filter(col("c").cast("double") / col("u").cast("double") >= 0.7)
    timed("verify (arrays)")(verified.count())
    spark.stop()
  }
}
