package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** The power-law text fixture: shape, determinism, and the property it
  * exists to measure — the prefix-filtered set-sim join stays LOSSLESS on
  * a realistic vocabulary (the sf* corpus has ~31 words/lang, so every
  * shingle there is a stop-shingle and frequency-sensitive gates measure
  * a degenerate corner).
  */
class ZipfCorpusSpec extends SparkSpecBase {

  private val NDocs = 600L

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("zipf-spec").toString
    ZipfCorpus.generate(spark, d, nDocs = NDocs, vocab = 5000)
    d
  }

  private def docsDf = spark.read.parquet(s"$dir/documents.parquet")

  test("generation is deterministic and schema-compatible") {
    val d2 = java.nio.file.Files.createTempDirectory("zipf-spec2").toString
    ZipfCorpus.generate(spark, d2, nDocs = NDocs, vocab = 5000)
    val a = docsDf.orderBy("doc_id").collect().map(_.mkString("|")).toSeq
    val b = spark.read.parquet(s"$d2/documents.parquet")
      .orderBy("doc_id").collect().map(_.mkString("|")).toSeq
    assert(a == b && a.size == NDocs)
    assert(docsDf.columns.toSeq ==
      Seq("doc_id", "text", "lang", "source", "n_chars"))
  }

  test("the vocabulary is power-law, not the sf* 31-word degenerate case") {
    val dfs = docsDf
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
        .as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc)
      .collect()
    assert(dfs.length > 1000, s"only ${dfs.length} distinct tokens")
    val head = dfs.head.getAs[Long]("df")
    val median = dfs(dfs.length / 2).getAs[Long]("df")
    // Zipf head/median ratio is orders of magnitude; 50× is a loose floor
    assert(head > 50 * math.max(median, 1L),
      s"head df $head vs median $median — not heavy-tailed")
  }

  test("planted near-dups and exact dups are found by the ngram gate") {
    val pairs = graft.SparkEntry.queries("d_dedup_ngram_prefix")(spark, dir)
      .collect()
    assert(pairs.nonEmpty, "no J>=0.7 pairs found in a corpus with planted dups")
    // the plant plan pairs id with id-1 (near) and id-2 (exact)
    val planted = pairs.count { r =>
      val d = r.getAs[Long]("b_id") - r.getAs[Long]("a_id")
      d == 1 || d == 2
    }
    assert(planted > 10, s"only $planted planted pairs surfaced")
  }

  test("prefix-filtered join is lossless against uncapped truth on Zipf text") {
    val shingled = docsDf.select(col("doc_id"),
      graft.queries.TextOps.shingleExpr.as("ss")).persist()
    try {
      val inv = shingled.select(col("doc_id"), explode(col("ss")).as("s"))
      val truth = inv.select(col("doc_id").as("a_id"), col("s"))
        .join(inv.select(col("doc_id").as("b_id"), col("s")), Seq("s"))
        .filter(col("a_id") < col("b_id"))
        .select("a_id", "b_id").distinct()
        .join(shingled.select(col("doc_id").as("a_id"), col("ss").as("a_ss")), Seq("a_id"))
        .join(shingled.select(col("doc_id").as("b_id"), col("ss").as("b_ss")), Seq("b_id"))
        .withColumn("c", size(array_intersect(col("a_ss"), col("b_ss"))).cast("long"))
        .withColumn("u", (size(col("a_ss")) + size(col("b_ss"))).cast("long") - col("c"))
        .filter(col("c").cast("double") / col("u").cast("double") >= 0.7)
        .select("a_id", "b_id", "c", "u")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      // value-check n_common/n_union too, not just pair identity: the r12
      // rewrite intersects dictionary-id arrays instead of the shingle
      // strings, and the bijection must leave every count (hence jaccard)
      // exactly the string-side truth
      val viaPrefix = graft.SparkEntry.queries("d_dedup_ngram_prefix")(spark, dir)
        .select("a_id", "b_id", "n_common", "n_union")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      assert(viaPrefix.keySet == truth.keySet,
        s"prefix join lost ${(truth.keySet -- viaPrefix.keySet).size} " +
          s"/ gained ${(viaPrefix.keySet -- truth.keySet).size} pairs")
      assert(viaPrefix == truth,
        "intersect/union counts diverged from the string-array truth")
      assert(truth.nonEmpty)
    } finally shingled.unpersist()
  }
}
