package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class TermIndexSpec extends SparkSpecBase {

  private lazy val indexDir = {
    val d = java.nio.file.Files.createTempDirectory("term-index-spec")
      .toString + "/idx"
    TermIndex.build(spark,
      spark.read.parquet(s"$sf001/documents.parquet"), d)
    d
  }

  private val phrases = Seq("table hash", "slow hash batch")

  test("driver-side bucketOf matches the md5_bits bucket rule in the data") {
    val toks = spark.read.parquet(indexDir)
      .select("tok", "bucket").distinct().collect()
    assert(toks.nonEmpty)
    toks.foreach { r =>
      assert(TermIndex.bucketOf(r.getAs[String]("tok")) ==
        r.getAs[Int]("bucket").toLong,
        s"bucket mismatch for token '${r.getAs[String]("tok")}'")
    }
  }

  test("indexed phrase search equals the direct postings-scan result") {
    val direct = {
      val postings = spark.read.parquet(s"$sf001/documents.parquet")
        .select(col("doc_id"), posexplode(
          expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
          .as(Seq("pos", "tok")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("tok"))
      TermIndex.matchPhrases(postings, TermIndex.termsOf(spark, phrases))
        .collect().toSeq
    }
    val indexed = TermIndex.phraseSearch(spark, indexDir, phrases)
      .collect().toSeq
    assert(direct.nonEmpty)
    assert(indexed == direct)
  }

  test("the index probe prunes to the query terms' bucket partitions") {
    val searched = TermIndex.phraseSearch(spark, indexDir, Seq("table hash"))
    val plan = searched.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val partLines = plan.split("\n").filter(_.contains("PartitionFilters"))
    assert(partLines.exists(l => l.contains("bucket") && l.contains("IN")),
      s"no partition filter over bucket in:\n${plan.take(1200)}")
    // and the pruning is real: the executed scan reads fewer files than the
    // index holds (inputFiles would lie — it predates partition pruning)
    val allFiles = spark.read.parquet(indexDir).inputFiles.length
    // collect() (not count(), which plans its own aggregate on a fresh
    // QueryExecution) so the metrics below belong to the executed plan
    searched.collect()
    // descend through AQE wrappers — a plain collect stops at the adaptive
    // root and never sees the file scans
    def scansOf(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scansOf(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scansOf(q.plan)
      case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(scansOf)
    }
    val scans = scansOf(searched.queryExecution.executedPlan)
    assert(scans.nonEmpty, "no file scan in the executed plan")
    val touched = scans.map(_.metrics("numFiles").value).sum
    assert(touched > 0 && touched < allFiles,
      s"probe touched $touched of $allFiles index files — pruning had no effect")
  }

  test("a phrase with a term absent from the corpus matches nothing") {
    assert(TermIndex.phraseSearch(spark, indexDir,
      Seq("table zzzunseen")).count() == 0)
  }

  test("query phrases normalize like the index tokenizer (case, spacing)") {
    val canonical = TermIndex.phraseSearch(spark, indexDir, Seq("table hash"))
      .collect().toSeq
    assert(canonical.nonEmpty)
    // cased + double-spaced CLI input must match, not silently return zero
    val sloppy = TermIndex.phraseSearch(spark, indexDir, Seq("Table  Hash"))
      .collect().toSeq
    assert(sloppy == canonical)
  }

  test("a non-default bucket count is recorded in the artifact and honored") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("term-nb")
      .toString + "/idx"
    TermIndex.build(spark, docs, dir, nBuckets = 32)
    assert(TermIndex.bucketsOf(spark, dir).contains(32))
    // search with the DEFAULT parameter must still prune to the right
    // buckets (the recorded count wins — a mismatch would silently miss)
    val got = TermIndex.phraseSearch(spark, dir, phrases).collect().toSeq
    val expected = TermIndex.phraseSearch(spark, indexDir, phrases)
      .collect().toSeq
    assert(got == expected && got.nonEmpty)
    // and appends keep writing into the recorded bucket space
    TermIndex.append(spark, dir, docs.limit(0))
    assert(spark.read.parquet(dir)
      .agg(org.apache.spark.sql.functions.max("bucket"))
      .head().getInt(0) < 32)
  }

  test("compact recovers from a crash between its two renames") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet").limit(100)
    val dir = java.nio.file.Files.createTempDirectory("term-crash")
      .toString + "/idx"
    TermIndex.build(spark, docs, dir)
    val pre = TermIndex.phraseSearch(spark, dir, phrases).collect().toSeq
    // simulate the torn state: live data stranded in .old, nothing at dir
    assert(new java.io.File(dir).renameTo(new java.io.File(dir + ".old")))
    val (_, after) = TermIndex.compact(spark, dir)
    assert(after > 0)
    assert(!new java.io.File(dir + ".old").exists())
    assert(TermIndex.phraseSearch(spark, dir, phrases).collect().toSeq == pre)
  }

  test("readers and append heal a crashed compact, not just the next compact") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet").limit(100)
    val dir = java.nio.file.Files.createTempDirectory("term-crash-read")
      .toString + "/idx"
    TermIndex.build(spark, docs, dir)
    val pre = TermIndex.phraseSearch(spark, dir, phrases).collect().toSeq
    // torn swap window: live data stranded in .old, nothing at dir — a
    // plain reader must recover it instead of failing until someone
    // happens to re-run compact()
    assert(new java.io.File(dir).renameTo(new java.io.File(dir + ".old")))
    assert(TermIndex.phraseSearch(spark, dir, phrases).collect().toSeq == pre)
    assert(new java.io.File(dir).isDirectory)
    assert(!new java.io.File(dir + ".old").exists())
    // and append on a torn index recovers before writing
    assert(new java.io.File(dir).renameTo(new java.io.File(dir + ".old")))
    TermIndex.append(spark, dir, docs.limit(0))
    assert(TermIndex.phraseSearch(spark, dir, phrases).collect().toSeq == pre)
  }

  test("build(base) + append(delta) is search-identical to a full rebuild") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val base = docs.filter(col("doc_id") % 5 =!= 0)
    val delta = docs.filter(col("doc_id") % 5 === 0)
    assert(delta.count() > 0)
    val incDir = java.nio.file.Files.createTempDirectory("term-inc")
      .toString + "/idx"
    TermIndex.build(spark, base, incDir)
    val report = TermIndex.append(spark, incDir, delta).collect()
    val fullDir = java.nio.file.Files.createTempDirectory("term-full")
      .toString + "/idx"
    TermIndex.build(spark, docs, fullDir)
    val inc = TermIndex.phraseSearch(spark, incDir, phrases).collect().toSeq
    val full = TermIndex.phraseSearch(spark, fullDir, phrases).collect().toSeq
    assert(inc.nonEmpty && inc == full)
    // the growth report accounts for every delta posting, and appends
    // never shrink a bucket
    val deltaPostings = delta.selectExpr(
      "sum(size(regexp_extract_all(lower(text), '[a-z0-9]+', 0)))")
      .collect()(0).getLong(0)
    assert(report.map(_.getAs[Long]("n_added")).sum == deltaPostings)
    report.foreach(r => assert(r.getAs[Long]("n_added") >= 0L &&
      r.getAs[Long]("n_before") >= 0L))
  }

  test("compaction returns each bucket to one file and preserves results") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("term-compact")
      .toString + "/idx"
    TermIndex.build(spark, docs.filter(col("doc_id") % 3 === 0), dir)
    TermIndex.append(spark, dir, docs.filter(col("doc_id") % 3 === 1))
    TermIndex.append(spark, dir, docs.filter(col("doc_id") % 3 === 2))
    val pre = TermIndex.phraseSearch(spark, dir, phrases).collect().toSeq
    val nBuckets = spark.read.parquet(dir).select("bucket").distinct().count()
    val (before, after) = TermIndex.compact(spark, dir)
    assert(before > nBuckets, s"appends left no extra files ($before)")
    assert(after == nBuckets, s"$after files for $nBuckets buckets")
    val post = TermIndex.phraseSearch(spark, dir, phrases).collect().toSeq
    assert(post == pre && pre.nonEmpty)
  }
}
