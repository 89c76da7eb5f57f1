package graft.streaming

import graft.SparkSpecBase
import graft.operators.TermIndex
import org.apache.spark.sql.functions._

class StreamingIndexerSpec extends SparkSpecBase {

  private val phrases = Seq("table hash", "part filter")

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("streamed index equals the batch build, across two drain cycles") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "text")
    val in = tmp("sidx-in")
    val idx = tmp("sidx") + "/idx"
    val ckpt = tmp("sidx-ckpt")
    docs.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(in)
    StreamingIndexer.run(spark, in, idx, ckpt)
    val afterFirst = TermIndex.phraseSearch(spark, idx, phrases).count()
    assert(afterFirst > 0)
    // second drain picks up ONLY the new file (checkpointed source)
    docs.filter(col("doc_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(in)
    StreamingIndexer.run(spark, in, idx, ckpt)
    val streamed = TermIndex.phraseSearch(spark, idx, phrases)
      .collect().toSeq
    val batchDir = tmp("sidx-batch") + "/idx"
    TermIndex.build(spark, docs, batchDir)
    val batch = TermIndex.phraseSearch(spark, batchDir, phrases)
      .collect().toSeq
    assert(streamed == batch && batch.nonEmpty)
    assert(streamed.size.toLong > afterFirst, "second drain added nothing")
  }

  test("batch re-delivery rewrites in place — no double-counted postings") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "text").limit(50)
    val idx = tmp("sidx-replay") + "/idx"
    TermIndex.writeBatch(docs, idx, batchId = 0)
    val once = spark.read.parquet(idx).count()
    // simulate a crash between the write and the checkpoint commit: the
    // SAME batch id is delivered again
    TermIndex.writeBatch(docs, idx, batchId = 0)
    assert(spark.read.parquet(idx).count() == once)
  }

  test("compaction folds batches and the stream can keep appending after") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "text")
    val idx = tmp("sidx-fold") + "/idx"
    TermIndex.writeBatch(docs.filter(col("doc_id") % 3 === 0), idx, 0)
    TermIndex.writeBatch(docs.filter(col("doc_id") % 3 === 1), idx, 1)
    val pre = TermIndex.phraseSearch(spark, idx, phrases).collect().toSeq
    val (before, after) = TermIndex.compact(spark, idx)
    assert(after < before, s"no fold: $before -> $after")
    assert(TermIndex.phraseSearch(spark, idx, phrases).collect().toSeq == pre)
    // the folded index must accept the NEXT micro-batch without a
    // conflicting-directory-structure error, and serve the union
    TermIndex.writeBatch(docs.filter(col("doc_id") % 3 === 2), idx, 2)
    val full = {
      val dirAll = tmp("sidx-fold-all") + "/idx"
      TermIndex.build(spark, docs, dirAll)
      TermIndex.phraseSearch(spark, dirAll, phrases).collect().toSeq
    }
    assert(TermIndex.phraseSearch(spark, idx, phrases).collect().toSeq == full)
  }

  test("bucket pruning survives the nested batch layout") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "text")
    val idx = tmp("sidx-prune") + "/idx"
    TermIndex.writeBatch(docs.filter(col("doc_id") < 100), idx, 0)
    TermIndex.writeBatch(docs.filter(col("doc_id") >= 100), idx, 1)
    val searched = TermIndex.phraseSearch(spark, idx, Seq("table hash"))
    val plan = searched.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val partLines = plan.split("\n").filter(_.contains("PartitionFilters"))
    assert(partLines.exists(l => l.contains("bucket") && l.contains("IN")),
      s"no bucket partition filter in:\n${plan.take(1200)}")
  }
}
