package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.operators.CorpusRelease

/** Streaming release maintenance == the batch pipeline, generation for
  * generation: each micro-batch publishes what applyDelta would, the
  * final HEAD equals a from-scratch rebuild of the fully-applied input,
  * and re-delivered batches are no-ops (the crash-replay contract).
  */
class StreamingReleaseSpec extends SparkSpecBase {

  private val MinTokens = 20L

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private lazy val raw = spark.read.parquet(s"$sf001/documents.parquet")

  private def tombstones(ids: DataFrame): DataFrame =
    ids.select(col("doc_id"),
      lit(null).cast("string").as("text"),
      lit(null).cast("string").as("lang"),
      lit(null).cast("string").as("source"),
      lit(null).cast("long").as("n_chars"),
      lit(true).as("deleted"))

  private def upserts(docs: DataFrame): DataFrame =
    docs.withColumn("deleted", lit(false))

  // three deltas: edits, deletions, then new ids + another edit
  private lazy val delta1 = upserts(raw.filter(col("doc_id") % 11 === 3)
    .withColumn("text", concat(lit("edit1: "), col("text"))))
  private lazy val delta2 = tombstones(
    raw.filter(col("doc_id") % 13 === 2).select("doc_id"))
  private lazy val delta3 = upserts(
    raw.filter(col("doc_id") % 17 === 5)
      .withColumn("doc_id", col("doc_id") + 700000L)
      .unionByName(raw.filter(col("doc_id") % 19 === 1)
        .withColumn("text", concat(lit("edit3: "), col("text")))))

  private def corpusRows(dir: String): Seq[String] =
    spark.read.parquet(s"$dir/corpus")
      .select(col("doc_id"), col("text_hash"), col("split"), col("n_tokens"))
      .collect().map(_.mkString("|")).toSeq.sorted

  test("streamed generations equal the batch rebuild; replay is a no-op") {
    // base release
    val rawDir = tmp("sr-raw")
    raw.write.mode("overwrite").parquet(s"$rawDir/documents.parquet")
    val base = tmp("sr-base")
    CorpusRelease.run(spark, rawDir, base, MinTokens)

    // stream dir: one single-file parquet per delta, written in order so
    // the file source's modification-time ordering batches them 0/1/2
    val streamDir = tmp("sr-stream")
    for ((d, i) <- Seq(delta1, delta2, delta3).zipWithIndex) {
      val one = tmp(s"sr-d$i")
      d.coalesce(1).write.mode("overwrite").parquet(one)
      val part = new java.io.File(one).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val target = new java.io.File(streamDir, f"delta-$i%03d.parquet")
      require(part.renameTo(target))
      Thread.sleep(1100) // distinct mtimes => deterministic batch order
    }

    val outRoot = tmp("sr-out")
    val q = StreamingRelease.start(spark, streamDir, base, outRoot,
      MinTokens, availableNow = true, maxFilesPerTrigger = Some(1))
    q.awaitTermination(120000)
    assert(StreamingRelease.headGeneration(outRoot) == 2L,
      "three deltas must land as generations 0..2")
    val head = StreamingRelease.currentRelease(outRoot, base)

    // batch-rebuild reference: fold the same deltas into the raw input
    def applied(cur: DataFrame, up: DataFrame, del: DataFrame): DataFrame = {
      val removed = del.union(up.select("doc_id")).distinct()
      cur.join(removed, Seq("doc_id"), "left_anti").unionByName(up)
    }
    val finalRaw = Seq(delta1, delta2, delta3).foldLeft(raw) { (cur, d) =>
      applied(cur,
        d.filter(!col("deleted")).drop("deleted"),
        d.filter(col("deleted")).select("doc_id"))
    }
    val rebuildRaw = tmp("sr-rebuild-raw")
    finalRaw.write.mode("overwrite").parquet(s"$rebuildRaw/documents.parquet")
    val rebuild = tmp("sr-rebuild")
    CorpusRelease.run(spark, rebuildRaw, rebuild, MinTokens)
    assert(corpusRows(head) == corpusRows(rebuild))
    assert(corpusRows(head).nonEmpty)

    // manifest at HEAD matches a recount of its own corpus
    val manifest = spark.read.json(s"$head/manifest")
      .select(col("split"), col("lang"), col("n_docs"), col("n_tokens"))
      .collect().map(_.mkString("|")).toSeq.sorted
    val recount = spark.read.parquet(s"$head/corpus")
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
      .collect().map(_.mkString("|")).toSeq.sorted
    assert(manifest == recount)

    // crash-replay contract: re-delivering the committed batch id (the
    // only id a stream ever re-delivers — the crash window is between the
    // HEAD commit and the checkpoint advance) must change nothing
    val before = corpusRows(head)
    StreamingRelease.applyBatch(spark, delta1, 2L, base, outRoot, MinTokens)
    assert(StreamingRelease.headGeneration(outRoot) == 2L)
    assert(corpusRows(StreamingRelease.currentRelease(outRoot, base)) == before)

    // a batch id BELOW the committed HEAD is not a re-delivery — it means
    // the checkpoint was reset against this outRoot, and silently dropping
    // the delta would report success while losing data: fail loudly
    val regress = intercept[IllegalArgumentException] {
      StreamingRelease.applyBatch(spark, delta1, 0L, base, outRoot, MinTokens)
    }
    assert(regress.getMessage.contains("regressed"))
    assert(StreamingRelease.headGeneration(outRoot) == 2L)

    // a torn/empty HEAD heals to the highest generation on disk instead of
    // failing every entry point permanently
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$outRoot/HEAD"),
      Array.empty[Byte])
    assert(StreamingRelease.headGeneration(outRoot) == 2L)
    assert(StreamingRelease.currentRelease(outRoot, base) == s"$outRoot/gen=2")
    StreamingRelease.commitHead(outRoot, 2L) // restore a clean HEAD

    // retention: pruning below HEAD keeps HEAD readable
    StreamingRelease.prune(outRoot, keepFrom = 2L)
    assert(corpusRows(StreamingRelease.currentRelease(outRoot, base)) == before)
    assert(!new java.io.File(s"$outRoot/gen=0").exists())
  }
}
