package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Incremental release maintenance (CorpusRelease.applyDelta) — the
  * corpus analog of the OSM diff pipeline, with the binding property the
  * OSM side proves via completedb: INCREMENTAL == BATCH REBUILD, frame
  * for frame.
  */
class CorpusDeltaSpec extends SparkSpecBase {

  private val MinTokens = 20L

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  // sf0.001 has no exact-dup texts, so salt the input with copies
  // (id+500000, same text) — every copied text forms a dup group whose
  // winner is the ORIGINAL id; deleting those winners below forces the
  // resurrection path
  private lazy val raw = {
    val base = spark.read.parquet(s"$sf001/documents.parquet")
    base.unionByName(base.filter(col("doc_id") % 4 === 1)
      .withColumn("doc_id", col("doc_id") + 500000L))
  }

  private lazy val rawDir = {
    val d = tmp("graft-raw")
    raw.write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  /** Delta: updates to existing ids (text changed), brand-new ids, and
    * deletions — including the targeted winner-deletion case below. */
  private def upserts: DataFrame =
    raw.filter(col("doc_id") % 17 === 3)
      .withColumn("text", concat(lit("edited: "), col("text")))
      .unionByName(
        raw.filter(col("doc_id") % 13 === 2)
          .withColumn("doc_id", col("doc_id") + 900000L))

  private def deleteIds: DataFrame = {
    // ids with %23==5, PLUS every dedup winner that has a surviving loser
    // (so the rebuild-equality check exercises loser resurrection)
    val gated = graft.queries.TextOps.releaseGated(raw, MinTokens)
    val dupWinners = gated.groupBy("text_hash")
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n"))
      .filter(col("n") >= 2).select("doc_id")
    raw.filter(col("doc_id") % 23 === 5).select("doc_id")
      .union(dupWinners).distinct()
  }

  private def writeDelta(dir: String): Unit = {
    upserts.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    deleteIds.write.mode("overwrite").parquet(s"$dir/deletes.parquet")
  }

  /** The batch-rebuild reference input: raw minus removed ids plus the
    * upserts (delete-then-insert). */
  private def combinedRaw: DataFrame = {
    val removed = deleteIds.union(upserts.select("doc_id")).distinct()
    raw.join(removed, Seq("doc_id"), "left_anti").unionByName(upserts)
  }

  private def corpusRows(dir: String): Seq[String] =
    spark.read.parquet(s"$dir/corpus")
      .select(col("doc_id"), col("text_hash"), col("split"), col("n_tokens"))
      .collect().map(_.mkString("|")).toSeq.sorted

  test("applyDelta equals a batch rebuild, including loser resurrection") {
    val r1 = tmp("graft-r1")
    val delta = tmp("graft-delta")
    val r2 = tmp("graft-r2")
    val rRebuild = tmp("graft-rebuild")

    CorpusRelease.run(spark, rawDir, r1, MinTokens)
    writeDelta(delta)
    CorpusRelease.applyDelta(spark, r1, delta, r2, MinTokens)

    // sanity: the delta really removed and added rows
    val before = corpusRows(r1)
    val after = corpusRows(r2)
    assert(before != after)

    val rebuildIn = tmp("graft-rebuild-in")
    combinedRaw.write.mode("overwrite")
      .parquet(s"$rebuildIn/documents.parquet")
    CorpusRelease.run(spark, rebuildIn, rRebuild, MinTokens)
    assert(after == corpusRows(rRebuild))

    // the resurrection really happened: at least one deleted winner's
    // hash is still represented (by its loser) in the new corpus
    val gated = graft.queries.TextOps.releaseGated(raw, MinTokens)
    val dupHashes = gated.groupBy("text_hash")
      .agg(count(lit(1)).as("n")).filter(col("n") >= 2)
      .select("text_hash")
    val resurrected = spark.read.parquet(s"$r2/corpus")
      .join(dupHashes, Seq("text_hash"), "left_semi").count()
    assert(resurrected > 0, "no loser resurrection exercised")
  }

  test("applying the same delta twice is idempotent") {
    val r1 = tmp("graft-i1")
    val delta = tmp("graft-idelta")
    val r2 = tmp("graft-i2")
    val r3 = tmp("graft-i3")
    CorpusRelease.run(spark, rawDir, r1, MinTokens)
    writeDelta(delta)
    CorpusRelease.applyDelta(spark, r1, delta, r2, MinTokens)
    CorpusRelease.applyDelta(spark, r2, delta, r3, MinTokens)
    assert(corpusRows(r2) == corpusRows(r3))
  }

  test("manifest matches an independent recount of the written corpus") {
    val r1 = tmp("graft-m1")
    val delta = tmp("graft-mdelta")
    val r2 = tmp("graft-m2")
    CorpusRelease.run(spark, rawDir, r1, MinTokens)
    writeDelta(delta)
    val manifest = CorpusRelease.applyDelta(spark, r1, delta, r2, MinTokens)
      .collect().map(_.mkString("|")).toSeq.sorted
    val recount = spark.read.parquet(s"$r2/corpus")
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
      .collect().map(_.mkString("|")).toSeq.sorted
    assert(manifest == recount)
  }
  test("strict mode: clean input releases; a contract violation aborts") {
    val clean = tmp("graft-strict-ok")
    CorpusRelease.run(spark, rawDir, clean, MinTokens, strict = true)
    assert(spark.read.parquet(s"$clean/corpus").count() > 0)

    import spark.implicits._
    val badDir = tmp("graft-strict-bad")
    raw.unionByName(Seq((777000L, "")).toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("srcx"))
        .withColumn("n_chars", lit(0L)))
      .write.mode("overwrite").parquet(s"$badDir/documents.parquet")
    val out = tmp("graft-strict-out")
    val e = intercept[IllegalArgumentException] {
      CorpusRelease.run(spark, badDir, out, MinTokens, strict = true)
    }
    assert(e.getMessage.contains("empty_text"))
    // nothing was written before the failure
    assert(!new java.io.File(s"$out/corpus").exists())
  }

  test("in-place refresh is refused before anything is deleted") {
    // mode(overwrite) deletes the read path before the lazy frames
    // materialize — an in-place run/applyDelta would destroy the previous
    // release mid-write, so both refuse up front
    val rel = tmp("graft-inplace")
    CorpusRelease.run(spark, rawDir, rel, MinTokens)
    val preState = spark.read.parquet(s"$rel/state").count()
    val delta = tmp("graft-inplace-delta")
    writeDelta(delta)
    val e1 = intercept[IllegalArgumentException] {
      CorpusRelease.applyDelta(spark, rel, delta, rel, MinTokens)
    }
    assert(e1.getMessage.contains("output dir must differ"))
    val e2 = intercept[IllegalArgumentException] {
      CorpusRelease.applyDelta(spark, rel, delta, delta, MinTokens)
    }
    assert(e2.getMessage.contains("output dir must differ"))
    val e3 = intercept[IllegalArgumentException] {
      CorpusRelease.run(spark, rawDir, rawDir, MinTokens)
    }
    assert(e3.getMessage.contains("output dir must differ"))
    // the previous release is untouched by the refused calls
    assert(spark.read.parquet(s"$rel/state").count() == preState)
    assert(spark.read.parquet(s"$rel/corpus").count() > 0)
  }
}
