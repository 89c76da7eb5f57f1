package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Ingest-time near-dup detection across micro-batches: in-batch pairs,
  * cross-batch pairs against accepted state, survivor-only state growth,
  * and agreement with the batch MinHash operator's verdicts.
  */
class StreamingDedupSpec extends SparkSpecBase {

  private val base = "the quick brown fox jumps over the lazy dog while the " +
    "patient cat watches from the tall garden fence near the old stone wall " +
    "as evening settles quietly over the sleepy little village"

  private def doc(id: Long, text: String) = (id, text)

  private def writeBatch(dir: String, docs: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(dir)
  }

  test("near-dups are flagged in-batch, cross-batch, and not for uniques") {
    val root = Files.createTempDirectory("stream-dedup").toString
    val (in, state, out, ckpt) =
      (s"$root/in", s"$root/state", s"$root/out", s"$root/ckpt")

    // batch 1: 10 is unique, 11 ~ 10 (one word changed), 12 unrelated
    writeBatch(in, Seq(
      doc(10, base),
      doc(11, base.replace("sleepy", "noisy")),
      doc(12, "completely different text about spark catalyst optimizer " +
        "rules and whole stage code generation for columnar execution " +
        "plans that pipeline operators into single compiled functions")))
    StreamingDedup.run(spark, in, state, out, ckpt)

    val out1 = spark.read.parquet(out).collect()
    assert(out1.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("dup_of")))
      .toSet == Set((11L, 10L)), s"batch1 decisions: ${out1.toSeq}")

    // survivors only: the accepted index holds 10 and 12, not 11
    val stateIds = spark.read.parquet(s"$state/shingles")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(stateIds == Set(10L, 12L))

    // batch 2: 20 ~ 10 from batch 1 (cross-batch), 21 unique
    writeBatch(in, Seq(
      doc(20, base.replace("quietly", "gently")),
      doc(21, "yet another unrelated document describing minutely osm " +
        "replication diffs applied transactionally with expire tile " +
        "outputs and generalized table refreshes after each change file")))
    StreamingDedup.run(spark, in, state, out, ckpt)

    val out2 = spark.read.parquet(out).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("dup_of"))).toSet
    assert(out2 == Set((11L, 10L), (20L, 10L)), s"decisions after batch2: $out2")

    val stateIds2 = spark.read.parquet(s"$state/shingles")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(stateIds2 == Set(10L, 12L, 21L))

    // checkpointed: a third run with no new files must not re-emit
    StreamingDedup.run(spark, in, state, out, ckpt)
    assert(spark.read.parquet(out).count() == 2)
  }

  test("stream verdicts agree with the batch minhash operator") {
    import spark.implicits._
    val root = Files.createTempDirectory("stream-dedup-agree").toString
    val docs = Seq(
      doc(1, base), doc(2, base.replace("evening", "morning")),
      doc(3, "short unrelated text with just enough words to form a few " +
        "proper trigram shingles for the hashing stage"))
    writeBatch(s"$root/in", docs)
    StreamingDedup.run(spark, s"$root/in", s"$root/state", s"$root/out",
      s"$root/ckpt")
    val streamPairs = spark.read.parquet(s"$root/out")
      .select(col("dup_of"), col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // batch operator on the same corpus (persisted docs table not needed:
    // reuse the internals the stream shares)
    val prep = graft.queries.TextOps.minhashPrep(docs.toDF("doc_id", "text"))
    val bands = graft.queries.TextOps.minhashBandsOf(prep)
    val cand = bands.as("a").join(bands.as("b"),
        Seq("band_idx", "band_hash"))
      .filter($"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("a_id"), $"b.doc_id".as("b_id")).distinct()
    val sets = prep.select(col("doc_id"), col("ss"))
    val batchPairs = cand
      .join(sets.select(col("doc_id").as("a_id"), col("ss").as("a_ss")), Seq("a_id"))
      .join(sets.select(col("doc_id").as("b_id"), col("ss").as("b_ss")), Seq("b_id"))
      .withColumn("j",
        size(array_intersect(col("a_ss"), col("b_ss"))).cast("double") /
          (size(col("a_ss")) + size(col("b_ss")) -
            size(array_intersect(col("a_ss"), col("b_ss")))).cast("double"))
      .filter(col("j") >= 0.7)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    prep.unpersist()
    assert(streamPairs == batchPairs,
      s"stream=$streamPairs batch=$batchPairs")
  }
}
