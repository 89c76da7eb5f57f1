package graft.streaming

import java.nio.file.Files

import graft.SparkSpecBase

/** The composed streaming ingest (canonicalize → gate → near-dup):
  * normalization must run BEFORE hashing (a decomposed-accent re-encode
  * of an accepted doc is a dup), the token floor must keep fragments out
  * of the band index, and the raw pipeline (no normalization) must
  * demonstrably MISS the re-encoded dup — the control that proves the
  * composition matters.
  */
class StreamingIngestSpec extends SparkSpecBase {

  // é in the MIDDLE token: every token trigram contains it, so without
  // normalization the decomposed re-encode shares NO shingle with the
  // original (jaccard 0), and with normalization it is byte-identical
  private val Composed  = "quiet mornings caf\u00e9 serves pastries daily"
  private val Decomposed = "quiet mornings cafe\u0301 serves pastries daily"

  private def writeBatch(dir: String, docs: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(dir)
  }

  private def acceptedIds(state: String): Set[Long] =
    StreamingDedup.acceptedShingles(spark, state)
      .select("doc_id").collect().map(_.getLong(0)).toSet

  private def decisionPairs(state: String): Set[(Long, Long)] =
    StreamingDedup.decisions(spark, state)
      .select("doc_id", "dup_of").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("normalize -> gate -> dedup: re-encoded dup caught, fragment dropped") {
    val root = Files.createTempDirectory("stream-ingest").toString
    val (in, state, ckpt) = (s"$root/in", s"$root/state", s"$root/ckpt")

    writeBatch(in, Seq(
      (1L, Composed),
      (2L, "completely different content about catalyst optimizer rules")))
    StreamingDedup.runIngest(spark, in, state, ckpt)
    assert(acceptedIds(state) == Set(1L, 2L))

    // batch 2: the decomposed re-encode of 1, plus a 3-token fragment
    writeBatch(in, Seq(
      (10L, Decomposed),
      (11L, "too short fragment")))
    StreamingDedup.runIngest(spark, in, state, ckpt)

    assert(decisionPairs(state) == Set((10L, 1L)),
      s"expected exactly the re-encode flagged, got ${decisionPairs(state)}")
    assert(acceptedIds(state) == Set(1L, 2L)) // 10 is a dup, 11 was gated out
  }

  test("control: the raw pipeline misses the decomposed re-encode") {
    val root = Files.createTempDirectory("stream-ingest-raw").toString
    val (in, state, ckpt) = (s"$root/in", s"$root/state", s"$root/ckpt")
    writeBatch(in, Seq((1L, Composed)))
    StreamingDedup.run(spark, in, state, ckpt)
    writeBatch(in, Seq((10L, Decomposed)))
    StreamingDedup.run(spark, in, state, ckpt)
    assert(decisionPairs(state).isEmpty,
      "raw pipeline unexpectedly matched byte-distinct forms")
    assert(acceptedIds(state) == Set(1L, 10L))
  }
}
