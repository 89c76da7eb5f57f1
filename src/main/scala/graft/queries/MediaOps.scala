package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Oracle-backed surface of the multimodal plumbing (operators/Multimodal).
  *
  * The stub decoder is pure byte arithmetic and the fabricated payloads are
  * ASCII, so DuckDB can mirror it with ascii()/substr() — giving the
  * mapPartitions path a full value-level correctness gate, not just a
  * rows-only check.
  */
object MediaOps {

  private def mediaFeatures(s: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(Multimodal.mediaFromDocuments(s, dir))
      .toDF()
      .select(col("doc_id"), col("media_type"), col("width"), col("height"),
        col("channels"), col("n_frames"), col("n_bytes"), col("brightness"))
      .orderBy("doc_id")

  private def frameSample(s: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(Multimodal.mediaFromDocuments(s, dir))
      .toDF()
      .orderBy("doc_id", "frame_idx")

  val queries: Map[String, QueryFn] = Map(
    "m_media_features" -> (mediaFeatures _),
    "m_frame_sample"   -> (frameSample _)
  )

  val oracles: Map[String, String] = Map(
    "m_media_features" ->
      s"""SELECT doc_id,
         | CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
         | (16 + ascii(substr(text, 1, 1)) % 64)::BIGINT AS width,
         | (16 + ascii(substr(text, 2, 1)) % 64)::BIGINT AS height,
         | (CASE WHEN doc_id % 3 = 1 THEN 1 ELSE 3 END)::BIGINT AS channels,
         | (CASE WHEN doc_id % 3 = 2 THEN len(text) // ${Multimodal.FrameStride} + 1 ELSE 1 END)::BIGINT AS n_frames,
         | len(text)::BIGINT AS n_bytes,
         | list_sum(list_transform(generate_series(1, len(text)),
         |   i -> ascii(substr(text, i::INT, 1))))::DOUBLE / len(text)::DOUBLE AS brightness
         |FROM documents ORDER BY doc_id""".stripMargin,
    "m_frame_sample" ->
      s"""SELECT doc_id, f::BIGINT AS frame_idx,
         | md5(substr(text, (f * ${Multimodal.FrameStride} + 1)::INT, ${Multimodal.FrameStride})) AS frame_md5
         |FROM documents, unnest(generate_series(0, len(text) // ${Multimodal.FrameStride})) AS t(f)
         |WHERE doc_id % 3 = 2
         |ORDER BY doc_id, frame_idx""".stripMargin
  )
}
