package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

import graft.operators.TermIndex

/** Continuously-maintained inverted index: new document files drain as
  * micro-batches and each batch's postings land in the index artifact via
  * [[TermIndex.writeBatch]] — an overwrite of a deterministic `batch=<id>`
  * directory, so a foreachBatch re-delivery after a crash rewrites the
  * same files instead of double-appending (exactly-once without a
  * manifest; the streaming checkpoint provides the batch ids). Searches go
  * through the ordinary [[TermIndex.phraseSearch]] on the index root —
  * parquet partition discovery sees both levels (batch, then bucket) and
  * the bucket prune still applies, so a query reads only its terms'
  * buckets of each batch. [[TermIndex.compact]] folds all batches into
  * the reserved `batch=-1` directory (stream batch ids are never
  * negative, so future drains land beside it) — run it only between
  * drains: AvailableNow commits the checkpoint before returning, so no
  * committed batch can be re-delivered into the folded index.
  *
  * Scale: per micro-batch the work is tokenize + one bucket-partitioned
  * write of the BATCH (state is never read or shuffled — the index is
  * append-structured), so ingest cost tracks the delta, not the corpus.
  */
object StreamingIndexer {

  /** Drain all available files under `inputDir` (Trigger.AvailableNow)
    * into the index at `indexDir`, checkpointed for restart.
    */
  def run(spark: SparkSession, inputDir: String, indexDir: String,
      checkpointDir: String,
      nBuckets: Int = TermIndex.DefaultBuckets): Unit = {
    val stream = spark.readStream
      .schema(StreamingDedup.docSchema).parquet(inputDir)
    val q = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        TermIndex.writeBatch(batch, indexDir, batchId, nBuckets)
      }
      .start()
    q.awaitTermination()
  }
}
