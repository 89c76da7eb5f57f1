package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.queries.TextOps

/** Ingest-time near-duplicate detection: the streaming counterpart of
  * `d_dedup_minhash`, for pipelines where documents arrive continuously and
  * each new document must be checked against everything already accepted.
  *
  * State (parquet under `stateDir`) is the accepted-corpus index:
  *   bands/    (doc_id, band_idx, band_hash) — MinHash LSH bands
  *   shingles/ (doc_id, ss)                  — trigram sets for exact verify
  *
  * Per micro-batch (foreachBatch):
  *   1. band/shingle the new documents (same 12-hash/4-band family as the
  *      batch operator, so batch and stream agree on what "near-dup" means);
  *   2. candidates = new-bands ⋈ state-bands plus new ⋈ new (id-ordered) —
  *      the shuffle key is the band hash, never the pair space;
  *   3. verify candidates with exact trigram Jaccard ≥ threshold, keep each
  *      new doc's best match (highest jaccard, ties to the lowest id);
  *   4. append decisions to `outDir`; append ONLY survivors (non-dups) to
  *      the state index, so state size tracks the unique corpus.
  *
  * Scale: state is partitioned parquet joined on high-cardinality band
  * hashes — the same shape the batch dedup shuffles on; at fleet scale the
  * band table would live id-bucketed (StateStore-style) so the per-batch
  * join prunes buckets. Replay: parquet append is not transactional, so an
  * exactly-once deployment puts state+output on a Delta/Iceberg-style sink
  * keyed by `batch_id` (recorded in every row here for that purpose).
  */
object StreamingDedup {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  private def readOrEmpty(spark: SparkSession, dir: String,
      schema: StructType): DataFrame =
    if (new java.io.File(dir).isDirectory)
      spark.read.schema(schema).parquet(dir)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  private val bandsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("band_idx", IntegerType),
    StructField("band_hash", StringType)))

  private val setsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("ss", ArrayType(StringType))))

  /** Process one batch of (doc_id, text): emit dup decisions, fold
    * survivors into the state index. Exposed for testing; `run` wires it
    * into foreachBatch.
    */
  def applyBatch(batch: DataFrame, stateDir: String, outDir: String,
      batchId: Long, threshold: Double = 0.7): Unit = {
    val spark = batch.sparkSession
    val prep = TextOps.minhashPrep(batch.select("doc_id", "text"))
    val bands = TextOps.minhashBandsOf(prep)
    val sets = prep.select(col("doc_id"), col("ss"))

    val stBands = readOrEmpty(spark, s"$stateDir/bands", bandsSchema)
    val stSets = readOrEmpty(spark, s"$stateDir/shingles", setsSchema)

    // candidate pairs (new_id, old_id): new-vs-state on shared band, and
    // new-vs-new id-ordered so each in-batch pair appears once
    val nb = bands.select(col("band_idx"), col("band_hash"),
      col("doc_id").as("new_id"))
    val vsState = nb.join(
      stBands.select(col("band_idx"), col("band_hash"), col("doc_id").as("old_id")),
      Seq("band_idx", "band_hash"))
    val vsBatch = nb.join(
      bands.select(col("band_idx"), col("band_hash"), col("doc_id").as("old_id")),
      Seq("band_idx", "band_hash"))
      .filter(col("old_id") < col("new_id"))
    val cand = vsState.unionByName(vsBatch)
      .select("new_id", "old_id").distinct()

    // exact-verify against the union of state + in-batch shingle sets
    val allSets = stSets.unionByName(sets)
    val verified = cand
      .join(sets.select(col("doc_id").as("new_id"), col("ss").as("a_ss")), Seq("new_id"))
      .join(allSets.select(col("doc_id").as("old_id"), col("ss").as("b_ss")), Seq("old_id"))
      .withColumn("n_common", size(array_intersect(col("a_ss"), col("b_ss"))).cast("long"))
      .withColumn("n_union",
        (size(col("a_ss")) + size(col("b_ss"))).cast("long") - col("n_common"))
      .withColumn("jaccard",
        col("n_common").cast("double") / col("n_union").cast("double"))
      .filter(col("jaccard") >= threshold)

    // each new doc keeps its best match; in-batch chains resolve to the
    // earliest id because ties and transitive members all verify vs it
    val w = Window.partitionBy("new_id").orderBy(col("jaccard").desc, col("old_id"))
    val decisions = verified
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("new_id").as("doc_id"), col("old_id").as("dup_of"),
        col("jaccard"), lit(batchId).as("batch_id"))
      .persist()

    decisions.write.mode(SaveMode.Append).parquet(outDir)

    val dupIds = decisions.select(col("doc_id"))
    val survivors = sets.join(dupIds, Seq("doc_id"), "left_anti")
    survivors.write.mode(SaveMode.Append).parquet(s"$stateDir/shingles")
    bands.join(dupIds, Seq("doc_id"), "left_anti")
      .write.mode(SaveMode.Append).parquet(s"$stateDir/bands")

    decisions.unpersist()
    prep.unpersist()
  }

  /** Drain all available parquet files under `inputDir` as micro-batches
    * (Trigger.AvailableNow), maintaining state/output across restarts via
    * the streaming checkpoint.
    */
  def run(spark: SparkSession, inputDir: String, stateDir: String,
      outDir: String, checkpointDir: String, threshold: Double = 0.7): Unit = {
    val stream = spark.readStream.schema(docSchema).parquet(inputDir)
    val q = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, stateDir, outDir, batchId, threshold)
      }
      .start()
    q.awaitTermination()
  }
}
