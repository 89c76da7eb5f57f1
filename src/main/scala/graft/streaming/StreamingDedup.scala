package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.queries.TextOps

/** Ingest-time near-duplicate detection: the streaming counterpart of
  * `d_dedup_minhash`, for pipelines where documents arrive continuously and
  * each new document must be checked against everything already accepted.
  *
  * State is one [[StateStore]] under `stateDir` holding three tables in
  * the range-bucketed manifest layout (the same machinery the OSM diff
  * path maintains planet state with) plus a one-row watermark:
  *   bands/     (doc_id, band_idx, band_hash) — MinHash LSH bands
  *   shingles/  (doc_id, ss)                  — trigram sets, exact verify
  *   decisions/ (doc_id, dup_of, jaccard, batch_id)
  *   batchmark/ (batch_id)                    — last applied foreachBatch id
  *
  * Per micro-batch (foreachBatch):
  *   1. band/shingle the new documents (same 12-hash/4-band family as the
  *      batch operator, so batch and stream agree on what "near-dup" means);
  *   2. candidates = new-bands ⋈ state-bands plus new ⋈ new (id-ordered) —
  *      the shuffle key is the band hash, never the pair space;
  *   3. verify candidates with exact trigram Jaccard ≥ threshold, keep each
  *      new doc's best match (highest jaccard, ties to the lowest id);
  *   4. delta-write only the id-buckets this batch touches (manifest
  *      carries untouched buckets forward), write the watermark, commit.
  *
  * Exactly-once across crashes, with no lakehouse dependency: foreachBatch
  * re-delivers a failed batch under the SAME batchId; the store version is
  * always `currentSeq + 1`, so a crash anywhere before `commit` replays
  * the whole batch into the same version dirs (torn dirs are invisible —
  * readers resolve through the committed manifest — and get overwritten),
  * and a crash after `commit` makes the replay a no-op (`batchId <=` the
  * committed watermark). This is the StateStore version of what a
  * Delta/Iceberg `txnAppId`/`txnVersion` write gives you on a managed
  * lakehouse.
  *
  * Scale: a long-running stream stays bounded — reads resolve one manifest
  * (≤ one dir per id bucket, never one per batch), each batch rewrites
  * only the few buckets its doc ids land in, and `StateStore.vacuum`
  * reclaims superseded version dirs.
  */
object StreamingDedup {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  private val bandsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("band_idx", IntegerType),
    StructField("band_hash", StringType)))

  private val setsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("ss", ArrayType(StringType))))

  private val decisionsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("dup_of", LongType),
    StructField("jaccard", DoubleType),
    StructField("batch_id", LongType)))

  /** A table at the committed version (resolved through its bucket
    * manifest); empty frame before the first commit. Version dirs past the
    * committed pointer are torn writes from a crashed batch and are
    * invisible here.
    */
  private def committedTable(spark: SparkSession, store: StateStore,
      name: String, seq: Long, schema: StructType): DataFrame =
    if (seq < 0)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else store.read(name, seq)

  /** All committed dup decisions. */
  def decisions(spark: SparkSession, stateDir: String): DataFrame = {
    val store = new StateStore(spark, stateDir)
    committedTable(spark, store, "decisions", store.currentSeq, decisionsSchema)
  }

  /** The accepted (survivor) corpus index — shingle sets per document. */
  def acceptedShingles(spark: SparkSession, stateDir: String): DataFrame = {
    val store = new StateStore(spark, stateDir)
    committedTable(spark, store, "shingles", store.currentSeq, setsSchema)
  }

  /** Last applied foreachBatch id, or -1 before the first commit. The
    * watermark is its own table because store versions are internal
    * sequence numbers (one per applied batch, also bumped by future
    * compactions) — they are not the streaming batch id.
    */
  private def committedBatch(spark: SparkSession, store: StateStore,
      seq: Long): Long =
    if (seq < 0) -1L
    else store.read("batchmark", seq).head().getLong(0)

  /** Cap on the batch band-hash IN list pushed into the state scan. A
    * micro-batch of ~1000 docs × 4 bands stays under it; a giant backfill
    * batch skips the filter and amortizes the full scan it would need
    * anyway. Deployments should set
    * `spark.sql.parquet.pushdown.inFilterThreshold` ≥ this value so the
    * list reaches parquet row-group stats (the filter is correct either
    * way — without pushdown it degrades to a post-scan filter).
    */
  private val MaxPrunedHashes = 4096

  /** New-vs-state candidate generation. The state table is bucketed by
    * doc_id (right for delta-writes) while the join key is (band_idx,
    * band_hash) — a plain join would therefore hash-SHUFFLE the entire
    * committed band index every micro-batch, a per-batch cost that grows
    * with the accepted corpus. Broadcasting the batch's bands instead makes
    * it a map-side broadcast hash join: the state side is scanned in place
    * and never exchanged, so per-batch shuffle cost is O(batch + matches),
    * not O(|state|).
    *
    * The scan term shrinks too: state band files are written sorted by
    * band_hash (see applyBatch's sortWithin), so pushing the batch's
    * distinct band hashes as an IN predicate lets parquet row-group
    * min/max stats skip every group holding none of them — a small batch
    * reads a small slice of a huge committed index.
    */
  private[streaming] def stateCandidates(stBands: DataFrame, nb: DataFrame,
      batchHashes: Array[String] = Array.empty): DataFrame = {
    val pruned =
      if (batchHashes.nonEmpty && batchHashes.length <= MaxPrunedHashes)
        stBands.filter(col("band_hash").isin(batchHashes.toSeq: _*))
      else stBands
    pruned.select(col("band_idx"), col("band_hash"), col("doc_id").as("old_id"))
      .join(broadcast(nb), Seq("band_idx", "band_hash"))
  }

  /** Process one batch of (doc_id, text): emit dup decisions, fold
    * survivors into the state index, commit. Exposed for testing; `run`
    * wires it into foreachBatch. Re-invoking with an already-committed
    * batchId is a no-op (crash-after-commit replay).
    */
  def applyBatch(batch: DataFrame, stateDir: String, batchId: Long,
      threshold: Double = 0.7): Unit = {
    val spark = batch.sparkSession
    val store = new StateStore(spark, stateDir)
    val committed = store.currentSeq
    if (batchId <= committedBatch(spark, store, committed)) return

    val prep = TextOps.minhashPrep(batch.select("doc_id", "text"))
    val bands = TextOps.minhashBandsOf(prep)
    val sets = prep.select(col("doc_id"), col("ss"))

    val stBands = committedTable(spark, store, "bands", committed, bandsSchema)
    val stSets = committedTable(spark, store, "shingles", committed, setsSchema)

    // candidate pairs (new_id, old_id): new-vs-state on shared band, and
    // new-vs-new id-ordered so each in-batch pair appears once
    val nb = bands.select(col("band_idx"), col("band_hash"),
      col("doc_id").as("new_id"))
    // the batch's distinct band hashes (control-plane sized: ≤ docs × 4
    // bands per micro-batch, capped) prune the committed-state scan
    val batchHashes = bands.select("band_hash").distinct()
      .limit(MaxPrunedHashes + 1).collect().map(_.getString(0))
    val vsState = stateCandidates(stBands, nb, batchHashes)
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
    val decisionRows = verified
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("new_id").as("doc_id"), col("old_id").as("dup_of"),
        col("jaccard"), lit(batchId).as("batch_id"))
      .persist()

    // one transaction: delta-write only the id-buckets this batch touches
    // (the manifest carries every untouched bucket forward), write the
    // watermark, commit the pointer — see the header's crash-replay argument
    val next = committed + 1
    val dupIds = decisionRows.select(col("doc_id"))
    val newSets = sets.join(dupIds, Seq("doc_id"), "left_anti")
    val newBands = bands.join(dupIds, Seq("doc_id"), "left_anti")
    // bands are written band_hash-sorted inside each bucket so the next
    // batch's pushed IN predicate can skip row groups (stateCandidates)
    if (committed < 0) {
      // hash buckets (not id-range bits): doc_ids are small and dense, so
      // a range scheme put the whole state in ONE bucket and the delta
      // reads never actually pruned; 256 hash buckets make a small batch
      // touch only its own documents' buckets
      store.setHashBuckets(256)
      store.writeBucketed("decisions", next, decisionRows, "doc_id")
      store.writeBucketed("shingles", next, newSets, "doc_id")
      store.writeBucketed("bands", next, newBands, "doc_id",
        sortWithin = Seq("band_hash"))
    } else {
      // merge-on-read segments: each batch appends only its own rows (its
      // doc_ids double as tombstones for replay idempotency); the store
      // auto-compacts into a fresh bucketed base every maxSegments batches
      def delta(name: String, rows: DataFrame,
          sortWithin: Seq[String] = Nil): Unit =
        store.writeDelta(name, next, committed, rows,
          rows.select(col("doc_id")), "doc_id", sortWithin)
      delta("decisions", decisionRows)
      delta("shingles", newSets)
      delta("bands", newBands, sortWithin = Seq("band_hash"))
    }
    store.write("batchmark", next,
      spark.range(1).select(lit(batchId).as("batch_id")))
    store.commit(next)

    decisionRows.unpersist()
    prep.unpersist()
  }

  /** Compaction: rewrite every state table's full content into ONE fresh
    * version and vacuum the rest. A long stream's manifests otherwise
    * point into one small dir per batch that ever touched each bucket —
    * dirs `vacuum` alone must keep because they are referenced — so file
    * count grows with batch count; after compact it is proportional to
    * bucket count again. Crash-safe for the same reason `applyBatch` is:
    * everything lands at `currentSeq + 1`, invisible until the commit, and
    * the read side (the committed manifests) is disjoint from the write
    * side (the new version dir). Run it between batches, not concurrently
    * with one — the store has a single committed pointer.
    */
  def compact(spark: SparkSession, stateDir: String): Unit = {
    val store = new StateStore(spark, stateDir)
    val committed = store.currentSeq
    if (committed < 0) return
    val next = committed + 1
    Seq("decisions" -> decisionsSchema, "shingles" -> setsSchema,
      "bands" -> bandsSchema).foreach { case (name, schema) =>
      store.writeBucketed(name, next,
        committedTable(spark, store, name, committed, schema), "doc_id",
        sortWithin = if (name == "bands") Seq("band_hash") else Nil)
    }
    store.write("batchmark", next, store.read("batchmark", committed))
    store.commit(next)
    store.vacuum(Seq("decisions", "shingles", "bands", "batchmark"), keep = 0)
  }

  /** Drain all available parquet files under `inputDir` as micro-batches
    * (Trigger.AvailableNow), maintaining state/output across restarts via
    * the streaming checkpoint + the store's committed pointer.
    */
  def run(spark: SparkSession, inputDir: String, stateDir: String,
      checkpointDir: String, threshold: Double = 0.7): Unit = {
    val stream = spark.readStream.schema(docSchema).parquet(inputDir)
    val q = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, stateDir, batchId, threshold)
      }
      .start()
    q.awaitTermination()
  }

  /** The composed streaming INGEST pipeline: Unicode canonicalization →
    * quality gate → near-dup detection, all inside one stream. The
    * transforms are stateless projections riding the micro-batch (no
    * extra streaming state), and they run BEFORE hashing by
    * construction — which is the point: a decomposed-accent re-encode of
    * an accepted document must hash identically (caught as a dup), and a
    * below-floor fragment must never reach the band index at all.
    * StreamingIngestSpec proves both, plus that the raw `run` would have
    * missed the re-encoded dup.
    */
  def runIngest(spark: SparkSession, inputDir: String, stateDir: String,
      checkpointDir: String, minTokens: Long = 5L,
      threshold: Double = 0.7): Unit = {
    graft.functions.VectorFunctions.register(spark)
    val stream = spark.readStream.schema(docSchema).parquet(inputDir)
      .withColumn("text", expr("text_norm(text, 'NFC')"))
      .filter(size(TextOps.tokensExpr) >= minTokens)
    val q = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, stateDir, batchId, threshold)
      }
      .start()
    q.awaitTermination()
  }
}
