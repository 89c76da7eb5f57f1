package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The corpus-release pipeline as a runnable tool (the `corpus` CLI
  * subcommand) — the training-data side's analog of the OSM `import`
  * command: compose the gates the oracle-backed queries verify
  * individually into one job that writes a publishable dataset.
  *
  *   quality gate (min token count) → exact dedup (keep the lowest
  *   doc_id per text hash) → deterministic train/val/test split (a pure
  *   function of the doc id — appends never move a doc across splits) →
  *   split-partitioned parquet + a (split, lang) manifest.
  *
  * Shapes at scale: one corpus-sized shuffle (the dedup aggregate),
  * executed ONCE — the kept frame is persisted while the corpus write,
  * the state write, the manifest write, and the manifest rows all
  * consume it, then unpersisted; the returned manifest is a local
  * relation (splits × languages rows), so callers can collect or show
  * it without re-running the pipeline. The output is
  * `partitionBy(split)` so a trainer reads its split by directory
  * pruning. The gate/dedup/split logic is LITERALLY the code the
  * d_release_manifest and d_split oracles check
  * (graft.queries.TextOps.releaseKept), so the tool's semantics are
  * transitively oracle-gated.
  *
  * The release also persists `state/` — every GATED doc, winners and
  * dedup losers alike, with its text hash. That is the release's
  * element cache (the role reference cache/ plays for OSM diffs): it is
  * what lets `applyDelta` resurrect a duplicate's loser when the winner
  * is deleted, keeping incremental maintenance EXACTLY equivalent to a
  * batch rebuild (CorpusDeltaSpec proves frame equality).
  */
object CorpusRelease {

  /** Data-contract checks a release input must pass under `-strict`:
    * empty payloads, broken ids, duplicate ids. ONE conditional-aggregate
    * scan (the d_validate shape); returns only the violated checks. */
  def contractViolations(docs: DataFrame): Seq[(String, Long)] = {
    val r = docs.agg(
      sum(when(col("text").isNull || length(col("text")) === 0, 1L)
        .otherwise(0L)).as("empty_text"),
      sum(when(col("doc_id").isNull || col("doc_id") < 0, 1L)
        .otherwise(0L)).as("bad_id"),
      (count(lit(1)) - countDistinct(col("doc_id"))).as("dup_ids")).head()
    Seq("empty_text", "bad_id", "dup_ids").zipWithIndex
      .map { case (n, i) => (n, r.getLong(i)) }
      .filter(_._2 > 0)
  }

  /** Fail fast (before any write) when the input breaks the contract. */
  private def enforce(docs: DataFrame, what: String): Unit = {
    val v = contractViolations(docs)
    require(v.isEmpty, s"strict $what validation failed: " +
      v.map { case (n, c) => s"$n=$c" }.mkString(", "))
  }

  /** Run the release; returns the (split, lang, n_docs, n_tokens)
    * manifest (also written as JSON next to the corpus) as a local
    * relation — already computed, safe to collect.
    */
  /** Writes into a read path destroy the inputs before the lazy frames
    * reading them materialize (persist() is not an execution barrier) —
    * an in-place refresh would delete prevDir/corpus mid-plan. Refuse
    * up front; release to a fresh dir and rotate, like DeployRotate. */
  private def requireDistinctDirs(readDir: String, writeDir: String,
      what: String): Unit =
    require(
      new java.io.File(readDir).getCanonicalPath !=
        new java.io.File(writeDir).getCanonicalPath,
      s"$what: output dir must differ from the input dir " +
        s"(mode(overwrite) deletes the input before the lazy read " +
        s"materializes); write to a fresh dir and rotate")

  def run(spark: SparkSession, inDir: String, outDir: String,
      minTokens: Long = 50L, strict: Boolean = false): DataFrame = {
    requireDistinctDirs(inDir, outDir, "corpus release")
    val docs = spark.read.parquet(s"$inDir/documents.parquet")
    if (strict) enforce(docs, "input")
    val gated = graft.queries.TextOps.releaseGated(docs, minTokens)
      .persist()
    try {
      val kept = graft.queries.TextOps.releaseWinnersOf(gated)
        .drop("bucket") // internal split-hash detail; split is the contract
        .persist()
      try writeRelease(spark, kept, gated, outDir)
      finally kept.unpersist()
    } finally gated.unpersist()
  }

  /** Incremental release maintenance — the diff pipeline for corpora.
    *
    * `deltaDir/documents.parquet` holds upserts (full doc rows; an
    * existing doc_id is replaced — delete-then-insert, the OSM diff
    * rule); optional `deltaDir/deletes.parquet` holds (doc_id) removals.
    *
    * Cost model (the point of the incremental path): every SHUFFLE is
    * delta-sized — the gate runs on the upserts only, the dedup
    * re-resolution touches only hashes present in the delta (a
    * broadcast semi-join carves that slice out of the state), and the
    * rest of the previous release is carried over by an anti join
    * against the same broadcast. The corpus/state rewrite is linear
    * I/O, no data-sized exchange. For a delta too large to broadcast,
    * drop the hints and the same plan runs with shuffle joins.
    *
    * Returns the new manifest (local relation, like `run`).
    */
  def applyDelta(spark: SparkSession, prevDir: String, deltaDir: String,
      outDir: String, minTokens: Long = 50L,
      strict: Boolean = false): DataFrame = {
    requireDistinctDirs(deltaDir, outDir, "corpus delta")
    val upserts = spark.read.parquet(s"$deltaDir/documents.parquet")
    val deletesPath = new java.io.File(s"$deltaDir/deletes.parquet")
    val deletes =
      if (deletesPath.exists)
        spark.read.parquet(deletesPath.getPath).select("doc_id")
      else spark.emptyDataFrame.withColumn("doc_id", lit(0L)).limit(0)
    applyDeltaFrames(spark, prevDir, upserts, deletes, outDir, minTokens,
      strict)
  }

  /** [[applyDelta]] with the delta supplied as frames instead of a
    * directory — the entry point the streaming release maintenance
    * (streaming/StreamingRelease) drives per micro-batch.
    */
  def applyDeltaFrames(spark: SparkSession, prevDir: String,
      upserts: DataFrame, deletes: DataFrame, outDir: String,
      minTokens: Long = 50L, strict: Boolean = false): DataFrame = {
    requireDistinctDirs(prevDir, outDir, "corpus delta")
    val state = spark.read.parquet(s"$prevDir/state")
    val prev = spark.read.parquet(s"$prevDir/corpus")
    if (strict) enforce(upserts, "delta")

    // delete-then-insert: an upserted id's old row is removed first
    val removed = deletes.union(upserts.select("doc_id")).distinct()
    val gatedNew = graft.queries.TextOps.releaseGated(upserts, minTokens)
      .persist()
    try {
      val state1 = state
        .join(broadcast(removed), Seq("doc_id"), "left_anti")
        .unionByName(gatedNew)
        .persist()
      try {
        // hashes whose winner may change: everything the delta inserts,
        // plus the hashes of every removed row (winner deletion must
        // resurrect the state's surviving loser)
        val touched = gatedNew.select("text_hash")
          .union(state.join(broadcast(removed), Seq("doc_id"), "left_semi")
            .select("text_hash"))
          .distinct().persist()
        try {
          val slice = state1.join(broadcast(touched), Seq("text_hash"),
            "left_semi")
          val winners = graft.queries.TextOps.releaseWinnersOf(slice)
            .drop("bucket")
          val untouched = prev.join(broadcast(touched), Seq("text_hash"),
            "left_anti")
          val corpus = untouched.unionByName(
            winners.select(untouched.columns.map(col): _*)).persist()
          try writeRelease(spark, corpus, state1, outDir)
          finally corpus.unpersist()
        } finally touched.unpersist()
      } finally state1.unpersist()
    } finally gatedNew.unpersist()
  }

  /** Write corpus (split-partitioned), state, and manifest; return the
    * manifest as a local relation. */
  private def writeRelease(spark: SparkSession, kept: DataFrame,
      gated: DataFrame, outDir: String): DataFrame = {
    kept.write.mode("overwrite").partitionBy("split")
      .parquet(s"$outDir/corpus")
    gated.write.mode("overwrite").parquet(s"$outDir/state")
    val manifest = graft.queries.TextOps.releaseManifestOf(kept)
    manifest.coalesce(1).write.mode("overwrite").json(s"$outDir/manifest")
    val rows = manifest.collect() // control-plane: splits×languages rows
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), manifest.schema)
  }
}
