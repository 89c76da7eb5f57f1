package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  * the manifest write, and the manifest rows all consume it, then
  * unpersisted; the returned manifest is a local relation (splits ×
  * languages rows), so callers can collect or show it without
  * re-running the pipeline. The output is `partitionBy(split)` so a
  * trainer reads its split by directory pruning. The gate/dedup/split
  * logic is LITERALLY the code the d_release_manifest and d_split
  * oracles check (graft.queries.TextOps.releaseKept), so the tool's
  * semantics are transitively oracle-gated.
  */
object CorpusRelease {

  /** Run the release; returns the (split, lang, n_docs, n_tokens)
    * manifest (also written as JSON next to the corpus) as a local
    * relation — already computed, safe to collect.
    */
  def run(spark: SparkSession, inDir: String, outDir: String,
      minTokens: Long = 50L): DataFrame = {
    val docs = spark.read.parquet(s"$inDir/documents.parquet")
    val kept = graft.queries.TextOps.releaseKept(docs, minTokens)
      .drop("bucket") // internal split-hash detail; split is the contract
      .persist()
    try {
      kept.write.mode("overwrite").partitionBy("split")
        .parquet(s"$outDir/corpus")
      val manifest = graft.queries.TextOps.releaseManifestOf(kept)
      manifest.coalesce(1).write.mode("overwrite").json(s"$outDir/manifest")
      val rows = manifest.collect() // control-plane: splits×languages rows
      spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), manifest.schema)
    } finally kept.unpersist()
  }
}
