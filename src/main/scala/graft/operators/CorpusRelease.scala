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
  * Shapes at scale: one corpus-sized shuffle (the dedup aggregate); the
  * split is a per-row hash; the output is `partitionBy(split)` so a
  * trainer reads its split by directory pruning; the manifest has
  * splits×languages rows. The gate/split spellings are the SAME code the
  * d_corpus_pipeline / d_split / d_release_manifest oracles check, so
  * the tool's semantics are transitively oracle-gated.
  */
object CorpusRelease {

  /** Run the release; returns the (split, lang, n_docs, n_tokens)
    * manifest (also written as JSON next to the corpus).
    */
  def run(spark: SparkSession, inDir: String, outDir: String,
      minTokens: Long = 50L): DataFrame = {
    val docs = spark.read.parquet(s"$inDir/documents.parquet")
    val base = docs
      .withColumn("n_tokens", size(graft.queries.TextOps.tokensExpr).cast("long"))
      .filter(col("n_tokens") >= minTokens)
    val survivors = base.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val kept = graft.queries.TextOps.withSplit(base.join(survivors, Seq("doc_id")))
    kept.write.mode("overwrite").partitionBy("split")
      .parquet(s"$outDir/corpus")
    val manifest = kept.groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      .orderBy("split", "lang")
    manifest.coalesce(1).write.mode("overwrite").json(s"$outDir/manifest")
    manifest
  }
}
