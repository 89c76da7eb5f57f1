package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The power-law corpus the CORRECTNESS gate runs on — a fixed-path,
  * write-once materialization of [[ZipfCorpus]].
  *
  * Why a FIXED path instead of the FixtureArtifacts temp-dir cache: the
  * driver's DuckDB oracle pass runs AFTER the Verify JVM exits, and the
  * oracle SQL for the Zipf-gated queries reads this corpus directly via
  * `read_parquet('<absolute path>')` — so the fixture must (a) survive JVM
  * shutdown and (b) sit at a path both engines agree on at SQL-authoring
  * time. The path is keyed by every generation parameter, so a parameter
  * change lands in a fresh directory rather than silently reading a stale
  * corpus, and the content is bit-deterministic (per-doc_id seeding,
  * ZipfCorpusSpec), so two runs racing on the same path converge to the
  * same bytes.
  *
  * This closes the r8 gap that every frequency-sensitive CORRECTNESS row
  * ran only on the sf* corpus (~31 distinct words per language — all
  * stop-shingles): the hard gate now also sees realistic Zipfian document
  * frequencies (reference analog: its suites run on real OSM extracts,
  * test/completedb_test.go).
  */
object ZipfGateFixture {

  val NDocs = 5000L
  val Vocab = 20000
  val Seed = 7L

  /** Absolute fixture directory; embedded verbatim in the oracle SQL. */
  val dir: String = new java.io.File(
    sys.props.getOrElse("java.io.tmpdir", "/tmp"),
    s"graft-zipf-gate-n$NDocs-v$Vocab-s$Seed").getAbsolutePath

  /** Glob the DuckDB oracle reads (Spark part files only, no _SUCCESS). */
  val parquetGlob: String = s"$dir/documents.parquet/*.parquet"

  /** Read the fixture, generating it on first use. The marker is written
    * only after a complete generate, so a crash mid-write regenerates
    * (idempotent: the content is deterministic and the write overwrites).
    */
  def docs(s: SparkSession): DataFrame = synchronized {
    val marker = new java.io.File(dir, "_COMPLETE")
    if (!marker.exists() ||
        !new java.io.File(dir, "documents.parquet/_SUCCESS").exists()) {
      ZipfCorpus.generate(s, dir, nDocs = NDocs, vocab = Vocab, seed = Seed)
      marker.createNewFile()
    }
    s.read.parquet(s"$dir/documents.parquet")
  }
}
