package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic power-law (Zipfian) synthetic text corpus — the
  * vocabulary-shape fixture the driver's generator lacks.
  *
  * The sf* `documents` tables carry ~31 distinct word tokens per language,
  * so every shingle is a stop-shingle: frequency-sensitive operators
  * (prefix-filtered set-similarity join, BM25 idf, sketch saturation)
  * measure their degenerate small-vocabulary corner there instead of the
  * power-law distribution real corpora have (Zipf's law, exponent ≈ 1).
  * This generator draws each token from rank distribution P(r) ∝ 1/r^s
  * over a V-word vocabulary via inverse-CDF sampling, deterministically
  * seeded PER doc_id — regenerating any document needs only its id, which
  * is also how near-duplicate pairs are planted: a dup doc re-derives its
  * source doc's token stream from the source's seed and mutates a fixed
  * fraction of positions, giving true high-Jaccard pairs without storing
  * state.
  *
  * Scale shape: generation is one `spark.range(nDocs)` map — no shuffle,
  * embarrassingly parallel; the cumulative-probability table is V doubles
  * broadcast once. Output matches the `documents` schema (doc_id, text,
  * lang, source, n_chars) so every registered text query runs unchanged.
  */
object ZipfCorpus {

  /** Deterministic word for vocabulary rank `r`: 3-8 lowercase letters
    * from a rank-seeded RNG (alnum, so the suite's `[a-z0-9]+` tokenizer
    * and 5-char shingles see it whole). Collisions across ranks are
    * harmless (two ranks mapping to one string just merge their mass). */
  private def wordOf(r: Int, seed: Long): String = {
    val rng = new java.util.Random(seed * 0x9E3779B97F4A7C15L + r)
    val len = 3 + rng.nextInt(6)
    val sb = new java.lang.StringBuilder(len)
    var i = 0
    while (i < len) { sb.append(('a' + rng.nextInt(26)).toChar); i += 1 }
    sb.toString
  }

  /** Write `nDocs` documents to `outDir/documents.parquet`; returns the
    * number written. ~`dupFrac` of docs are mutated near-copies of the
    * previous doc (each position re-rolled with prob `mutate`), and a
    * smaller slice are EXACT copies — the dedup family's true-pair
    * inventory, reproducible from (seed, id) alone.
    */
  def generate(spark: SparkSession, outDir: String,
      nDocs: Long = 100000L, vocab: Int = 20000, exponent: Double = 1.07,
      seed: Long = 7L, dupFrac: Double = 0.15, mutate: Double = 0.10): Long = {
    import spark.implicits._
    require(nDocs > 0 && vocab > 1)
    // inverse-CDF table: cum(r) = Σ_{k≤r} k^-s, normalized — V doubles,
    // built once on the driver and broadcast with the task closure
    val cum = new Array[Double](vocab)
    var acc = 0.0
    var r = 0
    while (r < vocab) { acc += math.pow(r + 1.0, -exponent); cum(r) = acc; r += 1 }
    val total = acc
    val words = Array.tabulate(vocab)(wordOf(_, seed))
    val dupMod = math.max(2, math.round(1.0 / math.max(dupFrac, 1e-9)).toInt)
    val langs = Array("en", "de", "fr")
    val genSeed = seed

    val docs = spark.range(nDocs).map { id =>
      def sample(rng: java.util.Random): Int = {
        val u = rng.nextDouble() * total
        var lo = 0; var hi = vocab - 1
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (cum(mid) < u) lo = mid + 1 else hi = mid
        }
        lo
      }
      def tokensOf(docId: Long): Array[Int] = {
        val rng = new java.util.Random(genSeed ^ (docId * 0x9E3779B97F4A7C15L))
        Array.fill(40 + rng.nextInt(260))(sample(rng))
      }
      // dup plan: id % dupMod == 1 → near-dup of id-1 (mutate a fraction
      // of positions); id % (dupMod * 5) == 2 → exact copy of id-2
      val toks =
        if (id % dupMod == 1 && id > 0) {
          val base = tokensOf(id - 1)
          val rng = new java.util.Random(genSeed ^ (id * 0x51AF27D1L) + 13)
          base.map(t => if (rng.nextDouble() < mutate) sample(rng) else t)
        } else if (id % (dupMod.toLong * 5) == 2 && id > 1) tokensOf(id - 2)
        else tokensOf(id)
      val rng2 = new java.util.Random(genSeed ^ (id * 0xC2B2AE3D5L))
      val text = toks.map(words(_)).mkString(" ")
      (id, text, langs(rng2.nextInt(langs.length)),
        s"zipf${rng2.nextInt(4)}", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    nDocs
  }
}
