package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Invariants for the positional-postings phrase search and the two
  * media-filter queries (CLIP-style alignment, byte-entropy screen).
  * Value-level equality vs DuckDB is covered by Verify + tools/check.py;
  * these assert the semantics the oracle mirror can't see — agreement
  * with an independent re-derivation and the filters' internal
  * consistency.
  */
class PhraseMediaFilterSpec extends SparkSpecBase {

  test("phrase matches agree with a direct token-array re-derivation") {
    // independent spelling: slide a window over the token array per doc
    // and count exact sequence hits — no postings, no joins
    val expected = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"),
        expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").as("toks"))
      .select(col("doc_id"), expr(
        """aggregate(sequence(1, greatest(size(toks) - 1, 1)),
          |  0L, (a, i) -> a + if(element_at(toks, i) = 'table' AND
          |    element_at(toks, i + 1) = 'hash', 1L, 0L))""".stripMargin)
        .as("n"))
      .filter(col("n") > 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = TextOps.queries("d_phrase_search")(spark, sf001)
      .filter(col("phrase") === "table hash")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_matches"))
      .toMap
    assert(got == expected, s"postings result drifted from direct scan")
  }

  test("phrase first_pos points at a real occurrence of the full phrase") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"),
        expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    TextOps.queries("d_phrase_search")(spark, sf001).collect().foreach { r =>
      val words = r.getAs[String]("phrase").split(" ")
      val toks = docs(r.getAs[Long]("doc_id"))
      val p = r.getAs[Long]("first_pos").toInt
      assert(toks.slice(p, p + words.length) == words.toSeq,
        s"first_pos $p does not start '${r.getAs[String]("phrase")}'")
    }
  }

  test("clip scores are valid cosines and the kept flag matches the threshold") {
    val rows = MediaOps.queries("m_clip_filter")(spark, sf001).collect()
    assert(rows.nonEmpty)
    val kept = rows.count(_.getAs[Long]("kept") == 1L)
    assert(kept > 0 && kept < rows.length,
      s"threshold is vacuous: $kept of ${rows.length} kept")
    rows.foreach { r =>
      val s = r.getAs[Double]("clip_r")
      // both stub embeddings are componentwise non-negative -> cosine in [0, 1]
      assert(s >= 0.0 && s <= 1.0 + 1e-9, s"cosine $s out of range")
      assert((r.getAs[Long]("kept") == 1L) == (s >= 0.88))
    }
  }

  test("entropy is bounded by log2(distinct values) and flags are consistent") {
    val rows = MediaOps.queries("m_image_entropy")(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getAs[Double]("entropy_r")
      val nd = r.getAs[Long]("n_distinct").toDouble
      assert(h >= 0.0 && h <= math.log(nd) / math.log(2.0) + 1e-6,
        s"entropy $h above log2($nd)")
      assert((r.getAs[Long]("low_info") == 1L) == (h < 4.05))
    }
  }

  test("KWIC snippets contain their phrase and match the occurrence count") {
    val kwic = TextOps.queries("d_phrase_kwic")(spark, sf001).collect()
    assert(kwic.nonEmpty)
    kwic.foreach { r =>
      assert(r.getAs[String]("snippet")
        .contains(r.getAs[String]("phrase")),
        s"snippet lost its phrase: $r")
    }
    val occ = kwic.groupBy(r =>
      (r.getAs[String]("phrase"), r.getAs[Long]("doc_id"))).map { case (k, v) =>
      k -> v.length.toLong }
    val agg = TextOps.queries("d_phrase_search")(spark, sf001).collect()
      .map(r => (r.getAs[String]("phrase"), r.getAs[Long]("doc_id")) ->
        r.getAs[Long]("n_matches")).toMap
    assert(occ == agg, "per-match rows disagree with the per-doc rollup")
  }

  test("served BM25 ranks by score and only returns docs with a query term") {
    val hits = TextOps.queries("d_search_bm25")(spark, sf001).collect()
    assert(hits.length == 10)
    val scores = hits.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Double]("score_r"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "scores not descending in rank order")
    val terms = Set("spark", "key", "dup")
    val texts = spark.read.parquet(s"$sf001/documents.parquet")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    hits.foreach { r =>
      val toks = texts(r.getAs[Long]("doc_id")).toLowerCase
        .split("[^a-z0-9]+").toSet
      assert(toks.intersect(terms).nonEmpty, s"hit without any query term: $r")
    }
  }

  test("FIM split partitions every doc: prefix+middle+suffix == tokens") {
    import org.apache.spark.sql.functions._
    val toksOf = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"),
        expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val rows = TextOps.queries("d_fim_split")(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, c1, c2) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("c1"),
        r.getAs[Long]("c2"))
      assert(1 <= c1 && c1 < c2 && c2 < n, s"degenerate cuts: $r")
      val toks = toksOf(r.getAs[Long]("doc_id"))
      val rendered = "<fim_prefix> " +
        toks.slice(0, c1.toInt).mkString(" ") +
        " <fim_suffix> " + toks.slice(c2.toInt, n.toInt).mkString(" ") +
        " <fim_middle> " + toks.slice(c1.toInt, c2.toInt).mkString(" ")
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(rendered.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      assert(md == r.getAs[String]("psm_md5"), s"render drifted for $r")
    }
  }

  test("watermark detector flags exactly the salted green-tail variants") {
    val rows = TextOps.queries("d_watermark_detect")(spark, sf001).collect()
    val flagged = rows.filter(_.getAs[Long]("watermarked") == 1L)
      .map(_.getAs[Long]("doc_id")).toSet
    val salted = rows.map(_.getAs[Long]("doc_id")).filter(_ >= 200000L).toSet
    assert(salted.nonEmpty, "fixture lost its watermarked variants")
    assert(flagged == salted,
      s"false pos: ${flagged.diff(salted)}; false neg: ${salted.diff(flagged)}")
    // the z gap is wide, not marginal: clean docs stay below 4 with margin
    rows.filter(_.getAs[Long]("doc_id") < 200000L).foreach { r =>
      assert(r.getAs[Double]("z_r") < 3.9, s"clean doc near threshold: $r")
    }
  }

  test("semantic packing partitions each cell's token mass contiguously") {
    val rows = Similarity.queries("s_pack_semantic")(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("cell")).foreach { case (cell, rs) =>
      val total = rs.map(_.getAs[Long]("n_tokens")).sum
      val maxEnd = rs.map(r =>
        r.getAs[Long]("tok_offset") + r.getAs[Long]("n_tokens")).max
      assert(maxEnd == total, s"cell $cell offsets not contiguous")
      // positions are a dense 1..n permutation within the cell
      val pos = rs.map(_.getAs[Long]("pos_in_cell")).sorted
      assert(pos.toSeq == (1L to rs.length).toSeq, s"cell $cell ranks not dense")
      rs.foreach { r =>
        assert(r.getAs[Long]("seq_idx") == r.getAs[Long]("tok_offset") / 512)
      }
    }
  }

  test("a uniform payload scores zero entropy; distinct bytes score log2(n)") {
    import spark.implicits._
    val fixture = Seq(
      (0L, "aaaaaaaaaaaaaaaa", "en", "src0", 16L), // uniform -> H = 0
      (3L, "abcdefgh", "en", "src0", 8L) // 8 distinct -> H = 3
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir =
      java.nio.file.Files.createTempDirectory("graft-entropy-").toString
    fixture.write.parquet(s"$dir/documents.parquet")
    val out = MediaOps.queries("m_image_entropy")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("entropy_r"))
      .toMap
    assert(out(0L) == 0.0)
    assert(math.abs(out(3L) - 3.0) < 1e-9)
  }
}
