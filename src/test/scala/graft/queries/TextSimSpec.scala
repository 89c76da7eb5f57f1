package graft.queries

import graft.SparkSpecBase
import org.apache.spark.sql.Row

/** Invariant tests for the dedup / similarity / text-analysis operators.
  * (Value-level equality vs DuckDB is covered by Verify + tools/check.py;
  * here we assert the cross-operator semantics that the oracle can't see.)
  */
class TextSimSpec extends SparkSpecBase {

  private def run(name: String) =
    (TextOps.queries ++ Similarity.queries)(name)(spark, sf001)

  test("every text/similarity query runs and is non-empty on sf0.001") {
    (TextOps.queries ++ Similarity.queries).keys.foreach { name =>
      assert(run(name).count() > 0, s"$name returned no rows")
    }
  }

  test("exact dedup partitions the table: sum of copies == row count") {
    val total = run("d_dedup_exact").agg(Map("n_copies" -> "sum"))
      .collect()(0).getLong(0)
    val docs = spark.read.parquet(s"$sf001/documents.parquet").count()
    assert(total == docs)
  }

  test("minhash candidates (J>=0.7) are a subset of exact ngram pairs (J>0.5)") {
    val mh = run("d_dedup_minhash").select("a_id", "b_id").collect()
      .map { case Row(a: Long, b: Long) => (a, b) }.toSet
    val ng = run("d_dedup_ngram").select("a_id", "b_id").collect()
      .map { case Row(a: Long, b: Long) => (a, b) }.toSet
    assert(mh.subsetOf(ng), s"minhash pairs not in ngram pairs: ${mh.diff(ng)}")
  }

  test("ngram jaccard bounds and pair ordering") {
    run("d_dedup_ngram").collect().foreach { r =>
      val j = r.getAs[Double]("jaccard")
      assert(j > 0.5 && j <= 1.0)
      assert(r.getAs[Long]("a_id") < r.getAs[Long]("b_id"))
    }
  }

  test("simhash pairs respect the hamming threshold") {
    run("d_dedup_simhash").collect().foreach { r =>
      assert(r.getAs[Long]("hamming") <= 3)
      val x = r.getAs[Long]("a_sh") ^ r.getAs[Long]("b_sh")
      assert(java.lang.Long.bitCount(x) == r.getAs[Long]("hamming"))
    }
  }

  test("simhash signature is 64-bit; 4 disjoint 16-bit bands reconstruct it") {
    import org.apache.spark.sql.functions._
    val sigs = TextOps.simhashSigs(spark, sf001).cache()
    // the signature space must actually use the high bits (a 16-bit simhash
    // would leave bits 16..63 at zero for every doc)
    assert(sigs.filter(abs(col("simhash")) >= (1L << 16)).count() > 0,
      "no signature uses bits above 15 — banding space collapsed")
    val bands = TextOps.simhashBands(sigs).collect()
    bands.foreach { r =>
      val v = r.getAs[Long]("band_val")
      assert(v >= 0 && v <= 0xFFFFL, s"band value $v outside 16-bit range")
    }
    // the 4 bands partition the 64 bits exactly: shifting them back together
    // must reproduce the signature (two's complement included)
    bands.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, rs) =>
      val byIdx = rs.map(r => r.getAs[Int]("band_idx") -> r.getAs[Long]("band_val")).toMap
      val rebuilt = (0 until 4).map(b => byIdx(b) << (16 * b)).reduce(_ | _)
      assert(rebuilt == rs.head.getAs[Long]("simhash"))
    }
    sigs.unpersist()
  }

  test("ngram inverted index is df-capped: no posting list exceeds the cap") {
    import org.apache.spark.sql.functions._
    val inv = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"), TextOps.shingleExpr.as("ss"))
      .select(explode(col("ss")).as("s"))
      .groupBy("s").agg(count(lit(1)).as("df"))
    val capped = inv.filter(col("df") <= TextOps.NgramDfCap)
    val maxDf = capped.agg(max("df")).head.getLong(0)
    assert(maxDf <= TextOps.NgramDfCap)
    // the cap itself must be small enough that a single shuffle bucket stays
    // bounded: df<=K means a shingle contributes at most K(K-1)/2 candidates
    assert(TextOps.NgramDfCap <= 1000)
  }

  test("brute-force topk: 5 ranked neighbors per query, sims descending") {
    val rows = run("s_cosine_topk").collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == 10)
    byQ.values.foreach { rs =>
      assert(rs.length == 5)
      val sims = rs.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Double]("sim_r"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("LSH ANN results agree with brute force on shared (q, neighbor) pairs") {
    // Any neighbor the LSH index returns must score <= the brute-force rank-1
    // sim for that query, and identical (q,neighbor) pairs get identical sims.
    val bf = run("s_cosine_topk").collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Double]("sim_r")).toMap
    val best = bf.groupBy(_._1._1).map { case (q, m) => q -> m.values.max }
    run("s_ann_lsh").collect().foreach { r =>
      val q = r.getAs[Long]("q_id")
      val n = r.getAs[Long]("neighbor_id")
      val sim = r.getAs[Double]("sim_r")
      assert(sim <= best(q) + 1e-9)
      bf.get((q, n)).foreach(s => assert(s == sim))
    }
  }

  test("quality buckets cover all docs; counts are consistent") {
    val rows = run("d_quality").collect()
    assert(rows.forall(r => Set("too_short", "stopword_heavy", "punct_heavy", "ok")
      .contains(r.getAs[String]("quality_bucket"))))
    rows.foreach(r => assert(r.getAs[Long]("n_stop") <= r.getAs[Long]("n_tokens")))
  }

  test("repetition signals are internally consistent") {
    val rows = run("d_repetition").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nTok = r.getAs[Long]("n_tokens")
      val topW = r.getAs[Long]("top_word_n")
      val nBg = r.getAs[Long]("n_bigrams")
      val topB = r.getAs[Long]("top_bigram_n")
      val nTg = r.getAs[Long]("n_trigrams")
      val dupT = r.getAs[Long]("dup_trigram_n")
      // multiplicities are bounded by the n-gram counts they come from
      assert(topW >= (if (nTok > 0) 1L else 0L) && topW <= nTok)
      assert(topB <= nBg && dupT <= nTg && dupT >= 0)
      // adjacent n-gram counts: |bigrams| = max(n-1, 0), |trigrams| = max(n-2, 0)
      assert(nBg == math.max(nTok - 1, 0L))
      assert(nTg == math.max(nTok - 2, 0L))
      // a bigram repeated m times forces its two words to appear >= m times
      assert(topW >= topB)
      assert(Set("empty", "word_repetitive", "bigram_repetitive",
        "trigram_dupey", "ok").contains(r.getAs[String]("rep_bucket")))
    }
  }

  test("decontaminate covers exactly the non-benchmark docs, hits bounded") {
    val out = run("d_decontaminate").collect()
    val all = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = all.filterNot(_ % TextOps.DecontamBenchMod == 0)
    assert(out.map(_.getAs[Long]("doc_id")).toSet == expected)
    out.foreach { r =>
      val (hit, grams) = (r.getAs[Long]("n_hit"), r.getAs[Long]("n_grams"))
      assert(hit >= 0 && hit <= grams)
      assert(r.getAs[String]("decontam_bucket") ==
        (if (hit > 0) "contaminated" else "clean"))
    }
  }

  test("duplicate spans: cross-doc multiplicity and ratio accounting agree") {
    val spans = run("d_dedup_spans").collect()
    spans.foreach { r =>
      assert(r.getAs[String]("span_hash").length == 32)
      val (nd, no) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_occ"))
      assert(nd >= 2 && no >= nd)
    }
    val ratios = run("d_dup_ratio").collect()
    ratios.foreach { r =>
      val (w, d) = (r.getAs[Long]("n_windows"), r.getAs[Long]("n_dup_windows"))
      assert(w > 0 && d >= 0 && d <= w)
      assert(r.getAs[Double]("dup_ratio") == d.toDouble / w.toDouble)
    }
    // a window is "duplicated" iff its hash is a duplicate span, so the
    // per-doc dup-window total must equal the span inventory's occurrences
    assert(ratios.map(_.getAs[Long]("n_dup_windows")).sum ==
      spans.map(_.getAs[Long]("n_occ")).sum)
  }

  test("merged dup spans: maximal, disjoint, window-count-consistent") {
    val merged = run("d_dup_spans_merged").collect()
    val k = graft.queries.TextOps.SpanK
    merged.foreach { r =>
      val (s, e, n) = (r.getAs[Long]("start_tok"), r.getAs[Long]("end_tok"),
        r.getAs[Long]("n_windows"))
      // island of n consecutive windows of width k covers n + k - 1 tokens
      assert(s >= 1 && e == s + n + k - 2, s"bad extent: $r")
    }
    // maximality: consecutive islands of one doc are separated by at least
    // one non-duplicated window — in window-index space (sw = start_tok - 1,
    // ew = end_tok - k), island B must start ≥ 2 after island A ends (token
    // extents may still overlap: the windows are k tokens wide)
    merged.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, rows) =>
      rows.sortBy(_.getAs[Long]("start_tok")).sliding(2).foreach {
        case Array(a, b) =>
          val ewA = a.getAs[Long]("end_tok") - k
          val swB = b.getAs[Long]("start_tok") - 1
          assert(swB >= ewA + 2, s"islands touch: $a then $b")
        case _ =>
      }
    }
    // the merge is a regrouping of d_dup_ratio's duplicated windows: per-doc
    // window totals must agree exactly
    val perDoc = merged.groupBy(_.getAs[Long]("doc_id"))
      .map { case (d, rows) => d -> rows.map(_.getAs[Long]("n_windows")).sum }
    val fromRatio = run("d_dup_ratio").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_dup_windows"))
      .filter(_._2 > 0).toMap
    assert(perDoc.toMap == fromRatio)
  }

  test("keep-best survivors: partition of the corpus, argmax-token member") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet").count()
    val clusters = run("d_dedup_clusters").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    val toks = run("d_token_stats").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tokens")).toMap
    val out = run("d_dedup_keep_best").collect()
    assert(out.map(_.getAs[Long]("n_members")).sum == docs)
    out.foreach { r =>
      val (cid, sid) = (r.getAs[Long]("cluster_id"), r.getAs[Long]("survivor_id"))
      val members = clusters.collect { case (d, c) if c == cid => d } match {
        case s if s.isEmpty => Seq(cid) // singleton: its own cluster
        case s => s.toSeq
      }
      assert(members.contains(sid), s"survivor $sid not in cluster $cid")
      val best = members.map(toks).max
      assert(toks(sid) == best && r.getAs[Long]("survivor_tokens") == best)
      // tie-break: lowest doc_id among the max-token members
      assert(sid == members.filter(toks(_) == best).min)
    }
  }

  test("pii scrub catches emails, phones, ips, id runs; masks in order") {
    import spark.implicits._
    val recs = Seq(
      (1L, "contact bob.smith+spam@mail-host.example.org for details"),
      (2L, "call 25-989-741-2988 or 333-123-456-7890 now"),
      (3L, "server at 192.168.0.1 port open"),
      (4L, "order 123456 shipped to Customer#000000042"),
      (5L, "mix a@b.co 10.0.0.254 55-555-555-5555 9999"),
      (6L, "nothing sensitive here at all")
    ).toDF("rid", "txt")
    val out = TextOps.piiScrub(recs, "rid", "txt").collect()
      .map(r => r.getAs[Long]("rid") -> r).toMap
    def counts(id: Long) = (out(id).getAs[Long]("n_email"),
      out(id).getAs[Long]("n_phone"), out(id).getAs[Long]("n_ip"),
      out(id).getAs[Long]("n_idnum"))
    assert(counts(1L) == (1L, 0L, 0L, 0L))
    assert(counts(2L) == (0L, 2L, 0L, 0L))
    assert(counts(3L) == (0L, 0L, 1L, 0L))
    assert(counts(4L) == (0L, 0L, 0L, 2L))
    assert(counts(5L) == (1L, 1L, 1L, 1L))
    assert(counts(6L) == (0L, 0L, 0L, 0L))
    assert(out(1L).getAs[String]("redacted") ==
      "contact [EMAIL] for details")
    assert(out(4L).getAs[String]("redacted") ==
      "order [ID] shipped to Customer#[ID]")
    // staged masking: the phone is consumed by [PHONE], never re-counted
    // as a digit run; no digits survive in any redacted text
    assert(out(5L).getAs[String]("redacted") ==
      "mix [EMAIL] [IP] [PHONE] [ID]")
    out.values.foreach(r =>
      assert(!r.getAs[String]("redacted").exists(_.isDigit)))
  }

  test("lang id picks the argmax marker count") {
    run("d_lang_id").collect().foreach { r =>
      val counts = Map(
        "en" -> r.getAs[Long]("n_en"), "de" -> r.getAs[Long]("n_de"),
        "fr" -> r.getAs[Long]("n_fr"), "es" -> r.getAs[Long]("n_es"))
      val pred = r.getAs[String]("pred_lang")
      assert(counts(pred) == counts.values.max)
    }
  }

  test("paragraph dedup: block accounting and keep-first survivor counts") {
    import org.apache.spark.sql.functions._
    val out = run("d_dedup_paragraph").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_kept"), r.getAs[Long]("n_dropped"))).toMap
    // per doc: kept + dropped = total aligned blocks = (|toks|-1)/B + 1
    val blocks = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"), TextOps.tokensExpr.as("toks"))
      .select(col("doc_id"),
        (floor((size(col("toks")) - 1) / TextOps.ParaTokens) + 1).as("nb"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("nb")).toMap
    blocks.foreach { case (id, nb) =>
      // a doc whose every paragraph first occurred elsewhere is dropped
      // from the output entirely (the "document left empty" case)
      out.get(id).foreach { case (k, d) =>
        assert(k + d == nb, s"doc $id: kept $k + dropped $d != $nb blocks")
      }
    }
    // keep-first: survivors across the corpus = distinct paragraph strings
    val distinctParas = spark.read.parquet(s"$sf001/documents.parquet")
      .select(TextOps.tokensExpr.as("toks"))
      .select(explode(expr(
        "transform(sequence(0, cast((size(toks) - 1) div 8 as int)), " +
          "p -> concat_ws(' ', slice(toks, p * 8 + 1, 8)))")).as("para"))
      .collect()
    assert(out.values.map(_._1).sum ==
      distinctParas.map(_.getString(0)).distinct.size)
  }

  test("char-LM score: position accounting and probability bounds") {
    val n = spark.read.parquet(s"$sf001/documents.parquet")
      .selectExpr("doc_id", "length(text) - 2 as np").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("np")).toMap
    val out = run("d_char_lm").collect()
    assert(out.length == n.size)
    out.foreach { r =>
      assert(r.getAs[Long]("n_pos") == n(r.getAs[Long]("doc_id")))
      val p = r.getAs[Double]("avg_p")
      assert(p > 0.0 && p <= 1.0, s"avg_p out of range: $p")
    }
  }

  test("lm buckets: exact tercile sizes, head scores dominate middle dominate tail") {
    val rows = run("d_lm_buckets").collect()
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      val n = rs.length.toLong
      val byBucket = rs.groupBy(_.getAs[String]("bucket"))
        .view.mapValues(_.map(_.getAs[Double]("avg_p"))).toMap
      assert(byBucket.getOrElse("head", Array.empty[Double]).length == n / 3,
        s"$lang head size")
      assert(byBucket.getOrElse("middle", Array.empty[Double]).length ==
        2 * n / 3 - n / 3, s"$lang middle size")
      // ranking is by avg_p desc: every head score >= every middle score, etc.
      for (Seq(hi, lo) <- Seq("head", "middle", "tail").sliding(2))
        (byBucket.get(hi), byBucket.get(lo)) match {
          case (Some(h), Some(l)) => assert(h.min >= l.max, s"$lang $hi < $lo")
          case _ =>
        }
    }
  }

  test("incremental dedup agrees with the all-pairs minhash ground truth") {
    val allPairs = run("d_dedup_minhash").collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    val rows = run("d_dedup_incremental").collect()
    val isBatch = (id: Long) => id % 10 == 9
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(isBatch(id))
      if (r.getAs[Boolean]("is_dup")) {
        val of = r.getAs[Long]("dup_of")
        // every dup decision is a true >=0.7 pair in the all-pairs run
        assert(allPairs.contains((math.min(id, of), math.max(id, of))),
          s"decision ($id dup_of $of) not in d_dedup_minhash")
        assert(r.getAs[Double]("jaccard") >= 0.7)
      } else {
        // a surviving batch doc has NO qualifying partner: not with any
        // accepted-corpus doc, not with an earlier batch doc
        allPairs.foreach { case (a, b) =>
          val partner = if (a == id) Some(b) else if (b == id) Some(a) else None
          partner.foreach { p =>
            assert(isBatch(p) && p > id,
              s"survivor $id has qualifying pair with $p")
          }
        }
      }
    }
  }

  test("cluster profile partitions the corpus; cohesion bounded") {
    val rows = run("s_cluster_profile").collect()
    val nVecs = spark.read.parquet(s"$sf001/embeddings.parquet").count()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == nVecs)
    rows.foreach { r =>
      val m = r.getAs[Double]("min_csim")
      assert(m >= -1.0 && m <= 1.0)
    }
  }

  test("knn graph: ranked, self-free, neighbors within one Hamming probe") {
    import org.apache.spark.sql.functions._
    val out = run("s_knn_graph").collect()
    // recompute the 8-anchor sign codes independently (dot via exact sums)
    val v = spark.read.parquet(s"$sf001/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val anchors = v.filter(_._1 < 8).toSeq.sortBy(_._1).map(_._2)
    def code(e: Array[Double]): Long =
      anchors.zipWithIndex.map { case (a, i) =>
        if (a.zip(e).map { case (x, y) => x * y }.sum > 0) 1L << i else 0L
      }.sum
    val codes = v.map { case (id, e) => id -> code(e) }
    out.groupBy(_.getAs[Long]("src_id")).foreach { case (src, rows) =>
      assert(rows.map(_.getAs[Long]("rnk")).sorted.sameElements(
        (1L to rows.length)), s"src $src ranks not dense from 1")
      rows.foreach { r =>
        val nb = r.getAs[Long]("neighbor_id")
        assert(nb != src)
        assert(java.lang.Long.bitCount(codes(src) ^ codes(nb)) <= 1,
          s"pair ($src,$nb) outside the Hamming-1 probe ring")
      }
    }
  }

  test("ffd packing: every doc placed once, bins within capacity and dense") {
    val out = run("d_pack_ffd").collect()
    val docs = spark.read.parquet(s"$sf001/documents.parquet").count()
    assert(out.length == docs, "every document packed exactly once")
    val cap = 256L
    out.foreach(r => assert(r.getAs[Long]("len") <= cap))
    out.groupBy(r => (r.getAs[Long]("grp"), r.getAs[Long]("bin")))
      .foreach { case ((g, b), rows) =>
        assert(rows.map(_.getAs[Long]("len")).sum <= cap,
          s"grp $g bin $b over capacity")
      }
    // bin ids dense 1..max per group (FFD never skips a bin index)
    out.groupBy(_.getAs[Long]("grp")).foreach { case (g, rows) =>
      val bins = rows.map(_.getAs[Long]("bin")).distinct.sorted
      assert(bins.sameElements(1L to bins.length), s"grp $g bins not dense")
    }
    // first-fit theorem: for any bins a < b, b's first item didn't fit a
    // when b opened and a only fills further, so fill_a + fill_b > cap —
    // checking the two smallest fills covers every pair
    out.groupBy(_.getAs[Long]("grp")).foreach { case (g, rows) =>
      val fills = rows.groupBy(_.getAs[Long]("bin"))
        .map { case (_, rs) => rs.map(_.getAs[Long]("len")).sum }.toSeq.sorted
      if (fills.length >= 2)
        assert(fills.head + fills(1) > cap,
          s"grp $g: two bins could merge — not first-fit")
    }
  }

  test("hard negatives: 5 ranked per anchor, never the anchor's own label") {
    import org.apache.spark.sql.functions._
    val labels = spark.read.parquet(s"$sf001/embeddings.parquet")
      .select(col("vec_id"), col("label").cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val out = run("s_hard_negatives").collect()
    out.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rows) =>
      assert(rows.map(_.getAs[Long]("rnk")).sorted.sameElements(1L to 5L))
      rows.foreach { r =>
        assert(r.getAs[Long]("neg_label") != labels(q),
          s"anchor $q mined a same-label 'negative'")
        assert(r.getAs[Long]("neg_label") ==
          labels(r.getAs[Long]("negative_id")))
      }
    }
  }

  test("dsir weights: target-domain docs score above the other sources") {
    val out = run("d_dsir_weight").collect()
    val (tgt, rest) = out.partition(_.getAs[String]("source") == "src0")
    assert(tgt.nonEmpty && rest.nonEmpty)
    def mean(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(_.getAs[Double]("dsir_r")).sum / rs.length
    assert(mean(tgt) > mean(rest),
      "target slice should be more target-like than the rest on average")
    out.foreach(r => assert(r.getAs[Double]("dsir_r") > 0.0))
  }

  test("sft render: mask spans ordered, inside the transcript, assistant-sized") {
    val out = run("d_sft_render").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getAs[Long]("n_chars")
      // mask columns ship comma-joined (driver-hashable) — split them back
      def spans(fld: String): Seq[Long] = {
        val s0 = r.getAs[String](fld)
        if (s0.isEmpty) Seq.empty else s0.split(',').toSeq.map(_.toLong)
      }
      val starts = spans("mask_starts")
      val ends = spans("mask_ends")
      assert(starts.length == ends.length)
      assert(r.getAs[Long]("n_turns") % 2 == 0, "conversations end on assistant")
      assert(starts.length * 2 == r.getAs[Long]("n_turns"),
        "one mask span per assistant turn")
      starts.zip(ends).foreach { case (s0, e0) =>
        assert(s0 < e0 && s0 >= 0 && e0 <= n, "span inside transcript")
      }
      // spans are disjoint and increasing
      starts.zip(ends).sliding(2).foreach {
        case Seq((_, e1), (s2, _)) => assert(e1 <= s2)
        case _ => ()
      }
      assert(starts.zip(ends).map { case (s0, e0) => e0 - s0 }.sum ==
        r.getAs[Long]("loss_chars"))
    }
  }

  test("domain cap: bounded-heap plan, at most CapK docs per source") {
    val df = run("d_domain_cap")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(!plan.contains("Window"), plan)
    val perSource = df.groupBy("source").count().collect()
    assert(perSource.nonEmpty)
    perSource.foreach(r => assert(r.getLong(1) <= TextOps.CapK))
  }

  test("curriculum positions are dense 0..n-1 and bands never decrease") {
    val rows = run("d_curriculum").collect()
    val n = spark.read.parquet(s"$sf001/documents.parquet").count()
    assert(rows.length == n)
    assert(rows.map(_.getAs[Long]("pos")).toSeq == (0L until n).toSeq)
    val bands = rows.map(_.getAs[Long]("band")).toSeq
    assert(bands == bands.sorted, "easy->hard band order is monotone")
  }

  test("snapshot diff statuses partition the id space consistently") {
    val rows = run("d_snapshot_diff").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap
    rows.foreach { case (id, st) =>
      val inV1 = id % 7 != 6
      val inV2 = id % 5 != 4
      val expected =
        if (!inV1 && inV2) "added"
        else if (inV1 && !inV2) "removed"
        else if (id % 3 == 0) "changed"
        else "same"
      assert(st == expected, s"doc $id: $st != $expected")
    }
    assert(Set("added", "removed", "changed", "same").subsetOf(rows.values.toSet))
  }

  test("leakage-safe split never strands a near-dup pair across splits") {
    val split = run("d_split_leakage_safe").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[String]("split"))).toMap
    // every doc is assigned exactly once
    val n = spark.read.parquet(s"$sf001/documents.parquet").count()
    assert(split.size == n)
    // the whole point: both endpoints of every verified near-dup pair land
    // in the same cluster AND the same split (d_split has no such guarantee)
    val pairs = run("d_dedup_minhash").select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(split(a)._1 == split(b)._1, s"pair ($a,$b) split across clusters")
      assert(split(a)._2 == split(b)._2, s"pair ($a,$b) split across splits")
    }
    // singletons key the same md5 bucket hash by their own id, so for them
    // the assignment coincides with d_split's
    val plain = run("d_split").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val clustered = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    split.foreach { case (id, (cid, sp)) =>
      if (cid == id && !clustered(id)) assert(sp == plain(id))
    }
  }

  test("ann recall audit equals the recomputed exact/ivf intersection") {
    val exact = run("s_cosine_topk").select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    val ivf = run("s_ann_ivf").select("q_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    run("s_ann_recall").collect().foreach { r =>
      val q = r.getAs[Long]("q_id")
      val hits = exact(q).count(ivf)
      assert(r.getAs[Long]("n_hits") == hits)
      assert(r.getAs[Long]("k") == exact(q).length)
      val rec = r.getAs[Double]("recall_r")
      assert(rec >= 0.0 && rec <= 1.0)
    }
  }

  test("bradley-terry strengths separate all-win players from all-loss ones") {
    val rows = run("d_bradley_terry").collect()
    val wins = rows.map(_.getAs[Long]("wins"))
    val nm = rows.map(_.getAs[Long]("n_matches"))
    val p = rows.map(_.getAs[Double]("strength_r"))
    // the tournament is complete per shared lang: every match has exactly
    // one winner, so wins total == match count (each match counted once)
    assert(wins.sum == nm.sum / 2)
    p.foreach(x => assert(x >= 1e-6, s"strength $x below the clamp"))
    val undefeated = rows.filter(r =>
      r.getAs[Long]("wins") == r.getAs[Long]("n_matches") &&
        r.getAs[Long]("n_matches") > 0).map(_.getAs[Double]("strength_r"))
    val winless = rows.filter(r =>
      r.getAs[Long]("wins") == 0L && r.getAs[Long]("n_matches") > 0)
      .map(_.getAs[Double]("strength_r"))
    if (undefeated.nonEmpty && winless.nonEmpty)
      assert(undefeated.min > winless.max,
        "an all-win player must out-rank an all-loss player")
  }
}
