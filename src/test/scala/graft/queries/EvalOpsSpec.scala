package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** The three round-9 evaluation/labeling operators:
  *  - d_retrieval_eval: MRR@10 / nDCG@10 of the BM25 ranking against graded
  *    first-occurrence pseudo-relevance;
  *  - s_silhouette: simplified (centroid-form) silhouette per k-means cell;
  *  - s_label_spread: kNN-majority auto-labeling of the unlabeled corpus.
  * The DuckDB oracles gate values; these specs pin the internal contracts
  * (metric identities, partition totals, vote mechanics) with independent
  * recomputation where the operator's decision rule can be re-derived.
  */
class EvalOpsSpec extends SparkSpecBase {

  test("d_retrieval_eval: metric identities and ranges hold (sf + zipf corpora)") {
    Seq("d_retrieval_eval", "d_retrieval_eval_zipf").foreach(checkRetrievalEval)
    // the Zipf row must actually exercise the frequency axis: ranks and
    // nDCG spread out instead of the sf corpus's uniform hit_rank = 1
    val zipf = graft.SparkEntry.queries("d_retrieval_eval_zipf")(spark, sf01).collect()
    assert(zipf.map(_.getAs[Long]("hit_rank")).distinct.length > 1,
      "power-law corpus should produce varied first-relevant ranks")
  }

  private def checkRetrievalEval(name: String): Unit = {
    val rows = graft.SparkEntry.queries(name)(spark, sf01).collect()
    assert(rows.length == 6, s"$name: one row per query term")
    rows.foreach { r =>
      val nRel = r.getAs[Long]("n_rel")
      val hit = r.getAs[Long]("hit_rank")
      val mrr = r.getAs[Double]("mrr_r")
      val ndcg = r.getAs[Double]("ndcg_r")
      assert(hit >= 0 && hit <= 10, s"hit_rank out of top-10: $hit")
      // MRR is exactly the quantized reciprocal of the first relevant rank
      val expectMrr = if (hit > 0) (1000000L / hit).toDouble / 1e6 else 0.0
      assert(mrr == expectMrr, s"mrr_r $mrr != 1/hit_rank ($expectMrr)")
      // DCG of a real ranking can never exceed the ideal ranking's
      assert(ndcg >= 0.0 && ndcg <= 1.0, s"ndcg_r out of [0,1]: $ndcg")
      if (nRel == 0) assert(ndcg == 0.0 && hit == 0)
    }
    // non-degenerate on the sf corpus: every term retrieves something
    assert(rows.forall(_.getAs[Long]("n_rel") > 0))
    assert(rows.exists(r => r.getAs[Double]("ndcg_r") > 0.0
      && r.getAs[Double]("ndcg_r") < 1.0),
      "at least one imperfect-but-positive ranking (else the grading is degenerate)")
  }

  test("s_silhouette: per-cell stats bound correctly and partition the corpus") {
    val sil = graft.SparkEntry.queries("s_silhouette")(spark, sf01).collect()
    val nCorpus = spark.read.parquet(s"$sf01/embeddings.parquet").count()
    assert(sil.map(_.getAs[Long]("n_vecs")).sum == nCorpus,
      "every vector lands in exactly one cell")
    assert(sil.length <= 16 && sil.nonEmpty)
    sil.foreach { r =>
      val (mn, mean, mx) = (r.getAs[Double]("min_sil_r"),
        r.getAs[Double]("mean_sil_r"), r.getAs[Double]("max_sil_r"))
      assert(mn >= -1.0 - 1e-9 && mx <= 1.0 + 1e-9, s"silhouette outside [-1,1]: $mn..$mx")
      assert(mn <= mean && mean <= mx, s"mean $mean outside [$mn, $mx]")
    }
  }

  test("d_rouge_pairs: covers exactly the verified near-dup pairs, F1 exact") {
    val rouge = graft.SparkEntry.queries("d_rouge_pairs")(spark, sf01).collect()
    val dedup = graft.SparkEntry.queries("d_dedup_minhash")(spark, sf01).collect()
    assert(rouge.map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet ==
      dedup.map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet,
      "ROUGE rows must be 1:1 with the verified near-dup pairs")
    // independent recompute of ROUGE-1/2 for every pair from the raw text
    val toks = spark.read.parquet(s"$sf01/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        "[a-z0-9]+".r.findAllIn(r.getString(1).toLowerCase).toSeq).toMap
    def counts(g: Seq[String]) = g.groupBy(identity).map { case (k, v) => k -> v.size }
    def overlap(a: Map[String, Int], b: Map[String, Int]): Long =
      a.map { case (g, ca) => math.min(ca, b.getOrElse(g, 0)).toLong }.sum
    rouge.foreach { r =>
      val (a, b) = (toks(r.getAs[Long]("a_id")), toks(r.getAs[Long]("b_id")))
      val ov1 = overlap(counts(a), counts(b))
      val bg = (t: Seq[String]) => t.sliding(2).filter(_.size == 2)
        .map(_.mkString(" ")).toSeq
      val ov2 = overlap(counts(bg(a)), counts(bg(b)))
      assert(r.getAs[Long]("ov1") == ov1 && r.getAs[Long]("ov2") == ov2)
      assert(r.getAs[Double]("rouge1_f") == 2.0 * ov1 / (a.size + b.size).toDouble)
      val n2 = (a.size - 1).max(0) + (b.size - 1).max(0)
      assert(r.getAs[Double]("rouge2_f") ==
        (if (n2 == 0) 0.0 else 2.0 * ov2 / n2.toDouble))
    }
  }

  test("d_rouge_zipf: 1:1 with the verified zipf pairs, F1 bounded by jaccard shape") {
    val rouge = graft.SparkEntry.queries("d_rouge_zipf")(spark, sf01).collect()
    val pairs = graft.SparkEntry.queries("d_dedup_prefix_zipf")(spark, sf01).collect()
    assert(rouge.map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet ==
      pairs.map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet)
    rouge.foreach { r =>
      val (f1, f2) = (r.getAs[Double]("rouge1_f"), r.getAs[Double]("rouge2_f"))
      assert(f1 >= 0.0 && f1 <= 1.0 && f2 >= 0.0 && f2 <= 1.0)
      assert(r.getAs[Long]("ov2") <= r.getAs[Long]("ov1") * 2,
        "bigram overlap cannot wildly exceed unigram overlap")
    }
    // near-dup (J >= 0.7 on 5-char shingles) pairs overlap heavily in words
    assert(rouge.map(_.getAs[Double]("rouge1_f")).min > 0.5,
      "every verified near-dup pair should share most unigrams")
  }

  test("s_mmr_diversify: greedy scores are non-increasing and match brute force") {
    val out = graft.SparkEntry.queries("s_mmr_diversify")(spark, sf001).collect()
    val byQ = out.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == 10 && byQ.values.forall(_.length == 5))
    byQ.foreach { case (q, rows) =>
      val ordered = rows.sortBy(_.getAs[Long]("rnk"))
      assert(ordered.map(_.getAs[Long]("vec_id")).distinct.length == 5)
      assert(!ordered.exists(_.getAs[Long]("vec_id") == q), "query never selects itself")
      val scores = ordered.map(_.getAs[Double]("score_r"))
      assert(scores.zip(scores.tail).forall { case (x, y) => x >= y },
        s"q=$q: greedy MMR score sequence must be non-increasing: ${scores.toSeq}")
    }
    // brute-force greedy recompute for every query
    val vs = spark.read.parquet(s"$sf001/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def dot(a: Array[Float], b: Array[Float]) =
      a.indices.foldLeft(0.0)((s, i) => s + a(i).toDouble * b(i).toDouble)
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def sim(a: Long, b: Long) =
      q6(dot(vs(a), vs(b)) / (math.sqrt(dot(vs(a), vs(a))) * math.sqrt(dot(vs(b), vs(b)))))
    byQ.foreach { case (q, rows) =>
      val cand = vs.keys.filter(_ != q).toSeq
        .map(id => id -> sim(q, id)).sortBy { case (id, s) => (-s, id) }.take(20)
      var selected = Vector.empty[Long]
      (1 to 5).foreach { _ =>
        val pick = cand.filterNot { case (id, _) => selected.contains(id) }
          .map { case (id, s) =>
            val pen = if (selected.isEmpty) 0.0 else selected.map(sim(id, _)).max
            (id, q6(0.7 * s - 0.3 * pen))
          }.sortBy { case (id, sc) => (-sc, id) }.head._1
        selected :+= pick
      }
      assert(rows.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Long]("vec_id")).toSeq
        == selected, s"q=$q: Spark MMR differs from brute-force greedy")
    }
  }

  test("d_calibration: bins partition the scored docs, gap identity holds") {
    val bins = graft.SparkEntry.queries("d_calibration")(spark, sf01).collect()
    val scored = graft.SparkEntry.queries("d_quality_classifier")(spark, sf01).count()
    assert(bins.map(_.getAs[Long]("n_docs")).sum == scored,
      "every classifier-scored doc lands in exactly one bin")
    bins.foreach { r =>
      val bin = r.getAs[Long]("bin")
      val (conf, acc, gap) = (r.getAs[Double]("conf_r"),
        r.getAs[Double]("acc_r"), r.getAs[Double]("gap_r"))
      assert(bin >= 0 && bin <= 9)
      // mean confidence must sit inside its own bin (bin 9 also holds 1.0)
      assert(conf >= bin / 10.0 - 1e-9 && conf <= (bin + 1) / 10.0 + 1e-9,
        s"bin $bin mean conf $conf outside its bin")
      assert(r.getAs[Long]("n_pos") <= r.getAs[Long]("n_docs"))
      assert(math.abs(gap - math.abs(acc - conf)) == 0.0, "gap identity")
    }
  }

  test("s_kcenter_select: greedy maximin selection matches brute force") {
    val out = graft.SparkEntry.queries("s_kcenter_select")(spark, sf001)
      .collect().sortBy(_.getAs[Long]("rnk"))
    assert(out.length == 8)
    assert(out.map(_.getAs[Long]("n_assigned")).sum ==
      spark.read.parquet(s"$sf001/embeddings.parquet").count(),
      "assignment must partition the corpus")
    val vs = spark.read.parquet(s"$sf001/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def dot(a: Array[Float], b: Array[Float]) =
      a.indices.foldLeft(0.0)((s, i) => s + a(i).toDouble * b(i).toDouble)
    def dist(a: Long, b: Long) = 1.0 - math.floor(dot(vs(a), vs(b)) /
      (math.sqrt(dot(vs(a), vs(a))) * math.sqrt(dot(vs(b), vs(b)))) * 1e6 + 0.5) / 1e6
    var centers = Vector(0L)
    var mind = vs.keys.map(id => id -> dist(id, 0L)).toMap
    (2 to 8).foreach { _ =>
      val pick = mind.toSeq.sortBy { case (id, d) => (-d, id) }.head._1
      centers :+= pick
      mind = mind.map { case (id, d) => id -> math.min(d, dist(id, pick)) }
    }
    assert(out.map(_.getAs[Long]("vec_id")).toSeq == centers,
      s"selection order differs: spark=${out.map(_.getAs[Long]("vec_id")).toSeq} vs $centers")
    // maximin dist_r sequence is non-increasing after round 2
    val d = out.map(_.getAs[Double]("dist_r")).drop(1)
    assert(d.zip(d.tail).forall { case (x, y) => x >= y },
      s"maximin radius must shrink monotonically: ${d.toSeq}")
  }

  test("s_label_spread: vote mechanics match a brute-force recompute") {
    val out = graft.SparkEntry.queries("s_label_spread")(spark, sf001)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("pred_label"), r.getAs[Long]("n_votes"),
         r.getAs[Long]("true_label"), r.getAs[Long]("correct"))).toMap
    val all = spark.read.parquet(s"$sf001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"), col("label").cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getLong(2)))
    val labeled = all.filter(_._1 % 4 == 0)
    val unlabeled = all.filter(_._1 % 4 != 0)
    assert(out.size == unlabeled.length, "one prediction per unlabeled vector")
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.indices.foldLeft(0.0)((s, i) => s + a(i).toDouble * b(i).toDouble)
    def nrm(a: Array[Float]): Double = math.sqrt(dot(a, a))
    unlabeled.take(25).foreach { case (id, e, trueLabel) =>
      val top5 = labeled
        .map { case (lid, le, ll) =>
          val sim = math.floor(dot(le, e) / (nrm(le) * nrm(e)) * 1e6 + 0.5) / 1e6
          (lid, ll, sim)
        }
        .sortBy { case (lid, _, sim) => (-sim, lid) }
        .take(5)
      val (predLabel, nVotes) = top5.groupBy(_._2)
        .map { case (l, vs) => (l, vs.length.toLong, vs.map(_._3).max) }
        .toSeq.sortBy { case (l, n, best) => (-n, -best, l) }
        .headOption.map { case (l, n, _) => (l, n) }.get
      val (gotPred, gotVotes, gotTrue, gotCorrect) = out(id)
      assert(gotPred == predLabel && gotVotes == nVotes,
        s"vec $id: got ($gotPred, $gotVotes), brute force says ($predLabel, $nVotes)")
      assert(gotTrue == trueLabel)
      assert(gotCorrect == (if (predLabel == trueLabel) 1L else 0L))
    }
  }
}
