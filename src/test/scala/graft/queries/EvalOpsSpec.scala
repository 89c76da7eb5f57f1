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

  test("d_retrieval_eval: metric identities and ranges hold") {
    val rows = graft.SparkEntry.queries("d_retrieval_eval")(spark, sf01).collect()
    assert(rows.length == 6, "one row per query term")
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
