package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`Array[Float]`, dim 64).
  *
  * Three tiers, from exact to scale-path:
  *  - `s_cosine_topk`: brute-force cosine top-k — the correctness baseline.
  *    At 100 TB this is the broadcast-queries × scan-corpus pattern: queries
  *    are broadcast, the corpus scan is embarrassingly parallel, and the
  *    top-k per query is a tree-aggregated partial sort (Spark's window over
  *    a 10-row partition key here; a `TopByKeyAggregator` shape at fleet
  *    scale).
  *  - `s_ann_lsh`: random-hyperplane LSH where the hyperplanes are the first
  *    8 corpus vectors (deterministic, data-derived). Candidates meet only
  *    inside a shared 8-bit sign-code bucket — the shuffle key is the code,
  *    never the O(n²) pair space. Multi-probe (flipping low-margin bits)
  *    is the recall knob at scale.
  *  - `s_ann_ivf`: one-shot IVF — the first 16 vectors act as cell
  *    centroids; every vector is assigned to its nearest cell, queries probe
  *    their 2 nearest cells. This is the partition-pruning pattern: at 100 TB
  *    the corpus would be written bucketed by cell id so a probe reads 2/16
  *    of the data.
  *
  * Determinism: all arithmetic is double-precision with identical operation
  * order on both engines (sequential fold dot products), similarities are
  * rounded to 6 dp before any ordering/threshold decision, ties break on ids.
  *
  * Dot products and norms are the native codegen'd `VecDot`/`VecNorm`
  * expressions (functions.VectorExpressions) rather than
  * `aggregate(zip_with(…))` HOFs: bit-identical results (same accumulation
  * order; float→double widening is exact), but the arrays stay raw floats —
  * no per-pair double-array materialization — and the loop runs inside
  * whole-stage codegen instead of interpreted lambdas.
  */
object Similarity {
  import graft.functions.VectorFunctions.{vecDot, vecNorm}

  /** Corpus as raw float vectors with precomputed double L2 norm. */
  private def vecs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").as("e"))
      .withColumn("nrm", vecNorm(col("e")))

  private val dotQE: Column = vecDot(col("qe"), col("e"))

  /** Top-5 neighbors per query via the custom TopKPerKeyExec (bounded
    * per-key heap, no partition sort) — same rank semantics as
    * `row_number() OVER (PARTITION BY q_id ORDER BY sim_r DESC, vec_id)`.
    */
  private def top5(scored: DataFrame): DataFrame =
    graft.operators.TopK.perKey(scored, Seq(col("q_id")),
        Seq(col("sim_r").desc, col("vec_id").asc), 5)
      .withColumnRenamed("rk", "rnk")

  // -- brute-force cosine top-k ------------------------------------------------
  private def cosineTopK(s: SparkSession, dir: String): DataFrame = {
    val v = vecs(s, dir)
    val q = v.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("e").as("qe"), col("nrm").as("qn"))
    val scored = v.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("sim_r", round(dotQE / (col("qn") * col("nrm")), 6))
    top5(scored)
      .select(col("q_id"), col("rnk"), col("vec_id").as("neighbor_id"), col("sim_r"))
      .orderBy("q_id", "rnk")
  }

  // -- MMR diversification of a retrieval list ---------------------------------
  // Maximal Marginal Relevance — the standard de-redundancy re-rank between
  // ANN retrieval and a RAG context window: greedily pick 5 of the top-20
  // cosine candidates, each round scoring every remaining candidate as
  // lambda*sim(q,d) - (1-lambda)*max_{s in selected} sim(d,s) (lambda=0.7).
  // The greedy loop is inherently sequential in k but k is a SMALL constant
  // (the context budget), so it unrolls into 5 relational rounds — each a
  // candidate-sized join, never a corpus pass (the kmeans/BPE/Bradley-Terry
  // unroll pattern, mirrored CTE-for-CTE in the DuckDB oracle). All pair
  // similarities come from ONE k^2-per-query join computed up front;
  // decisions rank on floor-6dp-quantized scores with vec_id tie-break, so
  // both engines pick identical items every round. Scale: cost is
  // queries x k^2 after the ANN candidate step — the corpus appears only in
  // the top-20 scan, which at fleet scale is the served IVF probe instead.
  private def mmrDiversify(s: SparkSession, dir: String): DataFrame =
    mmrCore(vecs(s, dir))

  /** MMR over an arbitrary normed-vector frame (vec_id, e, nrm) — split out
    * so OperatorPropertiesSpec can replay the unroll on random tie-heavy
    * inputs against a sequential reference greedy. */
  private[queries] def mmrCore(v: DataFrame): DataFrame = {
    val q = v.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("e").as("qe"), col("nrm").as("qn"))
    val scored = v.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("sim_r",
        floor(dotQE / (col("qn") * col("nrm")) * lit(1e6) + lit(0.5)) / lit(1e6))
    val cand = graft.operators.TopK.perKey(scored, Seq(col("q_id")),
        Seq(col("sim_r").desc, col("vec_id").asc), 20)
      .select(col("q_id"), col("vec_id"), col("sim_r"), col("e"), col("nrm"))
      .persist()
    val ps = cand.select(col("q_id"), col("vec_id").as("x_id"),
        col("e").as("xe"), col("nrm").as("xn"))
      .join(cand.select(col("q_id"), col("vec_id").as("y_id"),
        col("e").as("ye"), col("nrm").as("yn")), Seq("q_id"))
      .filter(col("x_id") =!= col("y_id"))
      .withColumn("psim",
        floor(vecDot(col("xe"), col("ye")) / (col("xn") * col("yn"))
          * lit(1e6) + lit(0.5)) / lit(1e6))
      .select("q_id", "x_id", "y_id", "psim")
      .persist()
    def scoreCol(pen: Column): Column =
      floor((lit(0.7) * col("sim_r") - lit(0.3) * pen) * lit(1e6) + lit(0.5)) / lit(1e6)
    // queries x k rows: localCheckpoint per round truncates the otherwise
    // 5-round-deep lineage (each round re-analyzing all prior rounds' plans
    // dominated wall time, not the data)
    val candSlim = cand.select("q_id", "vec_id", "sim_r").localCheckpoint()
    var sel = graft.operators.TopK.perKey(
        candSlim.withColumn("score_r", scoreCol(lit(0.0))),
        Seq(col("q_id")), Seq(col("score_r").desc, col("vec_id").asc), 1)
      .select(col("q_id"), col("vec_id"), lit(1L).as("rnk"),
        col("sim_r"), col("score_r"))
      .localCheckpoint()
    for (k <- 2 to 5) {
      val rem = candSlim.join(sel.select("q_id", "vec_id"),
        Seq("q_id", "vec_id"), "left_anti")
      val pen = ps.join(sel.select(col("q_id"), col("vec_id").as("y_id")),
          Seq("q_id", "y_id"))
        .groupBy("q_id", "x_id").agg(max(col("psim")).as("pen"))
        .withColumnRenamed("x_id", "vec_id")
      val next = graft.operators.TopK.perKey(
          rem.join(pen, Seq("q_id", "vec_id"), "left")
            .withColumn("score_r", scoreCol(coalesce(col("pen"), lit(0.0)))),
          Seq(col("q_id")), Seq(col("score_r").desc, col("vec_id").asc), 1)
        .select(col("q_id"), col("vec_id"), lit(k.toLong).as("rnk"),
          col("sim_r"), col("score_r"))
      sel = sel.unionByName(next).localCheckpoint()
    }
    // cand/ps only feed the construction rounds; the final sel is an eager
    // localCheckpoint, so release them here instead of leaning on the
    // harness's per-query clearCache (r9 advice: a library caller in a
    // long-lived session would otherwise accumulate resident blocks).
    cand.unpersist()
    ps.unpersist()
    sel.orderBy("q_id", "rnk")
  }

  // -- coreset selection: k-center greedy (farthest-point traversal) -----------
  // The prototype-selection step of diversity-pruning pipelines (SemDeDup/
  // D4 family): pick 8 corpus exemplars by greedy maximin — start from
  // vec 0, each round add the point FARTHEST from everything selected so
  // far (quantized cosine distance, ties to the lower id), then audit
  // coverage by assigning every vector to its nearest center (n_assigned +
  // coverage radius per center). The greedy recurrence is k sequential
  // rounds, but each round is ONE narrow corpus scan: the running
  // min-distance-to-selected folds incrementally (mind_k = least(mind_k-1,
  // d(new center))), so cost is k scans — never k x |selected| and never
  // the pair space. The newly picked center flows back in as a broadcast
  // 1-row frame (fully relational — no driver round-trip), and per-round
  // localCheckpoints keep the 8-round lineage flat. Oracle: the identical
  // unroll CTE-for-CTE in DuckDB on the shared floor-6dp distance.
  private val KCenters = 8

  private def kcenterSelect(s: SparkSession, dir: String): DataFrame =
    kcenterCore(vecs(s, dir))

  /** k-center over an arbitrary normed-vector frame (vec_id, e, nrm) — split
    * out for the randomized property spec, like mmrCore. */
  private[queries] def kcenterCore(v: DataFrame): DataFrame = {
    def distTo(ce: Column, cn: Column): Column =
      lit(1.0) - floor(vecDot(col("e"), ce) / (col("nrm") * cn)
        * lit(1e6) + lit(0.5)) / lit(1e6)
    val c1 = v.filter(col("vec_id") === 0)
      .select(col("e").as("ce"), col("nrm").as("cn"))
    var state = v.crossJoin(broadcast(c1))
      .withColumn("mind", distTo(col("ce"), col("cn")))
      .select(col("vec_id"), col("e"), col("nrm"), col("mind"))
      .localCheckpoint()
    var sel = state.filter(col("vec_id") === 0)
      .select(lit(1L).as("rnk"), col("vec_id"), lit(0.0).as("dist_r"))
    for (k <- 2 to KCenters) {
      val pick = graft.operators.TopK.global(state,
          Seq(col("mind").desc, col("vec_id").asc), 1)
        .select(col("vec_id").as("c_id"), col("e").as("ce"),
          col("nrm").as("cn"), col("mind").as("cd"))
      sel = sel.unionByName(pick.select(lit(k.toLong).as("rnk"),
        col("c_id").as("vec_id"), col("cd").as("dist_r")))
      state = state.crossJoin(broadcast(pick.select("ce", "cn")))
        .withColumn("mind", least(col("mind"), distTo(col("ce"), col("cn"))))
        .select(col("vec_id"), col("e"), col("nrm"), col("mind"))
        .localCheckpoint()
      sel = sel.localCheckpoint()
    }
    // coverage audit: nearest-center assignment (ties to the earlier-
    // selected center), rolled up to per-center count + radius
    val cents = sel.join(v, Seq("vec_id"))
      .select(col("rnk"), col("vec_id").as("c_id"),
        col("e").as("ce"), col("nrm").as("cn"))
    val assigned = graft.operators.TopK.perKey(
        v.crossJoin(broadcast(cents)).withColumn("d", distTo(col("ce"), col("cn"))),
        Seq(col("vec_id")), Seq(col("d").asc, col("rnk").asc), 1)
      .select(col("vec_id"), col("rnk"), col("d"))
    // left join + coalesce: a center that wins zero assignments (possible
    // when a later pick is an exact cosine-duplicate of an earlier center)
    // must still appear — the contract is "all k selected centers", and an
    // inner join would silently shrink the output (r9 advice).
    sel.join(assigned.groupBy("rnk").agg(count(lit(1)).as("n_assigned"),
        max(col("d")).as("radius_r")), Seq("rnk"), "left")
      .select(col("rnk"), col("vec_id"), col("dist_r"),
        coalesce(col("n_assigned"), lit(0L)).as("n_assigned"),
        coalesce(col("radius_r"), lit(0.0)).as("radius_r"))
      .orderBy("rnk")
  }

  // -- LSH (random-hyperplane / sign-code) ANN --------------------------------
  private def annLsh(s: SparkSession, dir: String): DataFrame = {
    val v = vecs(s, dir)
    val anchors = v.filter(col("vec_id") < 8)
      .select(col("vec_id").as("a_id"), col("e").as("ae"))
    val codes = v.select(col("vec_id"), col("e").as("qe"))
      .crossJoin(broadcast(anchors))
      .withColumn("dot", vecDot(col("qe"), col("ae")))
      .groupBy("vec_id")
      .agg(sum(when(col("dot") > 0,
        expr("shiftleft(1L, cast(a_id as int))")).otherwise(0L)).as("code"))
    val coded = v.join(codes, Seq("vec_id"))
    val q = coded.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("e").as("qe"), col("nrm").as("qn"),
        col("code"))
    val cand = coded.join(broadcast(q), Seq("code"))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("sim_r", round(dotQE / (col("qn") * col("nrm")), 6))
    top5(cand)
      .select(col("q_id"), col("rnk"), col("vec_id").as("neighbor_id"),
        col("sim_r"), col("code"))
      .orderBy("q_id", "rnk")
  }

  // -- multi-probe LSH: flip the lowest-margin bit ----------------------------
  // The recall knob named in annLsh's notes, made real: each query probes
  // its own bucket AND the bucket with its least-confident hyperplane bit
  // flipped (min |dot|, ties to the lowest anchor id). Candidate set is a
  // strict superset of annLsh at 2× probe cost — still bucket equi joins,
  // never the pair space.
  private def annLshProbe(s: SparkSession, dir: String): DataFrame = {
    val v = vecs(s, dir)
    val anchors = v.filter(col("vec_id") < 8)
      .select(col("vec_id").as("a_id"), col("e").as("ae"))
    val dots = v.select(col("vec_id"), col("e").as("qe"))
      .crossJoin(broadcast(anchors))
      .withColumn("dot", vecDot(col("qe"), col("ae")))
    // argmin via struct-min: lexicographic (|dot|, a_id) — deterministic
    val codes = dots.groupBy("vec_id")
      .agg(sum(when(col("dot") > 0,
        expr("shiftleft(1L, cast(a_id as int))")).otherwise(0L)).as("code"),
        min(struct(abs(col("dot")).as("m"), col("a_id").as("a_id")))
          .getField("a_id").as("flip_id"))
    val coded = v.join(codes, Seq("vec_id"))
    val probes = coded.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("e").as("qe"), col("nrm").as("qn"),
        explode(array(col("code"),
          expr("code ^ shiftleft(1L, cast(flip_id as int))"))).as("probe"))
    val cand = coded.join(broadcast(probes), col("code") === col("probe"))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("sim_r", round(dotQE / (col("qn") * col("nrm")), 6))
    top5(cand)
      .select(col("q_id"), col("rnk"), col("vec_id").as("neighbor_id"),
        col("sim_r"))
      .orderBy("q_id", "rnk")
  }

  // -- one-shot IVF ANN --------------------------------------------------------
  private def annIvf(s: SparkSession, dir: String): DataFrame = {
    val v = vecs(s, dir)
    val cents = v.filter(col("vec_id") < 16)
      .select(col("vec_id").as("c_id"), col("e").as("ce"), col("nrm").as("cn"))
    // nearest-cell assignment for every corpus vector (top-2 via the heap)
    val simToCent = v.select(col("vec_id"), col("e").as("qe"), col("nrm").as("qn"), col("e"), col("nrm"))
      .crossJoin(broadcast(cents))
      .withColumn("csim",
        floor(vecDot(col("qe"), col("ce")) / (col("qn") * col("cn"))
          * lit(1e6) + lit(0.5)) / lit(1e6))
    val assigned = graft.operators.TopK.perKey(simToCent, Seq(col("vec_id")),
        Seq(col("csim").desc, col("c_id").asc), 2)
      .withColumnRenamed("rk", "crk")
      .select(col("vec_id"), col("e"), col("nrm"), col("c_id").as("cell"),
        col("crk"))
    val cells = assigned.filter(col("crk") === 1)
      .select(col("vec_id"), col("e"), col("nrm"), col("cell"))
    // queries probe their 2 nearest cells
    val probes = assigned.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("e").as("qe"), col("nrm").as("qn"),
        col("cell"))
    val cand = cells.join(broadcast(probes), Seq("cell"))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("sim_r", round(dotQE / (col("qn") * col("nrm")), 6))
    top5(cand)
      .select(col("q_id"), col("rnk"), col("vec_id").as("neighbor_id"),
        col("sim_r"), col("cell"))
      .orderBy("q_id", "rnk")
  }

  // -- ANN recall audit ---------------------------------------------------------
  // recall@5 of the one-shot IVF path against the exact brute-force ranking,
  // per query — the eval every ANN deployment runs before trusting an index
  // (the vector mirror of d_minhash_audit). Both legs reuse the gated
  // operators VERBATIM, so the audit can never drift from what it audits;
  // the comparison itself is a k-sized-per-query equi join + count, free at
  // any corpus scale relative to the legs. recall_r = n_hits/k is one exact
  // small-integer division — deterministic cross-engine.
  private def annRecall(s: SparkSession, dir: String): DataFrame = {
    val exact = cosineTopK(s, dir).select(col("q_id"), col("neighbor_id"))
    val approx = annIvf(s, dir).select(col("q_id"), col("neighbor_id"))
      .withColumn("hit", lit(1L))
    exact.join(approx, Seq("q_id", "neighbor_id"), "left")
      .groupBy("q_id")
      .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hits"),
        count(lit(1)).as("k"))
      .select(col("q_id"), col("n_hits"), col("k"),
        (col("n_hits").cast("double") / col("k").cast("double")).as("recall_r"))
      .orderBy("q_id")
  }

  // -- embedding-cosine near-dup dedup ----------------------------------------
  // The 5th dedup flavor (besides exact/fingerprint/ngram/minhash/simhash):
  // candidate pairs meet only inside a shared LSH sign-code bucket (blocking
  // key — never the O(n²) pair space), then exact cosine decides. On this
  // synthetic corpus no pair crosses the dup threshold, so the output keeps
  // every verified candidate with its score + decision flag.
  /** 8-bit sign-code per vector (hyperplanes = the 8 lowest-id corpus
    * vectors) — ONE spelling shared by s_dedup_embedding and s_knn_graph so
    * the two blockings cannot drift apart.
    */
  private def signCodes(v: DataFrame): DataFrame = {
    val anchors = v.filter(col("vec_id") < 8)
      .select(col("vec_id").as("a_id"), col("e").as("ae"))
    v.select(col("vec_id"), col("e").as("qe"))
      .crossJoin(broadcast(anchors))
      .withColumn("dot", vecDot(col("qe"), col("ae")))
      .groupBy("vec_id")
      .agg(sum(when(col("dot") > 0,
        expr("shiftleft(1L, cast(a_id as int))")).otherwise(0L)).as("code"))
  }

  private def dedupEmbedding(s: SparkSession, dir: String): DataFrame = {
    val v = vecs(s, dir)
    val coded = v.join(signCodes(v), Seq("vec_id"))
    val a = coded.select(col("code"), col("vec_id").as("a_id"),
      col("e").as("qe"), col("nrm").as("qn"))
    val b = coded.select(col("code"), col("vec_id").as("b_id"),
      col("e"), col("nrm"))
    a.join(b, Seq("code")).filter(col("a_id") < col("b_id"))
      .withColumn("sim_r", round(dotQE / (col("qn") * col("nrm")), 6))
      .withColumn("is_dup", col("sim_r") >= 0.45)
      .select(col("a_id"), col("b_id"), col("sim_r"), col("is_dup"))
      .orderBy("a_id", "b_id")
  }

  // -- corpus-wide kNN graph (every vector's top-3, Hamming-1 multi-probe) ----
  // The all-pairs problem behind SemDeDup-style semantic clustering and
  // graph-based dedup: EVERY corpus vector needs its k nearest neighbors,
  // not just a query set's. Scale plan: s_dedup_embedding's sign-code
  // blocking widened by one Hamming probe ring — each vector sits in its
  // exact 8-bit code bucket and additionally PROBES the 8 one-bit-flip
  // buckets, so an ordered pair within Hamming distance 1 meets EXACTLY
  // once (the identity probe when codes are equal, the single matching
  // flip otherwise) — no distinct pass, and replication is a fixed ×9 of
  // the n-row probe side, never O(n²). Exact cosine ranks candidates and
  // the bounded-heap TopK exec keeps 3 per source.
  private def knnGraph(s: SparkSession, dir: String): DataFrame = {
    val v = vecs(s, dir)
    val coded = v.join(signCodes(v), Seq("vec_id"))
    val probes = coded.select(col("vec_id").as("a_id"), col("e").as("qe"),
      col("nrm").as("qn"),
      explode(expr("transform(sequence(-1, 7), f -> " +
        "if(f = -1, code, code ^ shiftleft(1L, cast(f as int))))")).as("pcode"))
    val side = coded.select(col("code").as("pcode"), col("vec_id").as("b_id"),
      col("e"), col("nrm"))
    val scored = probes.join(side, Seq("pcode"))
      .filter(col("a_id") =!= col("b_id"))
      .withColumn("sim_r", round(dotQE / (col("qn") * col("nrm")), 6))
    graft.operators.TopK.perKey(scored, Seq(col("a_id")),
        Seq(col("sim_r").desc, col("b_id").asc), 3)
      .withColumnRenamed("rk", "rnk")
      .select(col("a_id").as("src_id"), col("rnk"),
        col("b_id").as("neighbor_id"), col("sim_r"))
      .orderBy("src_id", "rnk")
  }

  // -- graph-expanded ANN (neighbors-of-neighbors candidate generation) ---------
  // The NSW/HNSW serving trick in its distributed spelling: a CHEAP first
  // stage (IVF probing only the single nearest cell — low recall, tiny
  // read) seeds each query with 3 candidates, then the precomputed kNN
  // graph expands seeds one hop (neighbors of neighbors), and the exact
  // rerank runs over the widened set. Recall recovers without widening
  // the cell probe — the graph hop reaches across cell boundaries the
  // nProbe=1 scan never read. All joins are id-keyed equi joins; the
  // expansion multiplies candidates by the graph degree (3), never by
  // the corpus.
  private def annGraphExpand(s: SparkSession, dir: String): DataFrame = {
    val v = vecs(s, dir)
    val cents = v.filter(col("vec_id") < 16)
      .select(col("vec_id").as("c_id"), col("e").as("ce"), col("nrm").as("cn"))
    val simToCent = v.select(col("vec_id"), col("e").as("qe"),
        col("nrm").as("qn"), col("e"), col("nrm"))
      .crossJoin(broadcast(cents))
      .withColumn("csim",
        floor(vecDot(col("qe"), col("ce")) / (col("qn") * col("cn"))
          * lit(1e6) + lit(0.5)) / lit(1e6))
    val cells = graft.operators.TopK.perKey(simToCent, Seq(col("vec_id")),
        Seq(col("csim").desc, col("c_id").asc), 1)
      .select(col("vec_id"), col("e"), col("nrm"), col("c_id").as("cell"))
    val probes = cells.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("e").as("qe"),
        col("nrm").as("qn"), col("cell"))
    val seedCand = cells.join(broadcast(probes), Seq("cell"))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("sim_r", round(dotQE / (col("qn") * col("nrm")), 6))
    val seeds = graft.operators.TopK.perKey(seedCand, Seq(col("q_id")),
        Seq(col("sim_r").desc, col("vec_id").asc), 3)
      .select(col("q_id"), col("vec_id").as("cand_id"))
    val edges = knnGraph(s, dir).select(col("src_id"), col("neighbor_id"))
    val expanded = seeds
      .join(edges, seeds("cand_id") === edges("src_id"))
      .select(col("q_id"), col("neighbor_id").as("cand_id"))
    val candIds = seeds.union(expanded)
      .filter(col("q_id") =!= col("cand_id")).distinct()
    val rer = candIds
      .join(v.select(col("vec_id").as("q_id"), col("e").as("qe"),
        col("nrm").as("qn")), Seq("q_id"))
      .join(v.select(col("vec_id").as("cand_id"), col("e"), col("nrm")),
        Seq("cand_id"))
      .withColumn("sim_r", round(dotQE / (col("qn") * col("nrm")), 6))
    graft.operators.TopK.perKey(rer, Seq(col("q_id")),
        Seq(col("sim_r").desc, col("cand_id").asc), 5)
      .withColumnRenamed("rk", "rnk")
      .select(col("q_id"), col("rnk"), col("cand_id").as("neighbor_id"),
        col("sim_r"))
      .orderBy("q_id", "rnk")
  }

  // -- IVF over the cell-bucketed index (operators.IvfIndex) -------------------
  // Same algebra as annIvf but the corpus is first WRITTEN partitioned by
  // cell id and the probe is a partition-pruned scan — the 100 TB path,
  // value-gated against the same oracle as the on-the-fly plan.
  private def annIvfIndexed(s: SparkSession, dir: String): DataFrame = {
    val idx = FixtureArtifacts.cached("ivf-index", dir)(
      graft.operators.IvfIndex.build(s, t(s, dir, "embeddings"), _))
    graft.operators.IvfIndex.search(s, idx,
      t(s, dir, "embeddings").filter(col("vec_id") < 10))
  }

  // -- IVF with Lloyd-refined (k-means) centroids ------------------------------
  // Same written-index path as annIvfIndexed, but the centroids are 2 Lloyd
  // rounds from the lowest-id seeds (operators.IvfIndex.kmeansCentroids):
  // centroids move to the mean of their members, so cells follow the data
  // distribution instead of whatever the first 16 vectors happened to be —
  // the recall-quality half of the IVF story. Oracle-gated against a fully
  // unrolled k-means in DuckDB (bit-exact: vec_id-ordered sequential float
  // sums, float-quantized centroids each round).
  private def annIvfKmeans(s: SparkSession, dir: String): DataFrame = {
    val corpus = t(s, dir, "embeddings")
    val idx = FixtureArtifacts.cached("ivf-kmeans", dir) { p =>
      val cents = graft.operators.IvfIndex.kmeansCentroids(corpus, 16, 2)
      graft.operators.IvfIndex.build(s, corpus, p, centroids = Some(cents))
    }
    graft.operators.IvfIndex.search(s, idx, corpus.filter(col("vec_id") < 10))
  }

  // A/B partner of s_ann_ivf_kmeans: the fleet-tier hash-partial-avg
  // update step (exact = false) — bounded per-group state in the update
  // aggregate, no collect_list of a hot cell's members. Oracle-gateable
  // output contract: the CELL ASSIGNMENTS, not the centroid floats. The
  // fold-vs-avg swap drifts centroid sums by last-ulp amounts, but the
  // assignment rule ranks on 6-dp-ROUNDED cosine (ties to lowest cell), so
  // the drift is absorbed before any decision is made — IvfIndexSpec pins
  // fast-vs-exact assignments identical, which makes the exact-path DuckDB
  // unroll a valid oracle for the fast path's assignments. (csim itself is
  // deliberately NOT emitted: its 6th decimal can sit on a rounding
  // boundary between the two centroid spellings.)
  private def annIvfKmeansFast(s: SparkSession, dir: String): DataFrame = {
    val corpus = t(s, dir, "embeddings")
    val cents = graft.operators.IvfIndex.kmeansCentroids(corpus, 16, 2,
      exact = false)
    graft.operators.IvfIndex.assign(corpus, cents)
      .select(col("vec_id"), col("cell"))
      .orderBy("vec_id")
  }

  // -- per-cluster corpus profile ---------------------------------------------
  // The inspection step between clustering and action (SemDeDup pruning,
  // topic-mixture rebalancing): every vector assigned to its k-means cell
  // (IvfIndex.assign — the same nearest-centroid rule the written index
  // partitions by), rolled up per (cell, label) with the cell-cosine
  // minimum as the cohesion audit. min/max over doubles are
  // order-independent, so no fold is needed; the rollup's cardinality is
  // cells × labels, and the only corpus-sized exchange is the assignment's
  // TopK partial.
  private def clusterProfile(s: SparkSession, dir: String): DataFrame = {
    val corpus = t(s, dir, "embeddings")
    val cents = graft.operators.IvfIndex.kmeansCentroids(corpus, 16, 2)
    graft.operators.IvfIndex.assign(corpus, cents)
      .join(corpus.select(col("vec_id"), col("label")), Seq("vec_id"))
      .groupBy("cell", "label")
      .agg(count(lit(1)).as("n_vecs"), min(col("csim")).as("min_csim"))
      .orderBy("cell", "label")
  }

  // -- clustering quality: simplified silhouette --------------------------------
  // The accept/reject gate after clustering (before SemDeDup pruning or
  // topic-mixture decisions): classic silhouette needs all-pairs distances
  // (O(n²) — a non-starter at corpus scale), so this is the *simplified*
  // silhouette (centroid form): a = cosine distance to the OWN centroid,
  // b = distance to the NEAREST OTHER centroid, s = (b−a)/max(a,b) — O(n·k)
  // and exactly the broadcast-centroids × corpus-scan shape of assignment
  // itself. Both distances come off the same top-2 ranked-cell pass
  // (IvfIndex.assignTop: rank 1 = owner, rank 2 = nearest other), decided
  // on the shared floor-6dp centroid cosine. Determinism: per-point s is
  // quantized to integer 1e-6 units (floor(x·1e6+0.5) — exact on both
  // engines since its inputs are the already-quantized cosines), so the
  // per-cell mean is a BIGINT sum (order-free) over a count. The only
  // corpus-sized exchange is assignTop's TopK partial.
  private def silhouette(s: SparkSession, dir: String): DataFrame = {
    val corpus = t(s, dir, "embeddings")
    val cents = graft.operators.IvfIndex.kmeansCentroids(corpus, 16, 2)
    val top2 = graft.operators.IvfIndex.assignTop(corpus, cents, 2)
    val own = top2.filter(col("crk") === 1)
      .select(col("vec_id"), col("c_id").as("cell"), col("csim").as("sim1"))
    val nxt = top2.filter(col("crk") === 2)
      .select(col("vec_id"), col("csim").as("sim2"))
    own.join(nxt, Seq("vec_id"))
      .withColumn("a_d", lit(1.0) - col("sim1"))
      .withColumn("b_d", lit(1.0) - col("sim2"))
      // a point sitting ON its (sole) centroid: both distances 0 → s := 0
      .withColumn("sil", when(greatest(col("a_d"), col("b_d")) === 0.0, lit(0.0))
        .otherwise((col("b_d") - col("a_d")) / greatest(col("a_d"), col("b_d"))))
      .withColumn("sil_q", floor(col("sil") * lit(1e6) + lit(0.5)).cast("long"))
      .groupBy("cell")
      .agg(count(lit(1)).as("n_vecs"),
        (floor(sum(col("sil_q")).cast("double") / count(lit(1)) + lit(0.5))
          / lit(1e6)).as("mean_sil_r"),
        (min(col("sil_q")).cast("double") / lit(1e6)).as("min_sil_r"),
        (max(col("sil_q")).cast("double") / lit(1e6)).as("max_sil_r"))
      .orderBy("cell")
  }

  // -- semi-supervised auto-labeling: kNN label spread ---------------------------
  // The standard bootstrap for a partially-labeled corpus (quality tiers,
  // topic tags): every UNLABELED vector takes the majority label of its 5
  // nearest LABELED neighbors (exact cosine; vote ties break to the
  // stronger best-similarity, then the lower label). The held-out true
  // label rides along, so the output doubles as the eval table (`correct`).
  // Label census here is vec_id % 4 = 0 — deterministic and sf-stable. At
  // 100 TB the labeled seed set is the small side by construction
  // (annotation is the expensive resource), so broadcast(labeled) × corpus
  // scan is the right plan; when the seed set outgrows a broadcast, the
  // candidate step swaps for the written IVF index probes (s_ann_ivf_indexed)
  // with identical vote semantics. Ranking is decided on floor-6dp cosine.
  private def labelSpread(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    labelSpreadCore(vecs(s, dir).join(e.select(col("vec_id"),
      col("label").cast("long").as("label")), Seq("vec_id")))
  }

  /** kNN label spread over an arbitrary labeled normed-vector frame
    * (vec_id, e, nrm, label) — split out so the randomized property spec
    * can force vote ties (see GreedyPropertiesSpec). */
  private[queries] def labelSpreadCore(v: DataFrame): DataFrame = {
    val labeled = v.filter(col("vec_id") % 4 === 0)
      .select(col("vec_id").as("l_id"), col("e").as("qe"),
        col("nrm").as("qn"), col("label").as("l_label"))
    val unl = v.filter(col("vec_id") % 4 =!= 0)
      .select(col("vec_id"), col("e"), col("nrm"), col("label").as("true_label"))
    val scored = unl.crossJoin(broadcast(labeled))
      .withColumn("sim_r",
        floor(vecDot(col("qe"), col("e")) / (col("qn") * col("nrm"))
          * lit(1e6) + lit(0.5)) / lit(1e6))
    val votes = graft.operators.TopK.perKey(scored, Seq(col("vec_id")),
        Seq(col("sim_r").desc, col("l_id").asc), 5)
      .groupBy("vec_id", "l_label")
      .agg(count(lit(1)).as("n_votes"), max(col("sim_r")).as("best_sim"))
    graft.operators.TopK.perKey(votes, Seq(col("vec_id")),
        Seq(col("n_votes").desc, col("best_sim").desc, col("l_label").asc), 1)
      .join(unl.select("vec_id", "true_label"), Seq("vec_id"))
      .select(col("vec_id"), col("l_label").as("pred_label"), col("n_votes"),
        col("true_label"),
        (col("l_label") === col("true_label")).cast("long").as("correct"))
      .orderBy("vec_id")
  }

  // -- scalar int8 quantization ------------------------------------------------
  // Per-vector symmetric quantization: scale = 127 / max|x|, q_i = round to
  // nearest int in [-127, 127]. 4× memory cut for ANN corpora (the float32
  // → int8 step every production vector store takes); the reconstruction
  // RMSE column is the quality audit. Determinism: floor(x·s + 0.5) is the
  // shared round-half-up spelling (Spark HALF_UP vs DuckDB half-even would
  // diverge on exact .5), max is order-independent, and the error sum is a
  // sequential fold on both engines. Pure per-row HOFs — one narrow scan,
  // no shuffle, embarrassingly parallel at 100 TB.
  private def quantizeInt8(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").as("e"))
      .withColumn("amax", expr("array_max(transform(e, x -> abs(cast(x as double))))"))
      // all-zero vector: amax=0 would give scale=Inf and q=floor(NaN) —
      // Spark's non-ANSI cast silently yields 0 where DuckDB errors. Make
      // the engines agree by construction: scale=null, q=0, error=x.
      .withColumn("scale", expr("127.0 / nullif(amax, 0.0d)"))
      .withColumn("q", expr(
        "transform(e, x -> coalesce(cast(floor(cast(x as double) * scale + 0.5) as bigint), 0L))"))
      .withColumn("d", expr(
        "zip_with(e, q, (x, qi) -> cast(x as double) - coalesce(cast(qi as double) / scale, 0.0d))"))
      .select(col("vec_id"),
        round(col("scale"), 6).as("scale_r"),
        expr("aggregate(q, 0L, (a, qi) -> a + abs(qi))").as("q_l1"),
        md5(expr("array_join(transform(q, qi -> cast(qi as string)), ',')")).as("q_md5"),
        round(sqrt(expr("aggregate(d, cast(0.0 as double), (a, x) -> a + x * x)") /
          expr("cast(size(e) as double)")), 6).as("rmse_r"))
      .orderBy("vec_id")

  // -- bitext mining (margin-based parallel-pair extraction) --------------------
  // The translation-pair miner (Artetxe & Schwenk's margin criterion):
  // a raw cosine max picks hub vectors that are "closest to everything";
  // the margin normalizes each candidate similarity by the mean of both
  // endpoints' top-k neighborhoods, so only pairs that stand OUT of their
  // neighborhoods survive. Labels stand in for languages (label 0 = src,
  // label 1 = tgt). Determinism: candidate sims are rounded ratios (the
  // repo contract); neighborhood means sum the ROUNDED sims in
  // DECIMAL(18,6) — exact, order-independent — so the margin is one IEEE
  // division of identical doubles on both engines. Both top-k passes run
  // through the bounded-heap exec. At fleet scale the all-pairs candidate
  // stage swaps for the LSH/IVF blocks (same downstream margin plan);
  // here src×tgt is a broadcast of the smaller language.
  private val BitextK = 4
  private def bitextMine(s: SparkSession, dir: String): DataFrame = {
    val v = t(s, dir, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding").as("e"))
      .withColumn("nrm", vecNorm(col("e")))
    val src = v.filter(col("label") === 0)
      .select(col("vec_id").as("a_id"), col("e").as("qe"), col("nrm").as("qn"))
    val tgt = v.filter(col("label") === 1)
      .select(col("vec_id").as("b_id"), col("e"), col("nrm"))
    val sims = tgt.crossJoin(broadcast(src))
      .withColumn("sim_r", round(dotQE / (col("qn") * col("nrm")), 6))
      .select("a_id", "b_id", "sim_r")
    // neighborhood mean over the ROUNDED sims: the sum is exact decimal
    // (order-independent), cast to double BEFORE the divide — decimal
    // division precision rules differ across engines, IEEE doubles don't
    def nbhdAvg(key: String): DataFrame =
      graft.operators.TopK.perKey(sims, Seq(col(key)),
          Seq(col("sim_r").desc, col(if (key == "a_id") "b_id" else "a_id").asc),
          BitextK)
        .groupBy(key)
        .agg((sum(col("sim_r").cast("decimal(18,6)")).cast("double") /
          count(lit(1)).cast("double")).as(s"avg_$key"))
    val withAvg = sims
      .join(broadcast(nbhdAvg("a_id")), Seq("a_id"))
      .join(broadcast(nbhdAvg("b_id")), Seq("b_id"))
      .withColumn("margin_r", round(col("sim_r") /
        ((col("avg_a_id") + col("avg_b_id")) / 2.0), 6))
    graft.operators.TopK.perKey(withAvg, Seq(col("a_id")),
        Seq(col("margin_r").desc, col("b_id").asc), 1)
      .filter(col("margin_r") > 1.0)
      .select(col("a_id"), col("b_id"), col("sim_r"), col("margin_r"))
      .orderBy("a_id")
  }

  // -- per-dimension standardization (whitening) --------------------------------
  // Feature scaling before quantization/indexing: z = (x − μ_dim)/σ_dim per
  // dimension. Cross-engine float determinism via the repo's fixed-point
  // contract: values are first quantized q = floor(x·2^20) (exact double
  // product by a power of two, deterministic floor), so Σq and Σq² are
  // INTEGER aggregates — order-independent, hence hash-gateable — carried
  // as DECIMAL(38,0) (a BIGINT Σq² overflows near ~10^9 rows per dim at
  // 100 TB; decimal partial aggs stay exact). μ, σ, z are then ONE shared
  // IEEE expression tree on both engines. Plan: one posexplode scan + one
  // hash agg on (pos) — 64 groups — plus a 64-row broadcast join for the
  // reference vector's z-scores; nothing else moves.
  private def standardize(s: SparkSession, dir: String): DataFrame = {
    val q = t(s, dir, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("p", "x")))
      .select(col("vec_id"), (col("p") + 1).as("pos"),
        expr("cast(floor(cast(x as double) * 1048576) as bigint)").as("q"))
    val stats = q.groupBy("pos").agg(
        count(lit(1)).as("n_vecs"),
        sum(col("q").cast("decimal(38,0)")).cast("decimal(38,0)").as("sum_q"),
        sum((col("q") * col("q")).cast("decimal(38,0)"))
          .cast("decimal(38,0)").as("sumsq_q"))
      .withColumn("mean_d",
        col("sum_q").cast("double") / col("n_vecs").cast("double"))
      .withColumn("std_d", sqrt(
        (col("sumsq_q").cast("double") -
          col("mean_d") * col("sum_q").cast("double")) /
          col("n_vecs").cast("double")))
    val q0 = q.filter(col("vec_id") === 0)
      .select(col("pos").as("q0_pos"), col("q").as("q0"))
    // rounding spelled as floor(x*1e6 + 0.5)/1e6 — every op in that tree is
    // IEEE exactly-rounded, so the result is bit-identical across engines
    // and library versions (round(x, 6) is library-defined and was the one
    // op here that could flip last-digit hashes between engines).
    def r6(c: org.apache.spark.sql.Column) = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    // The integer sums travel as STRINGS: a DECIMAL(38,0) survives the hash
    // gate only if both engines' writers agree on precision/scale metadata,
    // which is exactly the representation detail that can disagree between
    // Spark-parquet and an arrow dump. The digits are the value; emit them.
    stats.join(broadcast(q0), col("pos") === col("q0_pos"))
      .select(col("pos"), col("n_vecs"),
        col("sum_q").cast("string").as("sum_q"),
        col("sumsq_q").cast("string").as("sumsq_q"),
        r6(col("mean_d")).as("mean_r"),
        r6(col("std_d")).as("std_r"),
        r6((col("q0").cast("double") - col("mean_d")) / col("std_d"))
          .as("z0_r"))
      .orderBy("pos")
  }

  // -- Matryoshka-truncated cosine top-k ---------------------------------------
  // Rank on the first 16 of 64 dims (an MRL-style prefix), renormalized.
  // This is the cheap first pass of a two-stage retrieval: 4× less data
  // scanned and moved per query; the full-dim rerank of the shortlist is
  // exactly s_cosine_topk's plan over k·|q| rows instead of the corpus.
  // Same VecDot/VecNorm codegen'd kernels — `slice` keeps the array a raw
  // float array.
  private def cosineMrl(s: SparkSession, dir: String): DataFrame = {
    val v = t(s, dir, "embeddings")
      .select(col("vec_id"), expr("slice(embedding, 1, 16)").as("e"))
      .withColumn("nrm", vecNorm(col("e")))
    val q = v.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("e").as("qe"), col("nrm").as("qn"))
    val scored = v.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("sim_r", round(dotQE / (col("qn") * col("nrm")), 6))
    top5(scored)
      .select(col("q_id"), col("rnk"), col("vec_id").as("neighbor_id"), col("sim_r"))
      .orderBy("q_id", "rnk")
  }

  // -- hybrid retrieval: reciprocal-rank fusion of BM25 and cosine ------------
  // The two-tower serving primitive: a lexical ranking (BM25 over the fixed
  // query terms) and a vector ranking (cosine to query vector 0) each keep
  // their global top-50 — via TopK.global, so the "global rank" that RRF
  // needs never materializes a single-partition Window — then fuse with
  // 1/(60 + rank) per side (Cormack's k = 60), absent side contributing 0.
  // All fusion arithmetic is IEEE exactly-rounded division + addition on
  // BIGINT ranks, so the scores are bit-identical cross-engine.
  private def hybridRrf(s: SparkSession, dir: String): DataFrame = {
    val lex = graft.operators.TopK.global(
        TextOps.bm25(s, dir).select(col("doc_id"), col("score_r")),
        Seq(col("score_r").desc, col("doc_id")), 50)
      .select(col("doc_id"), col("rk").as("lex_rank"))
    val v = vecs(s, dir)
    val q0 = v.filter(col("vec_id") === 0)
      .select(col("e").as("qe"), col("nrm").as("qn"))
    val cos = v.crossJoin(broadcast(q0))
      .filter(col("vec_id") =!= 0)
      .withColumn("sim_r",
        round(vecDot(col("qe"), col("e")) / (col("qn") * col("nrm")), 6))
    val vec = graft.operators.TopK.global(
        cos.select(col("vec_id"), col("sim_r")),
        Seq(col("sim_r").desc, col("vec_id")), 50)
      .select(col("vec_id").as("doc_id"), col("rk").as("vec_rank"))
    val fused = lex.join(vec, Seq("doc_id"), "full_outer")
      .withColumn("rrf_r", round(
        coalesce(lit(1.0) / (lit(60.0) + col("lex_rank").cast("double")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60.0) + col("vec_rank").cast("double")), lit(0.0)),
        6))
    graft.operators.TopK.global(fused,
        Seq(col("rrf_r").desc, col("doc_id")), 20)
      .select(col("rk").as("rnk"), col("doc_id"), col("lex_rank"),
        col("vec_rank"), col("rrf_r"))
      .orderBy("rnk")
  }

  // -- the served hybrid stack: index-BM25 ⊕ IVF ⊕ RRF -------------------------
  // s_hybrid_rrf fuses corpus-scan rankings; this is the same fusion with
  // BOTH legs served the way production serves them: the lexical top-50
  // comes off the TermIndex posting lists (only matching docs scored) and
  // the vector top-50 comes from a 2-probe IVF pass over the frozen seed
  // cells (never a brute-force corpus scan). Fusion stays 1/(60 + rank)
  // per side on BIGINT ranks — bit-identical cross-engine. At 100 TB each
  // leg reads its own pruned slice of its own artifact; nothing here
  // touches the full corpus.
  private def searchServed(s: SparkSession, dir: String): DataFrame = {
    val lex = graft.operators.TopK.global(
        graft.queries.TextOps.searchBm25Scores(s, dir),
        Seq(col("score_r").desc, col("doc_id").asc), 50)
      .select(col("doc_id"), col("rk").as("lex_rank"))
    val v = vecs(s, dir)
    val cents = v.filter(col("vec_id") < 16)
      .select(col("vec_id").as("c_id"), col("e").as("ce"), col("nrm").as("cn"))
    val simToCent = v.select(col("vec_id"), col("e").as("qe"),
        col("nrm").as("qn"), col("e"), col("nrm"))
      .crossJoin(broadcast(cents))
      .withColumn("csim",
        floor(vecDot(col("qe"), col("ce")) / (col("qn") * col("cn"))
          * lit(1e6) + lit(0.5)) / lit(1e6))
    val ranked = graft.operators.TopK.perKey(simToCent, Seq(col("vec_id")),
        Seq(col("csim").desc, col("c_id").asc), 2)
      .withColumnRenamed("rk", "crk")
    val cells = ranked.filter(col("crk") === 1)
      .select(col("vec_id"), col("e"), col("nrm"), col("c_id").as("cell"))
    val probes = ranked.filter(col("vec_id") === 0)
      .select(col("vec_id").as("q_id"), col("qe"), col("qn"),
        col("c_id").as("cell"))
    val cand = cells.join(broadcast(probes), Seq("cell"))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("sim_r", round(dotQE / (col("qn") * col("nrm")), 6))
    val vec = graft.operators.TopK.global(
        cand.select(col("vec_id"), col("sim_r")),
        Seq(col("sim_r").desc, col("vec_id").asc), 50)
      .select(col("vec_id").as("doc_id"), col("rk").as("vec_rank"))
    val fused = lex.join(vec, Seq("doc_id"), "full_outer")
      .withColumn("rrf_r", round(
        coalesce(lit(1.0) / (lit(60.0) + col("lex_rank").cast("double")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60.0) + col("vec_rank").cast("double")), lit(0.0)),
        6))
    graft.operators.TopK.global(fused,
        Seq(col("rrf_r").desc, col("doc_id")), 20)
      .select(col("rk").as("rnk"), col("doc_id"), col("lex_rank"),
        col("vec_rank"), col("rrf_r"))
      .orderBy("rnk")
  }

  // -- semantic dedup: near-dup pairs → components → survivor per cluster -----
  // The full embedding-level dedup decision, composed from the verified
  // pieces: sign-code-blocked near-dup pairs (s_dedup_embedding), pointer-
  // jumping connected components over the is_dup edges, and a one-aggregate
  // cluster summary (survivor = lowest vec_id, as batch dedup keeps).
  // Unclustered vectors are their own singleton via the left join, so the
  // output partitions the corpus. Scale: edges ≪ corpus (blocked pairs),
  // CC is O(log diameter) rounds over edges, the summary rides one shuffle.
  private def dedupSemantic(s: SparkSession, dir: String): DataFrame = {
    val pairs = dedupEmbedding(s, dir).filter(col("is_dup"))
    val cc = graft.operators.ConnectedComponents
      .clusters(pairs.select("a_id", "b_id"), "a_id", "b_id")
    vecs(s, dir).select(col("vec_id"))
      .join(cc.select(col("id").as("vec_id"), col("cluster_id")),
        Seq("vec_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("vec_id")))
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_members"), min(col("vec_id")).as("survivor_id"))
      .orderBy("cluster_id")
  }

  // -- 1-bit binary quantization + Hamming top-k -------------------------------
  // The 32× memory cut of binary embeddings: each 64-dim float vector
  // collapses to ONE BIGINT of sign bits, and ranking is bit_count(xor) —
  // pure integer ops, so the gate is exact. Bit 63 needs care on the
  // oracle side (DuckDB raises on 1::BIGINT << 63; Spark's shiftleft
  // wraps to Long.MinValue — same bit pattern, different spelling).
  // Ranking runs through the bounded-heap TopK exec like every other ANN
  // ranking; at fleet scale the codes table is ~n×8 bytes and the scan is
  // a codegen'd integer loop — the cheap first stage before exact rerank.
  private def hammingTopK(s: SparkSession, dir: String): DataFrame = {
    val codes = t(s, dir, "embeddings")
      .select(col("vec_id"), expr(
        "aggregate(sequence(0, 63), 0L, (acc, i) -> " +
          "acc + if(element_at(embedding, i + 1) > 0, shiftleft(1L, i), 0L))")
        .as("code"))
    val q = codes.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("code").as("q_code"))
    val scored = codes.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("hamming", expr("bit_count(code ^ q_code)").cast("long"))
    graft.operators.TopK.perKey(scored, Seq(col("q_id")),
        Seq(col("hamming").asc, col("vec_id").asc), 5)
      .withColumnRenamed("rk", "rnk")
      .select(col("q_id"), col("rnk"), col("vec_id").as("neighbor_id"),
        col("hamming"))
      .orderBy("q_id", "rnk")
  }

  // -- two-stage retrieval: Hamming shortlist → exact cosine rerank -----------
  // The serving composition the binary codes exist FOR: stage 1 ranks the
  // whole corpus by 64-bit sign-code Hamming distance (integer xor +
  // bit_count over an n×8-byte table — the only full scan) and keeps a
  // 20-deep shortlist per query through the bounded-heap TopK exec; stage 2
  // fetches ONLY the shortlist's float vectors (a 20·|queries|-row semi
  // join, not a corpus scan) and re-ranks by exact cosine. At fleet scale
  // the float fetch is the expensive I/O, and this plan touches
  // 20 vectors per query instead of n — the 32× memory cut of
  // s_hamming_topk turned into an end-to-end latency shape. Both stages'
  // ties break to the lowest vec_id, so the shortlist set is deterministic
  // and the oracle reproduces it with two ROW_NUMBER windows.
  private def annRerank(s: SparkSession, dir: String): DataFrame = {
    val v = vecs(s, dir)
    val codes = v.select(col("vec_id"), expr(
      "aggregate(sequence(0, 63), 0L, (acc, i) -> " +
        "acc + if(element_at(e, i + 1) > 0, shiftleft(1L, i), 0L))")
      .as("code"))
    val q = codes.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("code").as("q_code"))
    val ham = codes.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("hamming", expr("bit_count(code ^ q_code)").cast("long"))
    val shortlist = graft.operators.TopK.perKey(ham, Seq(col("q_id")),
        Seq(col("hamming").asc, col("vec_id").asc), 20)
      .select(col("q_id"), col("vec_id"), col("hamming"))
    val qv = v.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("e").as("qe"), col("nrm").as("qn"))
    val rer = shortlist.join(v, Seq("vec_id"))
      .join(broadcast(qv), Seq("q_id"))
      .withColumn("sim_r", round(dotQE / (col("qn") * col("nrm")), 6))
    graft.operators.TopK.perKey(rer, Seq(col("q_id")),
        Seq(col("sim_r").desc, col("vec_id").asc), 5)
      .withColumnRenamed("rk", "rnk")
      .select(col("q_id"), col("rnk"), col("vec_id").as("neighbor_id"),
        col("hamming"), col("sim_r"))
      .orderBy("q_id", "rnk")
  }

  // -- product quantization (PQ) encode + ADC ranking --------------------------
  // The vector-store compression workhorse: 8 subspaces × 8 dims, 16
  // codewords each — 64 float dims become 8 nibbles. Codebooks here are the
  // first 16 vectors' subvectors (deterministic training stand-in; the
  // Lloyd machinery is gated separately by s_ann_ivf_kmeans), because this
  // gate is about ENCODE (argmin over codewords, ties to lowest id) and
  // ADC (asymmetric distance: per-query distance table to each codeword,
  // summed over subspaces by code lookup). Float-determinism contract:
  // every squared-distance is an explicit left-associated 8-term chain and
  // the ADC sum folds the 8 subspace terms in m order — both engines
  // execute the IDENTICAL sequence of IEEE additions, so scores are
  // bit-identical. Scale shape: encode is vectors × 128 broadcast codebook
  // rows (O(n·M·K), the true PQ cost); ADC joins the n×8 code table
  // against a broadcast 1280-row query distance table and never touches
  // the original floats — that is the point of PQ.
  /** Shared PQ machinery: `enc` = per-vector subspace codes (argmin over
    * the broadcast codebook, ties to lowest codeword id); `qd` = the
    * per-query distance table (q_id, qm, qk, qdist2) the ADC step looks
    * codes up in. See annPq's header for the float-determinism contract.
    */
  private val pqDist2Chain = (1 to 8).map { i =>
    s"(cast(element_at(sub, $i) as double) - cast(element_at(csub, $i) as double)) * " +
      s"(cast(element_at(sub, $i) as double) - cast(element_at(csub, $i) as double))"
  }.mkString(" + ")

  /** (vec_id, m, sub): the corpus cut into 8 8-dim subvectors. */
  private[queries] def pqSubs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("vec_id"), posexplode(expr(
        "transform(sequence(0, 7), m -> slice(embedding, m * 8 + 1, 8))"))
        .as(Seq("m", "sub")))

  /** Encode + query-distance table against a given (m, k, csub) codebook. */
  private def pqEncQd(subs: DataFrame, cb: DataFrame): (DataFrame, DataFrame) = {
    val d = subs.join(broadcast(cb), Seq("m"))
      .withColumn("dist2", expr(pqDist2Chain))
    val enc = d.groupBy(col("vec_id"), col("m"))
      .agg(min(struct(col("dist2"), col("k"))).as("mk"))
      .select(col("vec_id"), col("m"), col("mk.k").as("code"))
    val qd = d.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("m").as("qm"),
        col("k").as("qk"), col("dist2").as("qdist2"))
    (enc, qd)
  }

  private def pqPieces(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val subs = pqSubs(s, dir)
    val cb = subs.filter(col("vec_id") < 16)
      .select(col("m"), col("vec_id").as("k"), col("sub").as("csub"))
    pqEncQd(subs, cb)
  }

  /** Per-subspace Lloyd-trained PQ codebook: 2 rounds of squared-L2
    * assignment (ties to lowest codeword) + component-mean update,
    * quantized back to float each round (what a stored codebook holds) —
    * empty codewords keep their previous centroid. All 8 subspaces train
    * in ONE DataFrame program keyed by `m`: the assignment is the same
    * vectors×codebook broadcast join encoding costs anyway (O(n·M·K))
    * and the update is one (m, k, j) hash agg whose float sums fold in
    * vec_id order — bit-identical to the DuckDB unroll, like
    * IvfIndex.kmeansCentroids' exact tier.
    */
  private[queries] def pqTrainedCodebook(subs: DataFrame): DataFrame = {
    var cb = subs.filter(col("vec_id") < 16)
      .select(col("m"), col("vec_id").as("k"), col("sub").as("csub"))
    for (_ <- 1 to 2) {
      val assigned = subs.join(broadcast(cb), Seq("m"))
        .withColumn("dist2", expr(pqDist2Chain))
        .groupBy(col("vec_id"), col("m"))
        .agg(min(struct(col("dist2"), col("k"))).as("mk"))
        .select(col("vec_id"), col("m"), col("mk.k").as("k"))
      val comp = assigned.join(subs, Seq("vec_id", "m"))
        .select(col("m"), col("k"), col("vec_id"),
          posexplode(col("sub")).as(Seq("j", "vv")))
        .groupBy("m", "k", "j")
        .agg(expr("aggregate(array_sort(collect_list(struct(vec_id, vv))), " +
          "cast(0 as double), (a, x) -> a + cast(x.vv as double)) / count(1)")
          .as("cv"))
      val fresh = comp.groupBy("m", "k")
        .agg(expr("transform(array_sort(collect_list(struct(j, cv))), " +
          "x -> cast(x.cv as float))").as("csub_new"))
      cb = cb.select(col("m"), col("k"), col("csub").as("csub_old"))
        .join(fresh, Seq("m", "k"), "left")
        .select(col("m"), col("k"),
          coalesce(col("csub_new"), col("csub_old")).as("csub"))
    }
    // 128 rows — materialize eagerly, truncating the per-round lineage
    cb.localCheckpoint()
  }

  // -- trained product quantization -------------------------------------------
  // s_ann_pq's codebook is a deterministic stand-in (the first 16
  // vectors' subvectors); this is PQ as shipped: codebooks Lloyd-trained
  // per subspace, then the identical encode + ADC ranking. Gate: the
  // oracle unrolls the per-subspace k-means (vec_id-ordered float sums,
  // float-quantized each round) and the full ADC — every distance is a
  // shared left-associated IEEE tree, so scores are bit-identical; the
  // rounding is the version-proof floor(x·1e6+0.5)/1e6 spelling.
  private def annPqTrained(s: SparkSession, dir: String): DataFrame = {
    val subs = pqSubs(s, dir)
    val (enc, qd) = pqEncQd(subs, pqTrainedCodebook(subs))
    val adc = adcSum(enc
      .join(broadcast(qd), col("m") === col("qm") && col("code") === col("qk"))
      .filter(col("q_id") =!= col("vec_id")),
      Seq(col("q_id"), col("vec_id")))
    graft.operators.TopK.perKey(adc, Seq(col("q_id")),
        Seq(col("dist").asc, col("vec_id").asc), 5)
      .withColumnRenamed("rk", "rnk")
      .select(col("q_id"), col("rnk"), col("vec_id").as("neighbor_id"),
        (floor(col("dist") * lit(1e6) + lit(0.5)) / lit(1e6)).as("adc_r"))
      .orderBy("q_id", "rnk")
  }

  /** ADC fold in m order over a (…, m, qdist2) frame grouped by `keys`. */
  private def adcSum(joined: DataFrame, keys: Seq[Column]): DataFrame =
    joined.groupBy(keys: _*)
      .agg(sort_array(collect_list(struct(col("m").as("m"),
        col("qdist2").as("qdist2")))).as("ds"))
      .withColumn("dist", expr(
        "aggregate(ds, cast(0 as double), (a, x) -> a + x.qdist2)"))

  private def annPq(s: SparkSession, dir: String): DataFrame = {
    val (enc, qd) = pqPieces(s, dir)
    val adc = adcSum(enc
      .join(broadcast(qd), col("m") === col("qm") && col("code") === col("qk"))
      .filter(col("q_id") =!= col("vec_id")),
      Seq(col("q_id"), col("vec_id")))
    graft.operators.TopK.perKey(adc, Seq(col("q_id")),
        Seq(col("dist").asc, col("vec_id").asc), 5)
      .withColumnRenamed("rk", "rnk")
      .select(col("q_id"), col("rnk"), col("vec_id").as("neighbor_id"),
        round(col("dist"), 6).as("adc_r"))
      .orderBy("q_id", "rnk")
  }

  // -- IVF + PQ: the composed modern ANN serving stack -------------------------
  // Coarse stage: cosine-nearest of 16 centroids assigns every vector to a
  // cell; queries probe their 2 nearest cells (identical to s_ann_ivf).
  // Fine stage: candidates from the probed cells are ranked by PQ ADC —
  // codes + a broadcast query distance table, never the original floats.
  // The scale story compounds: the coarse stage prunes the corpus to the
  // probed cells, and the fine stage ranks those WITHOUT reading vectors —
  // I/O is the n×8 code table slice for two cells per query.
  private def annIvfPq(s: SparkSession, dir: String): DataFrame = {
    val v = vecs(s, dir)
    val cents = v.filter(col("vec_id") < 16)
      .select(col("vec_id").as("c_id"), col("e").as("ce"), col("nrm").as("cn"))
    val simToCent = v.select(col("vec_id"), col("e").as("qe"), col("nrm").as("qn"))
      .crossJoin(broadcast(cents))
      .withColumn("csim",
        floor(vecDot(col("qe"), col("ce")) / (col("qn") * col("cn"))
          * lit(1e6) + lit(0.5)) / lit(1e6))
    val assigned = graft.operators.TopK.perKey(simToCent, Seq(col("vec_id")),
        Seq(col("csim").desc, col("c_id").asc), 2)
      .withColumnRenamed("rk", "crk")
      .select(col("vec_id"), col("c_id").as("cell"), col("crk"))
    val cells = assigned.filter(col("crk") === 1).select(col("vec_id"), col("cell"))
    val probes = assigned.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("cell"))
    val cand = broadcast(probes).join(cells, Seq("cell"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id"), col("cell"))
    val (enc, qd) = pqPieces(s, dir)
    val qdR = qd.withColumnRenamed("q_id", "qq_id")
    val adc = adcSum(cand
      .join(enc, Seq("vec_id"))
      .join(broadcast(qdR), col("q_id") === col("qq_id") &&
        col("m") === col("qm") && col("code") === col("qk"))
      .drop("qq_id"),
      Seq(col("q_id"), col("vec_id"), col("cell")))
    graft.operators.TopK.perKey(adc, Seq(col("q_id")),
        Seq(col("dist").asc, col("vec_id").asc), 5)
      .withColumnRenamed("rk", "rnk")
      .select(col("q_id"), col("rnk"), col("vec_id").as("neighbor_id"),
        col("cell"), round(col("dist"), 6).as("adc_r"))
      .orderBy("q_id", "rnk")
  }

  // -- contrastive pair mining --------------------------------------------------
  // Builds the (anchor, positive, negatives) triplets a contrastive
  // trainer consumes: the positive is the cosine top-1 (hard positive —
  // mined, not labeled), negatives are hash-drawn uniform ids (md5 of
  // anchor⊕index mod corpus size — reproducible across runs/engines, no
  // RNG state), with anchor/positive collisions dropped deterministically.
  // Every pair carries its similarity so downstream can re-weight or
  // re-bucket into hard/easy negatives without touching the vectors again.
  // At fleet scale the positive mining is whatever ANN stack is already
  // built (IVF/PQ above); the negative draw is a zero-shuffle expression.
  private def contrastivePairs(s: SparkSession, dir: String): DataFrame = {
    val v = vecs(s, dir)
    val anchors = v.filter(col("vec_id") < 50)
      .select(col("vec_id").as("q_id"), col("e").as("qe"), col("nrm").as("qn"))
    val scored = v.crossJoin(broadcast(anchors))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("sim_r", round(dotQE / (col("qn") * col("nrm")), 6))
    val pos = graft.operators.TopK.perKey(scored, Seq(col("q_id")),
        Seq(col("sim_r").desc, col("vec_id").asc), 1)
      .select(col("q_id"), lit(0L).as("j"), lit("pos").as("role"),
        col("vec_id").as("other_id"), col("sim_r"))
    val n = v.agg(count(lit(1)).as("n_vecs"))
    val negIds = anchors.select(col("q_id")).crossJoin(broadcast(n))
      .select(col("q_id"), explode(expr("sequence(1, 3)")).as("j"), col("n_vecs"))
      .withColumn("other_id", expr(
        "cast(conv(substring(md5(concat('neg:', q_id, ':', j)), 1, 8), 16, 10) as bigint) % n_vecs"))
      .filter(col("other_id") =!= col("q_id"))
    val posIds = pos.select(col("q_id").as("p_q"), col("other_id").as("p_id"))
    val negs = negIds
      .join(broadcast(posIds), col("q_id") === col("p_q") &&
        col("other_id") === col("p_id"), "left_anti")
      .join(v.select(col("vec_id").as("other_id"), col("e").as("ne"),
        col("nrm").as("nn")), Seq("other_id"))
      .join(broadcast(anchors), Seq("q_id"))
      .withColumn("sim_r", round(
        vecDot(col("qe"), col("ne")) / (col("qn") * col("nn")), 6))
      .select(col("q_id"), col("j").cast("long").as("j"), lit("neg").as("role"),
        col("other_id"), col("sim_r"))
    pos.unionByName(negs).orderBy("q_id", "j")
  }

  // -- hard-negative mining -----------------------------------------------------
  // The label-aware sibling of s_contrastive_pairs: a retrieval trainer's
  // gradient-rich negatives are vectors CLOSE to the anchor in embedding
  // space but from a different class. Same broadcast-anchors × corpus-scan
  // shape as s_cosine_topk with the label inequality fused into the scan
  // filter — it prunes BEFORE the bounded-heap top-k, so the heap never
  // sees same-class rows. At fleet scale the scan side swaps for the ANN
  // shortlist (s_ann_rerank) with the same label predicate; the per-anchor
  // output is 5 (negative_id, similarity) rows ready for batch assembly.
  private def hardNegatives(s: SparkSession, dir: String): DataFrame = {
    val v = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").as("e"), col("label"))
      .withColumn("nrm", vecNorm(col("e")))
    val q = v.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("e").as("qe"),
        col("nrm").as("qn"), col("label").as("q_label"))
    val scored = v.crossJoin(broadcast(q))
      .filter(col("label") =!= col("q_label"))
      .withColumn("sim_r", round(dotQE / (col("qn") * col("nrm")), 6))
    top5(scored)
      .select(col("q_id"), col("rnk"), col("vec_id").as("negative_id"),
        col("label").cast("long").as("neg_label"), col("sim_r"))
      .orderBy("q_id", "rnk")
  }

  // -- semantic sequence packing (in-context pretraining ordering) ------------
  // The ICLM trick (Shi et al.): order the corpus so semantically-related
  // documents land in the SAME training sequence, giving the model real
  // long-range context instead of random concatenation. Distributed shape:
  // assign every doc to its nearest frozen seed centroid (one broadcast of
  // 16 centroids against the scan — the s_ann_graph_expand assignment
  // spelling), then concat-and-split WITHIN each cell: a per-cell
  // partitioned window (cells grow with the corpus, so no single-reducer
  // funnel) gives each doc its token offset, and seq_idx = offset DIV 512.
  // The order inside a cell is a salted hash — deterministic, and an
  // unbiased shuffle of each topic cluster. Token counts ride the
  // documents scan; embeddings never shuffle wider than (doc_id, cell).
  private val IcpSeqLen = 512L

  private def packSemantic(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = vecs(s, dir)
    val cents = v.filter(col("vec_id") < 16)
      .select(col("vec_id").as("c_id"), col("e").as("ce"), col("nrm").as("cn"))
    val simToCent = v.select(col("vec_id"), col("e").as("qe"), col("nrm").as("qn"))
      .crossJoin(broadcast(cents))
      .withColumn("csim",
        floor(vecDot(col("qe"), col("ce")) / (col("qn") * col("cn"))
          * lit(1e6) + lit(0.5)) / lit(1e6))
    val cells = graft.operators.TopK.perKey(simToCent, Seq(col("vec_id")),
        Seq(col("csim").desc, col("c_id").asc), 1)
      .select(col("vec_id").as("doc_id"), col("c_id").as("cell"))
    val nt = t(s, dir, "documents")
      .select(col("doc_id"), size(graft.queries.TextOps.tokensExpr)
        .cast("long").as("n_tokens"),
        md5(concat(lit("icp:"), col("doc_id").cast("string"))).as("hkey"))
    val w = Window.partitionBy("cell").orderBy("hkey", "doc_id")
    cells.join(nt, Seq("doc_id"))
      .withColumn("pos_in_cell", row_number().over(w).cast("long"))
      .withColumn("cum",
        sum(col("n_tokens")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .select(col("doc_id"), col("cell"), col("pos_in_cell"), col("n_tokens"),
        (col("cum") - col("n_tokens")).as("tok_offset"),
        expr(s"(cum - n_tokens) div $IcpSeqLen").as("seq_idx"))
      .orderBy("doc_id")
  }

  val queries: Map[String, QueryFn] = Map(
    "s_search_served"   -> (searchServed _),
    "s_pack_semantic"   -> (packSemantic _),
    "s_hard_negatives"  -> (hardNegatives _),
    "s_contrastive_pairs" -> (contrastivePairs _),
    "s_hamming_topk"    -> (hammingTopK _),
    "s_ann_rerank"      -> (annRerank _),
    "s_ann_pq"          -> (annPq _),
    "s_ann_pq_trained"  -> (annPqTrained _),
    "s_ann_ivfpq"       -> (annIvfPq _),
    "s_quantize_int8"   -> (quantizeInt8 _),
    "s_standardize"     -> (standardize _),
    "s_bitext_mine"     -> (bitextMine _),
    "s_ann_graph_expand" -> (annGraphExpand _),
    "s_cosine_mrl"      -> (cosineMrl _),
    "s_cosine_topk"     -> (cosineTopK _),
    "s_ann_lsh"         -> (annLsh _),
    "s_ann_lsh_probe"   -> (annLshProbe _),
    "s_ann_ivf"         -> (annIvf _),
    "s_ann_recall"      -> (annRecall _),
    "s_ann_ivf_indexed" -> (annIvfIndexed _),
    "s_ann_ivf_kmeans"  -> (annIvfKmeans _),
    "s_ann_ivf_kmeans_fast" -> (annIvfKmeansFast _),
    "s_hybrid_rrf"      -> (hybridRrf _),
    "s_dedup_embedding" -> (dedupEmbedding _),
    "s_dedup_semantic"  -> (dedupSemantic _),
    "s_knn_graph"       -> (knnGraph _),
    "s_cluster_profile" -> (clusterProfile _),
    "s_silhouette"      -> (silhouette _),
    "s_label_spread"    -> (labelSpread _),
    "s_mmr_diversify"   -> (mmrDiversify _),
    "s_kcenter_select"  -> (kcenterSelect _)
  )

  private val vSql =
    """v AS (SELECT vec_id, embedding::DOUBLE[] AS e,
      |  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      |  FROM embeddings)""".stripMargin

  /** Sign-code CTEs (mirror of `signCodes`), shared by the near-dup,
    * semantic-dedup and kNN-graph oracles. */
  private val codedSql =
    """a AS (SELECT vec_id AS a_id, e AS ae FROM v WHERE vec_id < 8),
      |codes AS (SELECT v.vec_id,
      |    sum(CASE WHEN list_dot_product(v.e, a.ae) > 0
      |      THEN (1::BIGINT << a.a_id::INT) ELSE 0 END)::BIGINT AS code
      |  FROM v, a GROUP BY 1),
      |coded AS (SELECT v.vec_id, v.e, v.nrm, codes.code
      |  FROM v JOIN codes ON v.vec_id = codes.vec_id)""".stripMargin

  /** Sign-code blocking + blocked cosine pairs (shared by the embedding
    * near-dup oracle and the semantic-dedup clustering oracle). */
  private val codedPairsSql =
    s"""$codedSql,
      |pairs AS (SELECT x.vec_id AS a_id, y.vec_id AS b_id,
      |    round(list_dot_product(x.e, y.e) / (x.nrm * y.nrm), 6) AS sim_r
      |  FROM coded x JOIN coded y ON x.code = y.code AND x.vec_id < y.vec_id)""".stripMargin

  /** One unrolled Lloyd round: assign to nearest `prev` centroid (rounded
    * cosine, ties to lowest cell id), recompute each cell's component-wise
    * mean as a vec_id-ordered sequential fold (bit-identical to the Spark
    * fold), quantize to float, keep the previous centroid for empty cells.
    */
  private def kmeansIterSql(i: Int, prev: String): String =
    s"""a$i AS (SELECT vec_id, cell FROM (
       |    SELECT v.vec_id, c.c_id AS cell,
       |      row_number() OVER (PARTITION BY v.vec_id
       |        ORDER BY floor(list_dot_product(v.e, c.ce) / (v.nrm * c.cn) * 1e6 + 0.5) / 1e6 DESC, c.c_id) AS rn
       |    FROM v, $prev c) WHERE rn = 1),
       |x$i AS (SELECT a$i.cell, v.vec_id, t.i, v.e[t.i] AS vv
       |  FROM a$i JOIN v USING (vec_id), generate_series(1, 64) AS t(i)),
       |m$i AS (SELECT cell, i,
       |    list_reduce(list_prepend(0.0, list(vv ORDER BY vec_id)), (a, b) -> a + b) / count(*) AS cv
       |  FROM x$i GROUP BY cell, i),
       |n$i AS (SELECT cell AS c_id, list(cv::FLOAT ORDER BY i)::DOUBLE[] AS ce FROM m$i GROUP BY cell),
       |c$i AS (SELECT p.c_id, coalesce(n$i.ce, p.ce) AS ce,
       |    sqrt(list_dot_product(coalesce(n$i.ce, p.ce), coalesce(n$i.ce, p.ce))) AS cn
       |  FROM $prev p LEFT JOIN n$i USING (c_id))""".stripMargin

  private val pqDist2Sql = (1 to 8).map(i =>
    s"(s.sub[$i] - cb.csub[$i]) * (s.sub[$i] - cb.csub[$i])").mkString(" + ")

  /** One unrolled per-subspace Lloyd round (expects `subs` in scope):
    * assign each (vec, m) subvector to its nearest `prev` codeword
    * (squared L2, ties to lowest k), recompute codeword components as a
    * vec_id-ordered sequential mean fold, quantize to float, keep the
    * previous codeword for empty cells — the PQ mirror of kmeansIterSql.
    */
  private def pqKmeansIterSql(i: Int, prev: String): String =
    s"""pa$i AS (SELECT vec_id, m, k FROM (
       |    SELECT s.vec_id, s.m, cb.k,
       |      row_number() OVER (PARTITION BY s.vec_id, s.m
       |        ORDER BY $pqDist2Sql, cb.k) AS rn
       |    FROM subs s JOIN $prev cb ON s.m = cb.m) WHERE rn = 1),
       |px$i AS (SELECT a.m, a.k, s.vec_id, t.j, s.sub[t.j] AS vv
       |  FROM pa$i a JOIN subs s ON s.vec_id = a.vec_id AND s.m = a.m,
       |       generate_series(1, 8) AS t(j)),
       |pm$i AS (SELECT m, k, j,
       |    list_reduce(list_prepend(0.0, list(vv ORDER BY vec_id)), (x, y) -> x + y) / count(*) AS cv
       |  FROM px$i GROUP BY m, k, j),
       |pn$i AS (SELECT m, k, list(cv::FLOAT ORDER BY j)::DOUBLE[] AS csub
       |  FROM pm$i GROUP BY m, k),
       |pc$i AS (SELECT p.m, p.k, coalesce(n.csub, p.csub) AS csub
       |  FROM $prev p LEFT JOIN pn$i n ON n.m = p.m AND n.k = p.k)""".stripMargin

  /** PQ CTE chain (expects a `v(vec_id, e DOUBLE[])` CTE in scope):
    * subspace slices, codebook, distance table, codes, query distances.
    */
  private val pqCtesSql =
    s"""subs AS (SELECT vec_id, m, list_slice(e, m * 8 + 1, m * 8 + 8) AS sub
       |  FROM v, unnest(generate_series(0, 7)) AS t(m)),
       |cb AS (SELECT m, vec_id AS k, sub AS csub FROM subs WHERE vec_id < 16),
       |d AS (SELECT s.vec_id, s.m, cb.k, $pqDist2Sql AS dist2
       |  FROM subs s JOIN cb ON s.m = cb.m),
       |md AS (SELECT vec_id, m, MIN(dist2) AS mind FROM d GROUP BY 1, 2),
       |enc AS (SELECT d.vec_id, d.m, MIN(d.k) AS code
       |  FROM d JOIN md ON d.vec_id = md.vec_id AND d.m = md.m AND d.dist2 = md.mind
       |  GROUP BY 1, 2),
       |qd AS (SELECT vec_id AS q_id, m, k, dist2 AS qdist2 FROM d WHERE vec_id < 10)""".stripMargin

  val oracles: Map[String, String] = Map(
    "s_search_served" -> {
      val ts = graft.queries.TextOps.bmTerms
      s"""WITH d AS (SELECT doc_id,
         |    regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents),
         |dl AS (SELECT doc_id, len(toks)::BIGINT AS dl FROM d),
         |stats AS (SELECT count(*)::BIGINT AS n_docs, SUM(dl)::BIGINT AS sum_dl
         |  FROM dl),
         |tf AS (SELECT doc_id, tok, count(*)::BIGINT AS tf
         |  FROM (SELECT doc_id, unnest(toks) AS tok FROM d)
         |  WHERE tok IN (${ts.map(t => s"'$t'").mkString(", ")})
         |  GROUP BY 1, 2),
         |dft AS (SELECT tok, count(*)::BIGINT AS df_docs FROM tf GROUP BY 1),
         |w AS (SELECT tf.doc_id, tf.tok,
         |    (((n_docs::DOUBLE - df_docs::DOUBLE) + 0.5) / (df_docs::DOUBLE + 0.5)) *
         |    ((tf::DOUBLE * 2.2) / (tf::DOUBLE + 1.2 * (0.25 + 0.75 *
         |      (dl::DOUBLE / (sum_dl::DOUBLE / n_docs::DOUBLE))))) AS w
         |  FROM tf JOIN dft USING (tok) JOIN dl USING (doc_id), stats),
         |p AS (SELECT doc_id,
         |    ${ts.zipWithIndex.map { case (t, i) =>
              s"COALESCE(MAX(CASE WHEN tok = '$t' THEN w END), 0.0) AS w$i"
            }.mkString(",\n|    ")}
         |  FROM w GROUP BY 1),
         |lex AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY
         |    round(${ts.indices.map(i => s"w$i").mkString(" + ")}, 6) DESC,
         |    doc_id)::BIGINT AS lex_rank
         |  FROM p QUALIFY lex_rank <= 50),
         |$vSql,
         |c AS (SELECT vec_id AS c_id, e AS ce, nrm AS cn FROM v WHERE vec_id < 16),
         |sims AS (SELECT v.vec_id, v.e, v.nrm, c.c_id,
         |    floor(list_dot_product(v.e, c.ce) / (v.nrm * c.cn) * 1e6 + 0.5) / 1e6 AS csim
         |  FROM v, c),
         |rankedc AS (SELECT vec_id, e, nrm, c_id AS cell, csim,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, c_id)
         |      AS crk FROM sims),
         |cells AS (SELECT vec_id, e, nrm, cell FROM rankedc WHERE crk = 1),
         |qprobes AS (SELECT vec_id AS q_id, e AS qe, nrm AS qn, cell
         |  FROM rankedc WHERE crk <= 2 AND vec_id = 0),
         |cand AS (SELECT cl.vec_id,
         |    round(list_dot_product(p.qe, cl.e) / (p.qn * cl.nrm), 6) AS sim_r
         |  FROM qprobes p JOIN cells cl ON p.cell = cl.cell
         |  WHERE p.q_id != cl.vec_id),
         |vec AS (SELECT vec_id AS doc_id, ROW_NUMBER() OVER (ORDER BY
         |    sim_r DESC, vec_id)::BIGINT AS vec_rank
         |  FROM cand QUALIFY vec_rank <= 50),
         |fused AS (SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id,
         |    lex_rank, vec_rank,
         |    round(COALESCE(1.0 / (60.0 + lex_rank::DOUBLE), 0.0) +
         |          COALESCE(1.0 / (60.0 + vec_rank::DOUBLE), 0.0), 6) AS rrf_r
         |  FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id)
         |SELECT ROW_NUMBER() OVER (ORDER BY rrf_r DESC, doc_id)::BIGINT AS rnk,
         |  doc_id, lex_rank, vec_rank, rrf_r
         |FROM fused QUALIFY rnk <= 20 ORDER BY rnk""".stripMargin
    },
    "s_pack_semantic" ->
      s"""WITH $vSql,
         |c AS (SELECT vec_id AS c_id, e AS ce, nrm AS cn FROM v WHERE vec_id < 16),
         |sims AS (SELECT v.vec_id, c.c_id,
         |    floor(list_dot_product(v.e, c.ce) / (v.nrm * c.cn) * 1e6 + 0.5) / 1e6 AS csim
         |  FROM v, c),
         |cells AS (SELECT vec_id AS doc_id, c_id AS cell FROM (
         |  SELECT vec_id, c_id, ROW_NUMBER() OVER (PARTITION BY vec_id
         |    ORDER BY csim DESC, c_id) AS crk FROM sims) WHERE crk = 1),
         |nt AS (SELECT doc_id,
         |    len(regexp_extract_all(lower(text), '[a-z0-9]+'))::BIGINT AS n_tokens,
         |    md5('icp:' || doc_id::VARCHAR) AS hkey FROM documents),
         |o AS (SELECT cells.doc_id, cell, n_tokens,
         |    ROW_NUMBER() OVER (PARTITION BY cell ORDER BY hkey, doc_id)::BIGINT
         |      AS pos_in_cell,
         |    SUM(n_tokens) OVER (PARTITION BY cell ORDER BY hkey, doc_id
         |      ROWS UNBOUNDED PRECEDING)::BIGINT AS cum
         |  FROM cells JOIN nt USING (doc_id))
         |SELECT doc_id, cell, pos_in_cell, n_tokens,
         |  (cum - n_tokens)::BIGINT AS tok_offset,
         |  ((cum - n_tokens) // $IcpSeqLen)::BIGINT AS seq_idx
         |FROM o ORDER BY doc_id""".stripMargin,
    "s_contrastive_pairs" ->
      s"""WITH $vSql,
         |a AS (SELECT vec_id AS q_id, e AS qe, nrm AS qn FROM v WHERE vec_id < 50),
         |sc AS (SELECT a.q_id, v.vec_id,
         |    round(list_dot_product(a.qe, v.e) / (a.qn * v.nrm), 6) AS sim_r
         |  FROM a, v WHERE a.q_id <> v.vec_id),
         |pos AS (SELECT q_id, 0::BIGINT AS j, 'pos' AS role, vec_id AS other_id, sim_r
         |  FROM (SELECT q_id, vec_id, sim_r,
         |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim_r DESC, vec_id) AS rk
         |   FROM sc) WHERE rk = 1),
         |n AS (SELECT COUNT(*) AS n_vecs FROM v),
         |negid AS (SELECT q_id, j,
         |    ('0x' || substr(md5('neg:' || q_id || ':' || j), 1, 8))::BIGINT % n_vecs AS other_id
         |  FROM a, unnest(generate_series(1, 3)) AS t(j), n),
         |negf AS (SELECT negid.q_id, negid.j, negid.other_id FROM negid
         |  LEFT JOIN pos ON negid.q_id = pos.q_id AND negid.other_id = pos.other_id
         |  WHERE negid.other_id <> negid.q_id AND pos.q_id IS NULL),
         |negs AS (SELECT f.q_id, f.j::BIGINT AS j, 'neg' AS role, f.other_id,
         |    round(list_dot_product(a.qe, v.e) / (a.qn * v.nrm), 6) AS sim_r
         |  FROM negf f JOIN v ON f.other_id = v.vec_id JOIN a ON f.q_id = a.q_id)
         |SELECT * FROM (SELECT * FROM pos UNION ALL SELECT * FROM negs)
         |ORDER BY q_id, j""".stripMargin,
    "s_ann_ivfpq" ->
      s"""WITH $vSql,
         |c AS (SELECT vec_id AS c_id, e AS ce, nrm AS cn FROM v WHERE vec_id < 16),
         |sims AS (SELECT v.vec_id, c.c_id,
         |    floor(list_dot_product(v.e, c.ce) / (v.nrm * c.cn) * 1e6 + 0.5) / 1e6 AS csim
         |  FROM v, c),
         |ranked AS (SELECT vec_id, c_id AS cell, csim,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, c_id) AS crk
         |  FROM sims),
         |cells AS (SELECT vec_id, cell FROM ranked WHERE crk = 1),
         |probes AS (SELECT vec_id AS q_id, cell FROM ranked WHERE crk <= 2 AND vec_id < 10),
         |cand AS (SELECT p.q_id, cl.vec_id, p.cell
         |  FROM probes p JOIN cells cl ON p.cell = cl.cell AND p.q_id != cl.vec_id),
         |$pqCtesSql,
         |parts AS (SELECT c2.q_id, c2.vec_id, c2.cell,
         |    list(qd.qdist2 ORDER BY enc.m) AS ds
         |  FROM cand c2 JOIN enc ON enc.vec_id = c2.vec_id
         |    JOIN qd ON qd.q_id = c2.q_id AND qd.m = enc.m AND qd.k = enc.code
         |  GROUP BY 1, 2, 3),
         |adc AS (SELECT q_id, vec_id, cell,
         |  ds[1] + ds[2] + ds[3] + ds[4] + ds[5] + ds[6] + ds[7] + ds[8] AS dist
         |  FROM parts),
         |r AS (SELECT q_id, vec_id, cell, dist,
         |  ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY dist, vec_id) AS rnk FROM adc)
         |SELECT q_id, rnk, vec_id AS neighbor_id, cell, round(dist, 6) AS adc_r
         |FROM r WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,
    "s_ann_pq_trained" ->
      s"""WITH $vSql,
         |subs AS (SELECT vec_id, m, list_slice(e, m * 8 + 1, m * 8 + 8) AS sub
         |  FROM v, unnest(generate_series(0, 7)) AS t(m)),
         |pc0 AS (SELECT m, vec_id AS k, sub AS csub FROM subs WHERE vec_id < 16),
         |${pqKmeansIterSql(1, "pc0")},
         |${pqKmeansIterSql(2, "pc1")},
         |d AS (SELECT s.vec_id, s.m, cb.k, $pqDist2Sql AS dist2
         |  FROM subs s JOIN pc2 cb ON s.m = cb.m),
         |md AS (SELECT vec_id, m, MIN(dist2) AS mind FROM d GROUP BY 1, 2),
         |enc AS (SELECT d.vec_id, d.m, MIN(d.k) AS code
         |  FROM d JOIN md ON d.vec_id = md.vec_id AND d.m = md.m AND d.dist2 = md.mind
         |  GROUP BY 1, 2),
         |qd AS (SELECT vec_id AS q_id, m, k, dist2 AS qdist2 FROM d WHERE vec_id < 10),
         |parts AS (SELECT qd.q_id, enc.vec_id, list(qd.qdist2 ORDER BY enc.m) AS ds
         |  FROM enc JOIN qd ON enc.m = qd.m AND enc.code = qd.k
         |  WHERE qd.q_id <> enc.vec_id
         |  GROUP BY 1, 2),
         |adc AS (SELECT q_id, vec_id,
         |  ds[1] + ds[2] + ds[3] + ds[4] + ds[5] + ds[6] + ds[7] + ds[8] AS dist
         |  FROM parts),
         |r AS (SELECT q_id, vec_id, dist,
         |  ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY dist, vec_id) AS rnk FROM adc)
         |SELECT q_id, rnk, vec_id AS neighbor_id,
         |  floor(dist * 1e6 + 0.5) / 1e6 AS adc_r
         |FROM r WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,
    "s_ann_pq" ->
      s"""WITH $vSql,
         |$pqCtesSql,
         |parts AS (SELECT qd.q_id, enc.vec_id, list(qd.qdist2 ORDER BY enc.m) AS ds
         |  FROM enc JOIN qd ON enc.m = qd.m AND enc.code = qd.k
         |  WHERE qd.q_id <> enc.vec_id
         |  GROUP BY 1, 2),
         |adc AS (SELECT q_id, vec_id,
         |  ds[1] + ds[2] + ds[3] + ds[4] + ds[5] + ds[6] + ds[7] + ds[8] AS dist
         |  FROM parts),
         |r AS (SELECT q_id, vec_id, dist,
         |  ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY dist, vec_id) AS rnk FROM adc)
         |SELECT q_id, rnk, vec_id AS neighbor_id, round(dist, 6) AS adc_r
         |FROM r WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,
    "s_hamming_topk" ->
      """WITH codes AS (SELECT vec_id,
        |   CAST(list_sum(list_transform(generate_series(0, 63), i ->
        |     CASE WHEN embedding[i + 1] > 0 THEN
        |       CASE WHEN i = 63 THEN -9223372036854775808 ELSE (1::BIGINT << i) END
        |     ELSE 0 END)) AS BIGINT) AS code
        | FROM embeddings),
        |q AS (SELECT vec_id AS q_id, code AS q_code FROM codes WHERE vec_id < 10),
        |scored AS (SELECT q_id, vec_id,
        |   CAST(bit_count(xor(code, q_code)) AS BIGINT) AS hamming
        | FROM codes, q WHERE q_id <> vec_id),
        |r AS (SELECT q_id, vec_id, hamming,
        |   ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY hamming, vec_id) AS rnk
        | FROM scored)
        |SELECT q_id, rnk, vec_id AS neighbor_id, hamming
        |FROM r WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,
    "s_ann_rerank" ->
      s"""WITH $vSql,
         |codes AS (SELECT vec_id,
         |   CAST(list_sum(list_transform(generate_series(0, 63), i ->
         |     CASE WHEN embedding[i + 1] > 0 THEN
         |       CASE WHEN i = 63 THEN -9223372036854775808 ELSE (1::BIGINT << i) END
         |     ELSE 0 END)) AS BIGINT) AS code
         | FROM embeddings),
         |q AS (SELECT vec_id AS q_id, code AS q_code FROM codes WHERE vec_id < 10),
         |ham AS (SELECT q_id, c.vec_id,
         |   CAST(bit_count(xor(code, q_code)) AS BIGINT) AS hamming
         | FROM codes c, q WHERE q_id <> c.vec_id),
         |sl AS (SELECT q_id, vec_id, hamming,
         |   ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY hamming, vec_id) AS hrk
         | FROM ham),
         |qv AS (SELECT vec_id AS q_id, e AS qe, nrm AS qn FROM v WHERE vec_id < 10),
         |rer AS (SELECT sl.q_id, sl.vec_id, sl.hamming,
         |   round(list_dot_product(qv.qe, v.e) / (qv.qn * v.nrm), 6) AS sim_r
         | FROM sl JOIN v ON sl.vec_id = v.vec_id JOIN qv ON sl.q_id = qv.q_id
         | WHERE hrk <= 20),
         |r AS (SELECT q_id, vec_id, hamming, sim_r,
         |   ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim_r DESC, vec_id) AS rnk
         | FROM rer)
         |SELECT q_id, rnk::BIGINT AS rnk, vec_id AS neighbor_id, hamming, sim_r
         |FROM r WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,
    "s_quantize_int8" ->
      """WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |sc AS (SELECT vec_id, e,
        |    127.0 / nullif(list_max(list_transform(e, x -> abs(x))), 0) AS scale
        |  FROM e0),
        |qq AS (SELECT vec_id, e, scale,
        |    list_transform(e, x -> coalesce(floor(x * scale + 0.5)::BIGINT, 0)) AS q
        |  FROM sc),
        |dd AS (SELECT vec_id, scale, q,
        |    list_transform(generate_series(1, len(e)),
        |      i -> e[i] - coalesce(CAST(q[i] AS DOUBLE) / scale, 0)) AS d,
        |    len(e) AS dim
        |  FROM qq)
        |SELECT vec_id, round(scale, 6) AS scale_r,
        |  list_sum(list_transform(q, qi -> abs(qi)))::BIGINT AS q_l1,
        |  md5(array_to_string(q, ',')) AS q_md5,
        |  round(sqrt(list_dot_product(d, d) / CAST(dim AS DOUBLE)), 6) AS rmse_r
        |FROM dd ORDER BY vec_id""".stripMargin,
    "s_bitext_mine" ->
      s"""WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e,
         |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
         |  FROM embeddings),
         |src AS (SELECT vec_id AS a_id, e AS qe, nrm AS qn FROM v WHERE label = 0),
         |tgt AS (SELECT vec_id AS b_id, e, nrm FROM v WHERE label = 1),
         |sims AS (SELECT a_id, b_id,
         |    round(list_dot_product(qe, e) / (qn * nrm), 6) AS sim_r
         |  FROM src, tgt),
         |fa AS (SELECT a_id,
         |    CAST(SUM(sim_r::DECIMAL(18,6)) AS DOUBLE) / COUNT(*)::DOUBLE AS avg_a
         |  FROM (SELECT a_id, sim_r, ROW_NUMBER() OVER (PARTITION BY a_id
         |      ORDER BY sim_r DESC, b_id) AS rk FROM sims)
         |  WHERE rk <= $BitextK GROUP BY 1),
         |fb AS (SELECT b_id,
         |    CAST(SUM(sim_r::DECIMAL(18,6)) AS DOUBLE) / COUNT(*)::DOUBLE AS avg_b
         |  FROM (SELECT b_id, sim_r, ROW_NUMBER() OVER (PARTITION BY b_id
         |      ORDER BY sim_r DESC, a_id) AS rk FROM sims)
         |  WHERE rk <= $BitextK GROUP BY 1),
         |m AS (SELECT s.a_id, s.b_id, s.sim_r,
         |    round(s.sim_r / ((fa.avg_a + fb.avg_b) / 2.0), 6) AS margin_r
         |  FROM sims s JOIN fa USING (a_id) JOIN fb USING (b_id)),
         |best AS (SELECT a_id, b_id, sim_r, margin_r,
         |    ROW_NUMBER() OVER (PARTITION BY a_id
         |      ORDER BY margin_r DESC, b_id) AS rk FROM m)
         |SELECT a_id, b_id, sim_r, margin_r FROM best
         |WHERE rk = 1 AND margin_r > 1.0 ORDER BY a_id""".stripMargin,
    "s_standardize" ->
      """WITH q AS (SELECT vec_id, i AS pos,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1048576) AS BIGINT) AS q
        |  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)),
        |st AS (SELECT pos, COUNT(*) AS n_vecs,
        |    CAST(SUM(q) AS DECIMAL(38,0)) AS sum_q,
        |    CAST(SUM(q*q) AS DECIMAL(38,0)) AS sumsq_q
        |  FROM q GROUP BY 1),
        |m AS (SELECT pos, n_vecs, sum_q, sumsq_q,
        |    CAST(sum_q AS DOUBLE)/CAST(n_vecs AS DOUBLE) AS mean_d,
        |    sqrt((CAST(sumsq_q AS DOUBLE) -
        |      (CAST(sum_q AS DOUBLE)/CAST(n_vecs AS DOUBLE)) * CAST(sum_q AS DOUBLE))
        |      / CAST(n_vecs AS DOUBLE)) AS std_d
        |  FROM st)
        |SELECT m.pos, n_vecs,
        |  CAST(sum_q AS VARCHAR) AS sum_q,
        |  CAST(sumsq_q AS VARCHAR) AS sumsq_q,
        |  floor(mean_d * 1e6 + 0.5) / 1e6 AS mean_r,
        |  floor(std_d * 1e6 + 0.5) / 1e6 AS std_r,
        |  floor((CAST(q.q AS DOUBLE) - mean_d) / std_d * 1e6 + 0.5) / 1e6 AS z0_r
        |FROM m JOIN q ON q.pos = m.pos AND q.vec_id = 0
        |ORDER BY m.pos""".stripMargin,
    "s_cosine_mrl" ->
      """WITH v AS (SELECT vec_id, list_slice(embedding::DOUBLE[], 1, 16) AS e,
        |    sqrt(list_dot_product(list_slice(embedding::DOUBLE[], 1, 16),
        |      list_slice(embedding::DOUBLE[], 1, 16))) AS nrm
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, e AS qe, nrm AS qn FROM v WHERE vec_id < 10),
        |p AS (SELECT q_id, vec_id AS neighbor_id,
        |    round(list_dot_product(qe, e) / (qn * nrm), 6) AS sim_r
        |  FROM q, v WHERE vec_id != q_id),
        |r AS (SELECT q_id, neighbor_id, sim_r,
        |    row_number() OVER (PARTITION BY q_id ORDER BY sim_r DESC, neighbor_id) AS rnk
        |  FROM p)
        |SELECT q_id, rnk::BIGINT AS rnk, neighbor_id, sim_r FROM r
        |WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,
    "s_hard_negatives" ->
      s"""WITH vl AS (SELECT vec_id, label::BIGINT AS label, embedding::DOUBLE[] AS e,
         |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
         |  FROM embeddings),
         |q AS (SELECT vec_id AS q_id, e AS qe, nrm AS qn, label AS q_label
         |  FROM vl WHERE vec_id < 10),
         |p AS (SELECT q_id, vec_id AS negative_id, label AS neg_label,
         |    round(list_dot_product(qe, e) / (qn * nrm), 6) AS sim_r
         |  FROM q, vl WHERE label <> q_label),
         |r AS (SELECT q_id, negative_id, neg_label, sim_r,
         |    row_number() OVER (PARTITION BY q_id ORDER BY sim_r DESC, negative_id) AS rnk
         |  FROM p)
         |SELECT q_id, rnk::BIGINT AS rnk, negative_id, neg_label, sim_r FROM r
         |WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,
    "s_cosine_topk" ->
      s"""WITH $vSql,
         |q AS (SELECT vec_id AS q_id, e AS qe, nrm AS qn FROM v WHERE vec_id < 10),
         |p AS (SELECT q_id, vec_id AS neighbor_id,
         |    round(list_dot_product(qe, e) / (qn * nrm), 6) AS sim_r
         |  FROM q, v WHERE vec_id != q_id),
         |r AS (SELECT q_id, neighbor_id, sim_r,
         |    row_number() OVER (PARTITION BY q_id ORDER BY sim_r DESC, neighbor_id) AS rnk
         |  FROM p)
         |SELECT q_id, rnk::BIGINT AS rnk, neighbor_id, sim_r FROM r
         |WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,
    "s_ann_lsh" ->
      s"""WITH $vSql,
         |a AS (SELECT vec_id AS a_id, e AS ae FROM v WHERE vec_id < 8),
         |codes AS (SELECT v.vec_id,
         |    sum(CASE WHEN list_dot_product(v.e, a.ae) > 0
         |      THEN (1::BIGINT << a.a_id::INT) ELSE 0 END)::BIGINT AS code
         |  FROM v, a GROUP BY 1),
         |coded AS (SELECT v.vec_id, v.e, v.nrm, codes.code
         |  FROM v JOIN codes ON v.vec_id = codes.vec_id),
         |q AS (SELECT vec_id AS q_id, e AS qe, nrm AS qn, code FROM coded WHERE vec_id < 10),
         |cand AS (SELECT q.q_id, c.vec_id AS neighbor_id, q.code,
         |    round(list_dot_product(q.qe, c.e) / (q.qn * c.nrm), 6) AS sim_r
         |  FROM q JOIN coded c ON q.code = c.code AND q.q_id != c.vec_id),
         |r AS (SELECT q_id, neighbor_id, sim_r, code,
         |    row_number() OVER (PARTITION BY q_id ORDER BY sim_r DESC, neighbor_id) AS rnk
         |  FROM cand)
         |SELECT q_id, rnk::BIGINT AS rnk, neighbor_id, sim_r, code FROM r
         |WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,
    "s_ann_lsh_probe" ->
      s"""WITH $vSql,
         |a AS (SELECT vec_id AS a_id, e AS ae FROM v WHERE vec_id < 8),
         |dots AS (SELECT v.vec_id, a.a_id, list_dot_product(v.e, a.ae) AS dot FROM v, a),
         |flips AS (SELECT vec_id, a_id AS flip_id FROM (
         |    SELECT vec_id, a_id,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY abs(dot), a_id) AS rn
         |    FROM dots) WHERE rn = 1),
         |codes AS (SELECT vec_id,
         |    sum(CASE WHEN dot > 0 THEN (1::BIGINT << a_id::INT) ELSE 0 END)::BIGINT AS code
         |  FROM dots GROUP BY 1),
         |coded AS (SELECT v.vec_id, v.e, v.nrm, c.code
         |  FROM v JOIN codes c ON v.vec_id = c.vec_id),
         |probes AS (
         |  SELECT vec_id AS q_id, e AS qe, nrm AS qn, code AS probe
         |  FROM coded WHERE vec_id < 10
         |  UNION ALL
         |  SELECT c.vec_id, c.e, c.nrm, xor(c.code, 1::BIGINT << f.flip_id::INT)
         |  FROM coded c JOIN flips f ON c.vec_id = f.vec_id WHERE c.vec_id < 10),
         |cand AS (SELECT p.q_id, t.vec_id AS neighbor_id,
         |    round(list_dot_product(p.qe, t.e) / (p.qn * t.nrm), 6) AS sim_r
         |  FROM probes p JOIN coded t ON t.code = p.probe AND t.vec_id != p.q_id),
         |r AS (SELECT q_id, neighbor_id, sim_r,
         |    row_number() OVER (PARTITION BY q_id ORDER BY sim_r DESC, neighbor_id) AS rnk
         |  FROM cand)
         |SELECT q_id, rnk::BIGINT AS rnk, neighbor_id, sim_r FROM r
         |WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,
    "s_dedup_embedding" ->
      s"""WITH $vSql,
         |$codedPairsSql
         |SELECT a_id, b_id, sim_r, sim_r >= 0.45 AS is_dup
         |FROM pairs ORDER BY a_id, b_id""".stripMargin,
    "s_cluster_profile" ->
      s"""WITH $vSql,
         |c0 AS (SELECT vec_id AS c_id, e AS ce, nrm AS cn FROM v WHERE vec_id < 16),
         |${kmeansIterSql(1, "c0")},
         |${kmeansIterSql(2, "c1")},
         |sims AS (SELECT v.vec_id, c.c_id,
         |    floor(list_dot_product(v.e, c.ce) / (v.nrm * c.cn) * 1e6 + 0.5) / 1e6 AS csim
         |  FROM v, c2 c),
         |ranked AS (SELECT vec_id, c_id AS cell, csim,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, c_id) AS crk
         |  FROM sims),
         |cells AS (SELECT vec_id, cell, csim FROM ranked WHERE crk = 1)
         |SELECT cell, em.label, count(*)::BIGINT AS n_vecs, min(csim) AS min_csim
         |FROM cells JOIN embeddings em ON cells.vec_id = em.vec_id
         |GROUP BY cell, em.label ORDER BY cell, em.label""".stripMargin,
    "s_silhouette" ->
      s"""WITH $vSql,
         |c0 AS (SELECT vec_id AS c_id, e AS ce, nrm AS cn FROM v WHERE vec_id < 16),
         |${kmeansIterSql(1, "c0")},
         |${kmeansIterSql(2, "c1")},
         |sims AS (SELECT v.vec_id, c.c_id,
         |    floor(list_dot_product(v.e, c.ce) / (v.nrm * c.cn) * 1e6 + 0.5) / 1e6 AS csim
         |  FROM v, c2 c),
         |ranked AS (SELECT vec_id, c_id, csim,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, c_id) AS crk
         |  FROM sims),
         |pts AS (SELECT o.vec_id, o.c_id AS cell,
         |    (1.0 - o.csim) AS a_d, (1.0 - n.csim) AS b_d
         |  FROM ranked o JOIN ranked n ON o.vec_id = n.vec_id
         |  WHERE o.crk = 1 AND n.crk = 2),
         |sq AS (SELECT cell,
         |    floor((CASE WHEN greatest(a_d, b_d) = 0.0 THEN 0.0
         |           ELSE (b_d - a_d) / greatest(a_d, b_d) END) * 1e6 + 0.5)::BIGINT AS sil_q
         |  FROM pts)
         |SELECT cell, count(*)::BIGINT AS n_vecs,
         |  floor(SUM(sil_q)::DOUBLE / count(*) + 0.5) / 1e6 AS mean_sil_r,
         |  MIN(sil_q)::DOUBLE / 1e6 AS min_sil_r,
         |  MAX(sil_q)::DOUBLE / 1e6 AS max_sil_r
         |FROM sq GROUP BY cell ORDER BY cell""".stripMargin,
    "s_label_spread" ->
      s"""WITH vl AS (SELECT vec_id, label::BIGINT AS label, embedding::DOUBLE[] AS e,
         |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
         |  FROM embeddings),
         |lab AS (SELECT vec_id AS l_id, e AS qe, nrm AS qn, label AS l_label
         |  FROM vl WHERE vec_id % 4 = 0),
         |unl AS (SELECT vec_id, e, nrm, label AS true_label
         |  FROM vl WHERE vec_id % 4 != 0),
         |sc AS (SELECT u.vec_id, l.l_id, l.l_label,
         |    floor(list_dot_product(l.qe, u.e) / (l.qn * u.nrm) * 1e6 + 0.5) / 1e6 AS sim_r
         |  FROM unl u, lab l),
         |top5 AS (SELECT vec_id, l_id, l_label, sim_r FROM (
         |    SELECT vec_id, l_id, l_label, sim_r,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY sim_r DESC, l_id) AS rn
         |    FROM sc) WHERE rn <= 5),
         |votes AS (SELECT vec_id, l_label, count(*)::BIGINT AS n_votes,
         |    max(sim_r) AS best_sim FROM top5 GROUP BY 1, 2),
         |pred AS (SELECT vec_id, l_label, n_votes FROM (
         |    SELECT vec_id, l_label, n_votes,
         |      row_number() OVER (PARTITION BY vec_id
         |        ORDER BY n_votes DESC, best_sim DESC, l_label) AS rn
         |    FROM votes) WHERE rn = 1)
         |SELECT p.vec_id, p.l_label AS pred_label, p.n_votes, u.true_label,
         |  (p.l_label = u.true_label)::BIGINT AS correct
         |FROM pred p JOIN unl u USING (vec_id) ORDER BY vec_id""".stripMargin,
    "s_kcenter_select" -> {
      def dSql(pe: String, pn: String) =
        s"1.0 - floor(list_dot_product(s.e, $pe) / (s.nrm * $pn) * 1e6 + 0.5) / 1e6"
      val iters = (2 to KCenters).map { k =>
        s"""pk$k AS (SELECT vec_id, e, nrm, mind FROM (
           |    SELECT *, row_number() OVER (ORDER BY mind DESC, vec_id) AS rn
           |    FROM st${k - 1}) WHERE rn = 1),
           |p$k AS (SELECT $k::BIGINT AS rnk, vec_id, mind AS dist_r FROM pk$k),
           |st$k AS (SELECT s.vec_id, s.e, s.nrm,
           |    least(s.mind, ${dSql("p.e", "p.nrm")}) AS mind
           |  FROM st${k - 1} s, pk$k p)""".stripMargin
      }.mkString(",\n")
      s"""WITH $vSql,
         |c1 AS (SELECT e AS ce, nrm AS cn FROM v WHERE vec_id = 0),
         |st1 AS (SELECT s.vec_id, s.e, s.nrm,
         |    ${dSql("c1.ce", "c1.cn")} AS mind
         |  FROM v s, c1),
         |p1 AS (SELECT 1::BIGINT AS rnk, 0::BIGINT AS vec_id, 0.0::DOUBLE AS dist_r),
         |$iters,
         |sel AS (${(1 to KCenters).map(k => s"SELECT * FROM p$k").mkString(" UNION ALL ")}),
         |cents AS (SELECT sel.rnk, v.e AS ce, v.nrm AS cn
         |  FROM sel JOIN v ON v.vec_id = sel.vec_id),
         |asg0 AS (SELECT s.vec_id, c.rnk,
         |    1.0 - floor(list_dot_product(s.e, c.ce) / (s.nrm * c.cn) * 1e6 + 0.5) / 1e6 AS d
         |  FROM v s, cents c),
         |asg AS (SELECT vec_id, rnk, d FROM (
         |    SELECT vec_id, rnk, d,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d, rnk) AS rn
         |    FROM asg0) WHERE rn = 1),
         |agg AS (SELECT rnk, count(*)::BIGINT AS n_assigned, max(d) AS radius_r
         |  FROM asg GROUP BY 1)
         |SELECT sel.rnk, sel.vec_id, sel.dist_r,
         |  COALESCE(agg.n_assigned, 0)::BIGINT AS n_assigned,
         |  COALESCE(agg.radius_r, 0.0)::DOUBLE AS radius_r
         |FROM sel LEFT JOIN agg USING (rnk) ORDER BY sel.rnk""".stripMargin
    },
    "s_mmr_diversify" -> {
      val iters = (2 to 5).map { k =>
        s"""rem$k AS (SELECT c.q_id, c.vec_id, c.sim_r FROM cand c
           |  LEFT JOIN cum${k - 1} s ON s.q_id = c.q_id AND s.vec_id = c.vec_id
           |  WHERE s.vec_id IS NULL),
           |pen$k AS (SELECT ps.q_id, ps.x_id AS vec_id, max(ps.psim) AS pen
           |  FROM ps JOIN cum${k - 1} s ON s.q_id = ps.q_id AND s.vec_id = ps.y_id
           |  GROUP BY 1, 2),
           |sel$k AS (SELECT q_id, vec_id, $k::BIGINT AS rnk, sim_r, score_r FROM (
           |    SELECT r.q_id, r.vec_id, r.sim_r,
           |      floor((0.7 * r.sim_r - 0.3 * COALESCE(p.pen, 0.0)) * 1e6 + 0.5) / 1e6 AS score_r,
           |      row_number() OVER (PARTITION BY r.q_id ORDER BY
           |        floor((0.7 * r.sim_r - 0.3 * COALESCE(p.pen, 0.0)) * 1e6 + 0.5) / 1e6 DESC,
           |        r.vec_id) AS rn
           |    FROM rem$k r LEFT JOIN pen$k p ON p.q_id = r.q_id AND p.vec_id = r.vec_id)
           |  WHERE rn = 1),
           |cum$k AS (SELECT * FROM cum${k - 1} UNION ALL SELECT * FROM sel$k)""".stripMargin
      }.mkString(",\n")
      s"""WITH $vSql,
         |q AS (SELECT vec_id AS q_id, e AS qe, nrm AS qn FROM v WHERE vec_id < 10),
         |sc AS (SELECT q_id, v.vec_id,
         |    floor(list_dot_product(qe, v.e) / (qn * v.nrm) * 1e6 + 0.5) / 1e6 AS sim_r
         |  FROM q, v WHERE v.vec_id != q_id),
         |cand AS (SELECT q_id, vec_id, sim_r FROM (
         |    SELECT q_id, vec_id, sim_r,
         |      row_number() OVER (PARTITION BY q_id ORDER BY sim_r DESC, vec_id) AS rn
         |    FROM sc) WHERE rn <= 20),
         |ps AS (SELECT c1.q_id, c1.vec_id AS x_id, c2.vec_id AS y_id,
         |    floor(list_dot_product(vx.e, vy.e) / (vx.nrm * vy.nrm) * 1e6 + 0.5) / 1e6 AS psim
         |  FROM cand c1 JOIN cand c2 ON c1.q_id = c2.q_id AND c1.vec_id != c2.vec_id
         |  JOIN v vx ON vx.vec_id = c1.vec_id JOIN v vy ON vy.vec_id = c2.vec_id),
         |cum1 AS (SELECT q_id, vec_id, 1::BIGINT AS rnk, sim_r, score_r FROM (
         |    SELECT q_id, vec_id, sim_r,
         |      floor((0.7 * sim_r - 0.3 * 0.0) * 1e6 + 0.5) / 1e6 AS score_r,
         |      row_number() OVER (PARTITION BY q_id ORDER BY
         |        floor((0.7 * sim_r - 0.3 * 0.0) * 1e6 + 0.5) / 1e6 DESC, vec_id) AS rn
         |    FROM cand) WHERE rn = 1),
         |$iters
         |SELECT q_id, vec_id, rnk, sim_r, score_r FROM cum5
         |ORDER BY q_id, rnk""".stripMargin
    },
    "s_knn_graph" ->
      s"""WITH $vSql,
         |$codedSql,
         |probes AS (SELECT vec_id AS a_id, e AS qe, nrm AS qn,
         |    unnest(list_transform(generate_series(-1, 7), f ->
         |      CASE WHEN f = -1 THEN code
         |           ELSE xor(code, (1::BIGINT << f::INT)) END)) AS pcode
         |  FROM coded),
         |sc AS (SELECT p.a_id, c.vec_id AS b_id,
         |    round(list_dot_product(p.qe, c.e) / (p.qn * c.nrm), 6) AS sim_r
         |  FROM probes p JOIN coded c ON p.pcode = c.code AND p.a_id <> c.vec_id),
         |r AS (SELECT a_id, b_id, sim_r,
         |    ROW_NUMBER() OVER (PARTITION BY a_id ORDER BY sim_r DESC, b_id) AS rnk
         |  FROM sc)
         |SELECT a_id AS src_id, rnk, b_id AS neighbor_id, sim_r
         |FROM r WHERE rnk <= 3 ORDER BY src_id, rnk""".stripMargin,
    "s_hybrid_rrf" ->
      s"""WITH lex0 AS (${TextOps.oracles("d_bm25")}),
         |lexr AS (
         |  SELECT doc_id, lex_rank FROM (
         |    SELECT doc_id,
         |      row_number() OVER (ORDER BY score_r DESC, doc_id) AS lex_rank
         |    FROM lex0)
         |  WHERE lex_rank <= 50),
         |$vSql,
         |q0 AS (SELECT e AS qe, nrm AS qn FROM v WHERE vec_id = 0),
         |cos AS (SELECT vec_id,
         |    round(list_dot_product(qe, e) / (qn * nrm), 6) AS sim_r
         |  FROM v, q0 WHERE vec_id <> 0),
         |vecr AS (
         |  SELECT doc_id, vec_rank FROM (
         |    SELECT vec_id AS doc_id,
         |      row_number() OVER (ORDER BY sim_r DESC, vec_id) AS vec_rank
         |    FROM cos)
         |  WHERE vec_rank <= 50),
         |fused AS (
         |  SELECT coalesce(l.doc_id, r.doc_id) AS doc_id, l.lex_rank, r.vec_rank,
         |    round(coalesce(CAST(1 AS DOUBLE) / (CAST(60 AS DOUBLE) + CAST(l.lex_rank AS DOUBLE)), 0)
         |      + coalesce(CAST(1 AS DOUBLE) / (CAST(60 AS DOUBLE) + CAST(r.vec_rank AS DOUBLE)), 0), 6) AS rrf_r
         |  FROM lexr l FULL OUTER JOIN vecr r ON l.doc_id = r.doc_id)
         |SELECT rnk, doc_id, lex_rank, vec_rank, rrf_r FROM (
         |  SELECT *, row_number() OVER (ORDER BY rrf_r DESC, doc_id) AS rnk
         |  FROM fused)
         |WHERE rnk <= 20 ORDER BY rnk""".stripMargin,
    "s_dedup_semantic" ->
      s"""WITH RECURSIVE $vSql,
         |$codedPairsSql,
         |dup AS (SELECT a_id, b_id FROM pairs WHERE sim_r >= 0.45),
         |edges AS (SELECT a_id AS s, b_id AS d FROM dup
         |  UNION SELECT b_id, a_id FROM dup),
         |reach AS (
         |  SELECT s AS id, d AS r FROM edges
         |  UNION
         |  SELECT reach.id, edges.d FROM reach JOIN edges ON reach.r = edges.s),
         |clusters AS (SELECT id, least(id, min(r)) AS cluster_id
         |  FROM reach GROUP BY id),
         |members AS (SELECT v.vec_id,
         |    coalesce(c.cluster_id, v.vec_id) AS cluster_id
         |  FROM v LEFT JOIN clusters c ON v.vec_id = c.id)
         |SELECT cluster_id, count(*)::BIGINT AS n_members,
         |  min(vec_id) AS survivor_id
         |FROM members GROUP BY cluster_id ORDER BY cluster_id""".stripMargin,
    // identical result set to s_ann_ivf by construction (same centroids,
    // same probe ranking) — the entry exists so the INDEXED path is gated
    "s_ann_ivf_indexed" ->
      s"""WITH $vSql,
         |c AS (SELECT vec_id AS c_id, e AS ce, nrm AS cn FROM v WHERE vec_id < 16),
         |sims AS (SELECT v.vec_id, v.e, v.nrm, c.c_id,
         |    floor(list_dot_product(v.e, c.ce) / (v.nrm * c.cn) * 1e6 + 0.5) / 1e6 AS csim
         |  FROM v, c),
         |ranked AS (SELECT vec_id, e, nrm, c_id AS cell, csim,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, c_id) AS crk
         |  FROM sims),
         |cells AS (SELECT vec_id, e, nrm, cell FROM ranked WHERE crk = 1),
         |probes AS (SELECT vec_id AS q_id, e AS qe, nrm AS qn, cell
         |  FROM ranked WHERE crk <= 2 AND vec_id < 10),
         |cand AS (SELECT p.q_id, cl.vec_id AS neighbor_id, p.cell,
         |    round(list_dot_product(p.qe, cl.e) / (p.qn * cl.nrm), 6) AS sim_r
         |  FROM probes p JOIN cells cl ON p.cell = cl.cell AND p.q_id != cl.vec_id),
         |r AS (SELECT q_id, neighbor_id, sim_r, cell,
         |    row_number() OVER (PARTITION BY q_id ORDER BY sim_r DESC, neighbor_id) AS rnk
         |  FROM cand)
         |SELECT q_id, rnk::BIGINT AS rnk, neighbor_id, sim_r, cell FROM r
         |WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,
    "s_ann_ivf_kmeans" ->
      s"""WITH $vSql,
         |c0 AS (SELECT vec_id AS c_id, e AS ce, nrm AS cn FROM v WHERE vec_id < 16),
         |${kmeansIterSql(1, "c0")},
         |${kmeansIterSql(2, "c1")},
         |sims AS (SELECT v.vec_id, v.e, v.nrm, c.c_id,
         |    floor(list_dot_product(v.e, c.ce) / (v.nrm * c.cn) * 1e6 + 0.5) / 1e6 AS csim
         |  FROM v, c2 c),
         |ranked AS (SELECT vec_id, e, nrm, c_id AS cell, csim,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, c_id) AS crk
         |  FROM sims),
         |cells AS (SELECT vec_id, e, nrm, cell FROM ranked WHERE crk = 1),
         |probes AS (SELECT vec_id AS q_id, e AS qe, nrm AS qn, cell
         |  FROM ranked WHERE crk <= 2 AND vec_id < 10),
         |cand AS (SELECT p.q_id, cl.vec_id AS neighbor_id, p.cell,
         |    round(list_dot_product(p.qe, cl.e) / (p.qn * cl.nrm), 6) AS sim_r
         |  FROM probes p JOIN cells cl ON p.cell = cl.cell AND p.q_id != cl.vec_id),
         |r AS (SELECT q_id, neighbor_id, sim_r, cell,
         |    row_number() OVER (PARTITION BY q_id ORDER BY sim_r DESC, neighbor_id) AS rnk
         |  FROM cand)
         |SELECT q_id, rnk::BIGINT AS rnk, neighbor_id, sim_r, cell FROM r
         |WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,
    // exact-path unroll adjudicates the fast path's assignments: the
    // hash-partial-avg centroids agree with the exact fold's to <1e-6 per
    // component (IvfIndexSpec), and assignment ranks on 6-dp-rounded
    // cosine, so both spellings decide every vector identically.
    "s_ann_ivf_kmeans_fast" ->
      s"""WITH $vSql,
         |c0 AS (SELECT vec_id AS c_id, e AS ce, nrm AS cn FROM v WHERE vec_id < 16),
         |${kmeansIterSql(1, "c0")},
         |${kmeansIterSql(2, "c1")},
         |sims AS (SELECT v.vec_id, c.c_id,
         |    floor(list_dot_product(v.e, c.ce) / (v.nrm * c.cn) * 1e6 + 0.5) / 1e6 AS csim
         |  FROM v, c2 c)
         |SELECT vec_id, c_id AS cell FROM (
         |  SELECT vec_id, c_id,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, c_id) AS crk
         |  FROM sims) WHERE crk = 1 ORDER BY vec_id""".stripMargin,
    "s_ann_graph_expand" ->
      s"""WITH $vSql,
         |$codedSql,
         |gprobes AS (SELECT vec_id AS a_id, e AS qe, nrm AS qn,
         |    unnest(list_transform(generate_series(-1, 7), f ->
         |      CASE WHEN f = -1 THEN code
         |           ELSE xor(code, (1::BIGINT << f::INT)) END)) AS pcode
         |  FROM coded),
         |gsc AS (SELECT p.a_id, c.vec_id AS b_id,
         |    round(list_dot_product(p.qe, c.e) / (p.qn * c.nrm), 6) AS sim_r
         |  FROM gprobes p JOIN coded c ON p.pcode = c.code AND p.a_id <> c.vec_id),
         |edges AS (SELECT a_id AS src_id, b_id AS neighbor_id FROM (
         |  SELECT a_id, b_id, ROW_NUMBER() OVER (PARTITION BY a_id
         |    ORDER BY sim_r DESC, b_id) AS rnk FROM gsc) WHERE rnk <= 3),
         |ctr AS (SELECT vec_id AS c_id, e AS ce, nrm AS cn FROM v WHERE vec_id < 16),
         |csims AS (SELECT v.vec_id, v.e, v.nrm, ctr.c_id,
         |    floor(list_dot_product(v.e, ctr.ce) / (v.nrm * ctr.cn) * 1e6 + 0.5) / 1e6 AS csim
         |  FROM v, ctr),
         |cells AS (SELECT vec_id, e, nrm, c_id AS cell FROM (
         |  SELECT vec_id, e, nrm, c_id, csim, ROW_NUMBER() OVER (
         |    PARTITION BY vec_id ORDER BY csim DESC, c_id) AS crk FROM csims)
         |  WHERE crk = 1),
         |qprobes AS (SELECT vec_id AS q_id, e AS qe, nrm AS qn, cell
         |  FROM cells WHERE vec_id < 10),
         |seedc AS (SELECT p.q_id, cl.vec_id,
         |    round(list_dot_product(p.qe, cl.e) / (p.qn * cl.nrm), 6) AS sim_r
         |  FROM qprobes p JOIN cells cl ON p.cell = cl.cell AND p.q_id != cl.vec_id),
         |seeds AS (SELECT q_id, vec_id AS cand_id FROM (
         |  SELECT q_id, vec_id, ROW_NUMBER() OVER (PARTITION BY q_id
         |    ORDER BY sim_r DESC, vec_id) AS rnk FROM seedc) WHERE rnk <= 3),
         |cand AS (SELECT DISTINCT q_id, cand_id FROM (
         |  SELECT q_id, cand_id FROM seeds
         |  UNION ALL
         |  SELECT s.q_id, e.neighbor_id FROM seeds s
         |  JOIN edges e ON s.cand_id = e.src_id)
         |  WHERE q_id != cand_id),
         |rer AS (SELECT c.q_id, c.cand_id,
         |    round(list_dot_product(vq.e, vc.e) / (vq.nrm * vc.nrm), 6) AS sim_r
         |  FROM cand c JOIN v vq ON c.q_id = vq.vec_id
         |              JOIN v vc ON c.cand_id = vc.vec_id)
         |SELECT q_id, rnk::BIGINT AS rnk, cand_id AS neighbor_id, sim_r FROM (
         |  SELECT q_id, cand_id, sim_r, ROW_NUMBER() OVER (PARTITION BY q_id
         |    ORDER BY sim_r DESC, cand_id) AS rnk FROM rer)
         |WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,
    "s_ann_ivf" ->
      s"""WITH $vSql,
         |$ivfCtes
         |SELECT q_id, rnk::BIGINT AS rnk, neighbor_id, sim_r, cell FROM r
         |WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,
    "s_ann_recall" ->
      s"""WITH $vSql,
         |$ivfCtes,
         |ivf5 AS (SELECT q_id, neighbor_id FROM r WHERE rnk <= 5),
         |xq AS (SELECT vec_id AS q_id, e AS qe, nrm AS qn FROM v WHERE vec_id < 10),
         |xp AS (SELECT q_id, vec_id AS neighbor_id,
         |    round(list_dot_product(qe, e) / (qn * nrm), 6) AS sim_r
         |  FROM xq, v WHERE vec_id != q_id),
         |xr AS (SELECT q_id, neighbor_id,
         |    row_number() OVER (PARTITION BY q_id ORDER BY sim_r DESC, neighbor_id) AS rnk
         |  FROM xp),
         |ex5 AS (SELECT q_id, neighbor_id FROM xr WHERE rnk <= 5)
         |SELECT e.q_id,
         |  sum(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hits,
         |  count(*)::BIGINT AS k,
         |  sum(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
         |    / count(*)::DOUBLE AS recall_r
         |FROM ex5 e LEFT JOIN ivf5 i
         |  ON e.q_id = i.q_id AND e.neighbor_id = i.neighbor_id
         |GROUP BY 1 ORDER BY 1""".stripMargin
  )

  /** The one-shot IVF chain (stand-in centroids = the 16 lowest-id
    * vectors), shared by the s_ann_ivf gate and the s_ann_recall audit so
    * the audited path and the audit cannot drift apart.
    */
  private lazy val ivfCtes: String =
    """c AS (SELECT vec_id AS c_id, e AS ce, nrm AS cn FROM v WHERE vec_id < 16),
      |sims AS (SELECT v.vec_id, v.e, v.nrm, c.c_id,
      |    floor(list_dot_product(v.e, c.ce) / (v.nrm * c.cn) * 1e6 + 0.5) / 1e6 AS csim
      |  FROM v, c),
      |ranked AS (SELECT vec_id, e, nrm, c_id AS cell, csim,
      |    row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, c_id) AS crk
      |  FROM sims),
      |cells AS (SELECT vec_id, e, nrm, cell FROM ranked WHERE crk = 1),
      |probes AS (SELECT vec_id AS q_id, e AS qe, nrm AS qn, cell
      |  FROM ranked WHERE crk <= 2 AND vec_id < 10),
      |cand AS (SELECT p.q_id, cl.vec_id AS neighbor_id, p.cell,
      |    round(list_dot_product(p.qe, cl.e) / (p.qn * cl.nrm), 6) AS sim_r
      |  FROM probes p JOIN cells cl ON p.cell = cl.cell AND p.q_id != cl.vec_id),
      |r AS (SELECT q_id, neighbor_id, sim_r, cell,
      |    row_number() OVER (PARTITION BY q_id ORDER BY sim_r DESC, neighbor_id) AS rnk
      |  FROM cand)""".stripMargin
}
