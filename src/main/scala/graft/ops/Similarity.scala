package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (extension surface; driven by
  * the `embeddings` testdata table, `embedding: array<float>` dim 64).
  *
  * Scale design: brute-force top-k is the verified baseline — queries are
  * broadcast, so the big side streams through untouched (no shuffle of the
  * corpus; O(Q·N) flops spread across its partitions, then a top-k window
  * over Q·N rows reduced by per-partition pre-filtering via AQE).
  * The LSH-bucketed variant is the 100 TB path: random-hyperplane
  * signatures put near vectors in the same bucket, and the pair join only
  * touches same-bucket rows. Recall < 1 by construction; probe multiple
  * bands to trade cost for recall.
  */
object Similarity {

  /** Cosine similarity of two array<double> columns. Default: the native
    * `CosineSim` expression (tight loop; see its scaladoc for the measured
    * HOF cost that forced the escalation). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSim.cosine_sim(a, b)

  /** Built-ins-only baseline (zip_with + aggregate): numerically identical
    * accumulation order to `cosine`; kept as the reference implementation
    * and for engines/tests that want zero custom expressions. */
  def cosineHof(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0d), (acc, v) => acc + v)
    def norm(x: Column): Column = sqrt(dot(x, x))
    dot(a, b) / (norm(a) * norm(b))
  }

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Brute-force cosine top-k: for each query vector (a deterministic
    * subset: id % stride == 0), the k nearest others. Cosine rounded to 4
    * decimals BEFORE ranking + id tie-break ⇒ deterministic, oracle-safe. */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
                     k: Int = 5, stride: Long = 100): DataFrame = {
    val base = emb.select(col(idCol).as("cand_id"), asDouble(col(vecCol)).as("v"))
    val queries = base.filter(col("cand_id") % stride === 0)
      .select(col("cand_id").as("query_id"), col("v").as("qv"))
    val scored = base.join(broadcast(queries), col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"),
        // + 0.0 pins the sign of a zero cosine to the oracle's
        // `round(...) + 0.0` face (q108 r9 signed-zero postmortem)
        (round(cosine(col("qv"), col("v")), 4) + lit(0.0)).as("cos"))
    Windows.topKPerGroup(scored, Seq(col("query_id")),
      Seq(col("cos").desc, col("cand_id").asc), k)
  }

  /** MUTUAL TOP-1 (reciprocal best match) — the symmetric-evidence
    * pairing bitext/alignment mining runs on (Artetxe & Schwenk 2019's
    * margin criterion starts here): a pair (a, b) survives only if a
    * is b's single nearest neighbor AND b is a's. One-directional
    * top-1 is hub-polluted (a generic vector is "nearest" to
    * everything); mutuality kills hubs without any threshold to tune —
    * the high-precision seed set for translation pairs, near-dup
    * verification, and record linkage.
    *
    * Determinism: the q26 contract (cosine round-4 +0.0 before
    * ranking, cand_id tie-break); the mutual join and the a < b
    * canonicalization are exact. Output: (id_a, id_b, cos) with
    * id_a < id_b.
    *
    * Scale shape: the scoring stage here is the brute pair join over
    * the stride subset (the q26/q275 sample-truth eval class —
    * (N/stride)² pairs); this face is the ORACLE for
    * [[mutualTopOneRouted]], the shipped corpus-scale form — the top-1
    * + mutual-join tail ([[mutualTail]]) is byte-shared. The mutual
    * check itself is one self-join on (query, best) —
    * candidate-mass-free. */
  def mutualTopOne(emb: DataFrame, idCol: String, vecCol: String,
                   stride: Long = 10): DataFrame = {
    require(stride >= 1, "need stride >= 1")
    val sub = emb.filter(col(idCol) % stride === 0)
      .select(col(idCol).as("cand_id"), asDouble(col(vecCol)).as("v"))
      .localCheckpoint(eager = false)
    val scored = sub
      .join(sub.select(col("cand_id").as("query_id"), col("v").as("qv")),
        col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"),
        (round(cosine(col("qv"), col("v")), 4) + lit(0.0)).as("cos"))
    mutualTail(scored)
  }

  /** The mutual-pairing tail shared byte-identically by [[mutualTopOne]]
    * and [[mutualTopOneRouted]]: per-query top-1 of the scored
    * (query_id, cand_id, cos) relation (cos desc, cand_id asc — the q26
    * contract), then the reciprocal self-join with a < b
    * canonicalization. The best relation checkpoints once — the mutual
    * join reads it twice. */
  private def mutualTail(scored: DataFrame): DataFrame = {
    val best = Windows.topKPerGroup(scored, Seq(col("query_id")),
        Seq(col("cos").desc, col("cand_id").asc), 1)
      .select(col("query_id"), col("cand_id"), col("cos"))
      .localCheckpoint(eager = false)
    best.filter(col("query_id") < col("cand_id"))
      .join(best.select(col("cand_id").as("query_id"),
        col("query_id").as("cand_id")), Seq("query_id", "cand_id"))
      .select(col("query_id").as("id_a"), col("cand_id").as("id_b"),
        col("cos"))
  }

  /** [[mutualTopOneRouted]]'s scored candidate relation — the stride
    * subset routes through the [[ivfRouting]] coarse quantizer
    * (centroids = min-id subset rows, round-6 cosine assignment,
    * cent_id tie-break); EVERY subset member is a query (mutuality
    * needs both directions), each probing its `nProbe` nearest cells
    * and scoring ALL their members with the round-4 + signed-zero
    * cosine (the q149 over-fetch contract — routing shrinks the
    * candidate set, never reorders what survives it). Exposed for the
    * stress gate: this relation's row count is the routed pair mass
    * ((N/stride)²·nProbe/C on uniform cells) vs the brute face's
    * (N/stride)² — a lost nProbe filter reverts it to ≈ the brute
    * class. */
  private[graft] def mutualRoutedScored(emb: DataFrame, idCol: String,
                                        vecCol: String, stride: Long,
                                        nCentroids: Int, nProbe: Int)
      : DataFrame = {
    val sub = emb.filter(col(idCol) % stride === 0)
      .select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    val (_, cells, probes) = ivfRouting(sub, nCentroids, nProbe,
      queryStride = 1L)
    probes.select(col("cent_id"), col("query_id"), col("v").as("qv"))
      .join(cells.select(col("cent_id"), col("id").as("cand_id"),
        col("v")), Seq("cent_id"))
      .filter(col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"),
        (round(cosine(col("qv"), col("v")), 4) + lit(0.0)).as("cos"))
  }

  /** ROUTED mutual top-1 — [[mutualTopOne]]'s pairing on the
    * [[ivfRouting]] candidate stage (the q190/q206/q149 move applied
    * to the last brute-quadratic pair stage in a registered mining
    * face): instead of an (N/stride)² self-join, each subset member
    * scores only the members of its `nProbe` probed IVF cells, and the
    * top-1 + mutual-join tail runs byte-identically ([[mutualTail]]).
    * At nProbe = nCentroids every cell is probed, the candidate
    * relation IS the brute pair set, and the output EQUALS the brute
    * face exactly (exhaustive equivalence, spec-pinned). At nProbe <
    * nCentroids a true best match hiding outside the probed cells is
    * unseen — and because mutuality requires BOTH directions to
    * survive routing, the routed pair set skews high-precision (a pair
    * split across unprobed cells drops; a kept pair still carries
    * exact cosines). Measured (RecallProbe, sf0.1, nProbe = 4 of 16):
    * 17 of 50 brute pairs survive routing (recall 0.340, precision
    * 0.515) on the synthetic ISOTROPIC corpus — the IVF worst case,
    * the same regime as q206's 0.515 and q149's 0.550 (clustered real
    * corpora route much tighter, the q158 precedent; and for seed-pair
    * mining the routed set is still the high-precision regime — every
    * kept pair is reciprocally best WITHIN its routed neighborhood).
    *
    * Scale shape: ONE nCentroids-row broadcast, one subset assignment
    * window, one probe window, a per-cell equi-join whose mass is
    * stress-gated (MUTUAL_ROUTE_COST_CLASS), then the candidate-mass-
    * free mutual join. The subset never broadcasts, nothing is
    * quadratic in the corpus. Size C ≈ √(N/stride) (the FAISS nlist
    * guidance, the q190 sizing note). */
  def mutualTopOneRouted(emb: DataFrame, idCol: String, vecCol: String,
                         stride: Long = 10, nCentroids: Int = 16,
                         nProbe: Int = 4): DataFrame = {
    require(stride >= 1 && nCentroids >= 1 && nProbe >= 1,
      "need stride, nCentroids, nProbe >= 1")
    mutualTail(mutualRoutedScored(emb, idCol, vecCol, stride,
      nCentroids, nProbe))
  }

  /** MUTUAL-PAIR LABEL PURITY — the chance-corrected quality read of
    * [[mutualTopOneRouted]]'s pairing: of the reciprocal best-match pairs,
    * what share joins two SAME-label vectors, and how far above luck
    * is that? Chance = Σ_l p_l² (the probability two independent draws
    * from the subset's label marginals agree — the q209 p_e idea on
    * pairs); lift = purity − chance is the signed SUBTRACTION of two
    * floored micros (no signed division — the q238 idiom). The
    * embedding-space sibling of a clustering purity card: if mutual
    * pairs aren't label-pure far above chance, the embedding isn't
    * separating the classes and every downstream kNN/dedup decision
    * inherits that.
    *
    * Determinism: pairs are the q278 contract; agreement and marginal
    * counts are exact integers; purity = (1e6·agree) div n_pairs,
    * chance = (1e6·Σc_l²) div n², both non-negative floors. No pairs
    * → NULL purity/lift, never 0/0.
    *
    * Scale shape: [[mutualTopOneRouted]]'s gated cost class plus two
    * label equi-joins (the label relation is subset-proportional —
    * N/stride rows — so it is NOT broadcast-hinted; the planner picks,
    * and at corpus scale it shuffles on the pair ids) and one
    * label-marginal agg. Output: one row
    * (n_pairs, n_agree, purity_micros, chance_micros, lift_micros). */
  def mutualPairPurity(emb: DataFrame, idCol: String, vecCol: String,
                       labelCol: String, stride: Long = 10,
                       nCentroids: Int = 16, nProbe: Int = 4)
      : DataFrame = {
    val pairs = mutualTopOneRouted(emb, idCol, vecCol, stride,
      nCentroids, nProbe)
    val labels = emb.filter(col(idCol) % stride === 0)
      .select(col(idCol).as("__id"), col(labelCol).as("__l"))
      .localCheckpoint(eager = false)
    val agree = pairs
      .join(labels.select(col("__id").as("id_a"),
        col("__l").as("la")), Seq("id_a"))
      .join(labels.select(col("__id").as("id_b"),
        col("__l").as("lb")), Seq("id_b"))
      .agg(count(lit(1)).as("n_pairs"),
        sum((col("la") === col("lb")).cast("long")).as("n_agree"))
    val marg = labels.groupBy(col("__l"))
      .agg(count(lit(1)).as("c"))
      .agg(sum(col("c")).as("n"),
        sum(col("c").cast("decimal(38,0)") * col("c")).as("c2"))
    agree.crossJoin(broadcast(marg))
      .select(col("n_pairs"), coalesce(col("n_agree"), lit(0L))
          .as("n_agree"),
        when(col("n_pairs") > 0,
          expr("(1000000L * n_agree) div n_pairs")).as("purity_micros"),
        expr("try_cast((1000000L * c2) div (cast(n as decimal(38,0))" +
          " * n) as bigint)").as("chance_micros"))
      .withColumn("lift_micros",
        col("purity_micros") - col("chance_micros"))
  }

  /** MATRYOSHKA TRUNCATION EVAL (Kusupati et al. 2022's MRL read) —
    * "can we store the first d dims and keep retrieval": for each
    * truncation d, rank by cosine over the PREFIX d components and
    * score top-k overlap against the full-dim top-k. The modern
    * storage-vs-recall decision card (a 64→16 truncation is a 4×
    * index-size cut; this measures exactly what it costs), sibling to
    * the PQ/IVF-PQ recall probes but for the dimension axis.
    *
    * Determinism: the q26 contract end-to-end — cosine round-4 +0.0
    * BEFORE ranking, cand_id tie-break; overlap counts are exact
    * integers and the mean floors to micros ((1e6·hits) div (k·n_q)).
    *
    * Scale shape: ONE pair stage scores every evaluated dim at once
    * (prefix slices of the same vectors — no per-dim corpus rescan),
    * lazily checkpointed so the |dims|+1 rank windows read one
    * materialization. Runs in the documented brute-eval cost class
    * (the q26/q189 sample-truth anchor family: queries are a stride
    * sample, broadcast against one corpus scan); at corpus scale the
    * same card runs over a sampled slice or an [[ivfTopK]]-routed
    * candidate set. Output: one row per dim
    * (trunc_dim, n_queries, k, overlap_micros). */
  def mrlTruncationEval(emb: DataFrame, idCol: String, vecCol: String,
                        dims: Seq[Int], k: Int = 5, stride: Long = 100)
      : DataFrame = {
    require(dims.nonEmpty && dims.forall(_ >= 1) && k >= 1 &&
      stride >= 1, "need dims >= 1, k >= 1, stride >= 1")
    val base = emb.select(col(idCol).as("cand_id"),
      asDouble(col(vecCol)).as("v"))
    val queries = base.filter(col("cand_id") % stride === 0)
      .select(col("cand_id").as("query_id"), col("v").as("qv"))
    val scored = base
      .join(broadcast(queries), col("cand_id") =!= col("query_id"))
      .select(Seq(col("query_id"), col("cand_id"),
        (round(cosine(col("qv"), col("v")), 4) + lit(0.0))
          .as("cos_full")) ++
        dims.map(d =>
          (round(cosine(slice(col("qv"), 1, d), slice(col("v"), 1, d)),
            4) + lit(0.0)).as(s"cos_$d")): _*)
      .localCheckpoint(eager = false)
    val topFull = Windows.topKPerGroup(scored, Seq(col("query_id")),
        Seq(col("cos_full").desc, col("cand_id").asc), k)
      .select(col("query_id"), col("cand_id"))
      .localCheckpoint(eager = false)
    val nq = broadcast(queries.agg(count(lit(1)).as("n_queries")))
    dims.map { d =>
      val topD = Windows.topKPerGroup(scored, Seq(col("query_id")),
          Seq(col(s"cos_$d").desc, col("cand_id").asc), k)
        .select(col("query_id"), col("cand_id"))
      topD.join(topFull, Seq("query_id", "cand_id"))
        .agg(count(lit(1)).as("hits"))
        .crossJoin(nq)
        .select(lit(d.toLong).as("trunc_dim"), col("n_queries"),
          lit(k.toLong).as("k"),
          expr(s"(1000000L * hits) div (${k}L * n_queries)")
            .as("overlap_micros"))
    }.reduce(_ unionByName _)
  }

  /** k-NN MAJORITY-VOTE CLASSIFIER — the simplest embedding-space
    * labeler (Fix & Hodges 1951): each query takes the modal label of
    * its k nearest labeled vectors by cosine; vote ties break to the
    * SMALLEST label, rank ties to the smallest candidate id (the q26
    * determinism contract). The weak-supervision move a curation
    * pipeline uses to spread a small audited label set over a corpus —
    * the non-graph sibling of [[graft.ops.Graph.labelPropagation]].
    * Output: (query_id, pred_label, votes).
    *
    * Scale shape: queries broadcast against the labeled corpus (one
    * scan, no shuffle of the big side), per-query top-k via
    * WindowGroupLimit, then a tiny (query, label) vote count. Swap the
    * brute-force scoring for [[ivfTopK]] routing at corpus scale — the
    * vote stage is identical. */
  def knnClassify(labeled: DataFrame, queries: DataFrame, k: Int = 5)
      : DataFrame = {
    val base = labeled.select(col("id").as("cand_id"),
      asDouble(col("vec")).as("v"), col("label"))
    val q = queries.select(col("id").as("query_id"),
      asDouble(col("vec")).as("qv"))
    val scored = base.join(broadcast(q), col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"), col("label"),
        (round(cosine(col("qv"), col("v")), 4) + lit(0.0)).as("cos"))
    modalVote(scored, k)
  }

  /** The kNN-classification vote tail shared byte-identically by
    * [[knnClassify]] and [[knnClassifyRouted]]: per-query top-k of the
    * scored (query_id, cand_id, label, cos) relation (cos desc,
    * cand_id asc — the q26 contract), then the modal label with vote
    * ties breaking to the SMALLEST label. */
  private def modalVote(scored: DataFrame, k: Int): DataFrame = {
    val top = Windows.topKPerGroup(scored, Seq(col("query_id")),
      Seq(col("cos").desc, col("cand_id").asc), k)
    val votes = top.groupBy(col("query_id"), col("label"))
      .agg(count(lit(1)).as("votes"))
    Windows.topOneByAgg(votes, Seq(col("query_id")),
      struct(col("votes"), (-col("label")).as("neg")))
      .select(col("query_id"), col("label").as("pred_label"), col("votes"))
  }

  /** [[knnClassifyRouted]]'s scored candidate relation — queries probe
    * their `nProbe` nearest IVF cells (centroids seeded from the
    * LABELED corpus: min-id rows, round-6 cosine assignment, cent_id
    * tie-break — the [[ivfRouting]] quantizer contract) and score
    * EVERY labeled member of those cells with the round-4 +
    * signed-zero cosine. Scoring all probed members IS the over-fetch
    * (the q206 precedent): the top-k cut and the vote run downstream
    * exactly as in the brute face, so a crowded modal label can never
    * be starved by a pre-cut — routing only shrinks the candidate
    * set, never reorders what survives. Exposed for the stress gate:
    * this relation's row count is the routed candidate mass
    * (queries × their probed cells' members) vs the brute face's
    * queries × N — a lost nProbe filter reverts it to ≈ the brute
    * class. */
  private[graft] def knnRoutedScored(labeled: DataFrame, queries: DataFrame,
                                     nCentroids: Int, nProbe: Int)
      : DataFrame = {
    val base = labeled.select(col("id"), asDouble(col("vec")).as("v"),
      col("label"))
    val cents = base.orderBy(col("id")).limit(nCentroids)
      .select(col("id").as("cent_id"), col("v").as("cv"))
    val ca = broadcast(centsArr(cents))
    val cells = base.crossJoin(ca)
      .select(topCent1(col("v")).as("cent_id"), col("id").as("cand_id"),
        col("v"), col("label"))
    val probes = queries.select(col("id").as("query_id"),
        asDouble(col("vec")).as("qv"))
      .crossJoin(ca)
      .select(col("query_id"), col("qv"),
        explode(graft.functions.IvfTopCents.ivf_top_cents(col("qv"),
          col("__cents"), nProbe)).as("p"))
      .select(col("p.cent_id").as("cent_id"), col("query_id"), col("qv"))
    probes.join(cells, Seq("cent_id"))
      .filter(col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"), col("label"),
        (round(cosine(col("qv"), col("v")), 4) + lit(0.0)).as("cos"))
  }

  /** ROUTED k-NN majority-vote classification — [[knnClassify]]'s vote
    * on the [[ivfRouting]] candidate stage (the q190/q206 move applied
    * to the last corpus-proportional broadcast in the family): instead
    * of broadcasting the query slice into a queries × N brute cosine
    * stage, each query scores only the members of its `nProbe` probed
    * IVF cells. The vote/tie contract is byte-shared ([[modalVote]]),
    * so at nProbe = nCentroids the routed predictions EQUAL the brute
    * predictions exactly (exhaustive equivalence, spec-pinned); at
    * nProbe < nCentroids a neighbor hiding outside the probed cells is
    * unseen — the standard ANN recall trade. Measured (RecallProbe,
    * sf0.1, nProbe = 4 of 16, k = 5): 0.550 prediction agreement vs
    * the brute face (11 of 20 queries) on the synthetic ISOTROPIC
    * corpus — the IVF worst case, the same regime as q206's 0.515
    * (clustered real corpora route much tighter, the q158 precedent;
    * and for weak supervision a vote over routed near-neighbors is
    * still a valid label estimate even when it differs from the
    * global-k vote).
    *
    * Scale shape: ONE broadcast of nCentroids rows, one labeled-corpus
    * assignment window, one query-slice probe window, and a per-cell
    * equi-join whose mass is stress-gated (KNN_ROUTE_COST_CLASS) —
    * queries never broadcast, the corpus never broadcasts. Candidate
    * mass is queries·N·nProbe/C with C = nCentroids: size C with the
    * corpus, C ≈ √N (the FAISS nlist guidance, the q190 sizing note). */
  def knnClassifyRouted(labeled: DataFrame, queries: DataFrame, k: Int = 5,
                        nCentroids: Int = 16, nProbe: Int = 4)
      : DataFrame = {
    require(k >= 1 && nCentroids >= 1 && nProbe >= 1,
      "need k, nCentroids, nProbe >= 1")
    modalVote(knnRoutedScored(labeled, queries, nCentroids, nProbe), k)
  }

  /** MAXIMAL MARGINAL RELEVANCE re-ranking (Carbonell & Goldstein
    * 1998) with λ = 1/2: greedily pick `k` results per query from its
    * `candK`-candidate pool, each pick the argmax of
    * `rel(d) − max_{s∈S} sim(d, s)` (λ = 1/2 makes the 2×-scaled MMR
    * objective this exact difference — two round-4 doubles subtracted,
    * so the sort key is bit-identical across engines and the oracle
    * unrolls the greedy loop as CTEs; pick 1 is pure relevance). The
    * diversity-aware top-k a retrieval or few-shot-selection stage
    * runs so near-duplicate passages don't crowd out coverage.
    *
    * Ties: mmr desc, then cand_id asc (q26 contract). Output:
    * (query_id, pick, cand_id, rel) — `pick` is the selection order.
    *
    * Scale shape: relevance is the [[bruteForceTopK]] broadcast scan
    * (swap in [[ivfTopK]] routing at corpus scale — the greedy stage
    * only ever sees the candidate pool); the pool (candK rows/query)
    * checkpoints once, then each of the k−1 steps is a per-query
    * equi-join of pool × selected (≤ candK·(k−1) sims per query) + a
    * degree-bounded window. Nothing global, nothing quadratic in the
    * corpus. */
  def mmrRerank(emb: DataFrame, idCol: String, vecCol: String,
                candK: Int = 20, k: Int = 5, stride: Long = 100)
      : DataFrame = {
    require(k >= 1 && candK >= k, "need 1 <= k <= candK")
    val base = emb.select(col(idCol).as("cand_id"),
      asDouble(col(vecCol)).as("v"))
    val queries = base.filter(col("cand_id") % stride === 0)
      .select(col("cand_id").as("query_id"), col("v").as("qv"))
    val scored = base.join(broadcast(queries),
        col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"), col("v"),
        (round(cosine(col("qv"), col("v")), 4) + lit(0.0)).as("rel"))
    val cands = Windows.topKPerGroup(scored, Seq(col("query_id")),
        Seq(col("rel").desc, col("cand_id").asc), candK)
      .localCheckpoint(eager = false)
    // each greedy step reads `picked` TWICE (anti-join of the pool and
    // the selected-vector sim join) and unions onto it — without a
    // per-step checkpoint the plan subtree doubles every step (2^k
    // recomputation; measured 29.9 s → 2.9 s at sf0.1, k=5, for the
    // checkpointed loop)
    var picked = Windows.topKPerGroup(cands, Seq(col("query_id")),
        Seq(col("rel").desc, col("cand_id").asc), 1)
      .withColumn("pick", lit(1L))
      .localCheckpoint(eager = false)
    for (step <- 2 to k) {
      val rem = cands.join(picked.select(col("query_id"), col("cand_id")),
        Seq("query_id", "cand_id"), "left_anti")
      val ms = rem
        .join(picked.select(col("query_id"), col("v").as("sv")),
          Seq("query_id"))
        .select(col("query_id"), col("cand_id"),
          (round(cosine(col("v"), col("sv")), 4) + lit(0.0)).as("sim"))
        .groupBy(col("query_id"), col("cand_id"))
        .agg(max(col("sim")).as("maxsim"))
      val next = Windows.topKPerGroup(
        rem.join(ms, Seq("query_id", "cand_id"))
          .withColumn("mmr", col("rel") - col("maxsim")),
        Seq(col("query_id")),
        Seq(col("mmr").desc, col("cand_id").asc), 1)
        .select(col("query_id"), col("cand_id"), col("v"), col("rel"))
        .withColumn("pick", lit(step.toLong))
      picked = picked.union(next).localCheckpoint(eager = false)
    }
    picked.select(col("query_id"), col("pick"), col("cand_id"), col("rel"))
  }

  /** MARGIN-BASED candidate mining (Artetxe & Schwenk 2019, "Margin-
    * based Parallel Corpus Mining with Multilingual Sentence
    * Embeddings" — the LASER/CCMatrix alignment criterion): a source→
    * target match is accepted not by raw cosine but by the RATIO
    * margin — cosine divided by the mean of the two sides' k-NN
    * cosines — which cancels the hubness that makes absolute-threshold
    * mining precision collapse (a "hub" target close to everything has
    * a high denominator everywhere, so it stops winning every source).
    * The checked face splits the embedding table by id parity into a
    * source and target half (the two-corpus case routes each side's
    * relation in); output is each source's best target by margin,
    * kept when margin ≥ `marginThresholdMicros` (ratio ≥ 1 = "closer
    * than its average neighborhood", the paper's operating point).
    *
    * Determinism: cosines are the round-4 + signed-zero contract
    * scaled to exact integer micros; k-NN means divide the summed
    * top-k cosines by the ACTUAL neighbor count n ≤ k via the SHIFT
    * idiom (Σcm + n·1e6) div n − 1e6, so the floor-division operand
    * is non-negative whatever the cosine signs and a side with fewer
    * than k neighbors is averaged over what it has (padding missing
    * neighbors with cosine 0 would deflate the denominator and bias
    * margins upward on tiny sides); the ratio divides
    * sign-symmetrically (sign(cm)·(2e6·|cm| div (aₓ+a_y)), NULL when
    * the denominator isn't positive). Ties: margin desc, target id asc.
    *
    * Scale shape: the pair relation broadcasts the query half against
    * one target scan and checkpoints ONCE (three readers: two k-NN
    * windows + the margin join); both windows are degree-bounded
    * top-k (WindowGroupLimit), the margin join is two equi-joins on
    * the pair keys. This brute face is the ORACLE for
    * [[marginMiningRouted]], the shipped corpus-scale form — margins
    * only ever need each side's top-k, which cell routing preserves. */
  def marginMining(emb: DataFrame, idCol: String, vecCol: String,
                   k: Int = 4, marginThresholdMicros: Long = 1000000L)
      : DataFrame = {
    require(k >= 1, "k must be >= 1")
    val base = emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    val src = base.filter(col("id") % 2 === 0)
      .select(col("id").as("src_id"), col("v").as("sv"))
    val dst = base.filter(col("id") % 2 === 1)
      .select(col("id").as("dst_id"), col("v").as("dv"))
    val pairs = dst.join(broadcast(src))
      .select(col("src_id"), col("dst_id"),
        round((round(cosine(col("sv"), col("dv")), 4) + lit(0.0)) *
          1000000).cast("long").as("cm"))
    marginFromPairs(pairs, k, marginThresholdMicros)
  }

  /** Shared margin tail over a (src_id, dst_id, cm) pair relation: the
    * two per-side k-NN mean windows, the ratio-margin join, and the
    * threshold + per-source top-1 — identical arithmetic for the brute
    * and routed pair stages (exhaustive-equivalence depends on it). */
  private def marginFromPairs(rawPairs: DataFrame, k: Int,
                              marginThresholdMicros: Long): DataFrame = {
    val pairs = rawPairs.localCheckpoint(eager = false)
    def nnAvg(side: String, other: String, out: String): DataFrame =
      Windows.topKPerGroup(pairs, Seq(col(side)),
          Seq(col("cm").desc, col(other).asc), k)
        .groupBy(col(side))
        .agg(sum(col("cm")).as("s"), count(lit(1)).as("nn"))
        .select(col(side),
          (expr("(s + nn * 1000000L) div nn") - 1000000L).as(out))
    val m = pairs
      .join(nnAvg("src_id", "dst_id", "a_src"), Seq("src_id"))
      .join(nnAvg("dst_id", "src_id", "a_dst"), Seq("dst_id"))
      .withColumn("margin_micros",
        when(col("a_src") + col("a_dst") > 0,
          signum(col("cm")).cast("long") *
            expr("(2000000L * abs(cm)) div (a_src + a_dst)")))
      .filter(col("margin_micros").isNotNull)
    Windows.topKPerGroup(m, Seq(col("src_id")),
        Seq(col("margin_micros").desc, col("dst_id").asc), 1)
      .filter(col("margin_micros") >= marginThresholdMicros)
      .select(col("src_id"), col("dst_id"), col("cm").as("cos_micros"),
        col("margin_micros"))
  }

  /** [[marginMiningRouted]]'s pair stage — the cross-parity candidate
    * pairs whose two sides share a probed IVF cell, in BOTH directions
    * (src probing dst's home cell ∪ dst probing src's home cell), so
    * each side's top-k neighborhood is preserved by its OWN probes.
    * Exposed for the stress gate: candidate mass here is
    * Σ_cells |probes ∩ even|·|homes ∩ odd| (+ the mirror), the routed
    * cost class — a lost nProbe filter reverts it to the brute N²/4.
    * `base` must be (id, v) with v already double[]. */
  private[graft] def marginRoutedPairs(base: DataFrame, nCentroids: Int,
                                       nProbe: Int): DataFrame = {
    val (_, cells, probes) = ivfRouting(base, nCentroids, nProbe, 1L)
    val mem = cells.select(col("cent_id"), col("id").as("m_id"),
      col("v").as("mv"))
    val prb = probes.select(col("cent_id"), col("query_id").as("p_id"),
      col("v").as("pv"))
    val cm = (sv: Column, dv: Column) =>
      round((round(cosine(sv, dv), 4) + lit(0.0)) * 1000000)
        .cast("long").as("cm")
    val fwd = prb.filter(col("p_id") % 2 === 0)
      .join(mem.filter(col("m_id") % 2 === 1), Seq("cent_id"))
      .select(col("p_id").as("src_id"), col("m_id").as("dst_id"),
        cm(col("pv"), col("mv")))
    val bwd = prb.filter(col("p_id") % 2 === 1)
      .join(mem.filter(col("m_id") % 2 === 0), Seq("cent_id"))
      .select(col("m_id").as("src_id"), col("p_id").as("dst_id"),
        cm(col("mv"), col("pv")))
    fwd.unionByName(bwd).distinct()
  }

  /** ROUTED margin-based candidate mining — [[marginMining]]'s
    * criterion on the [[ivfRouting]] candidate stage (the q35→q127
    * move applied to mining): instead of broadcasting one parity half
    * of the corpus into an N²/4 brute pair stage, each side's
    * candidates come from its `nProbe` probed IVF cells, in both
    * directions so BOTH sides' k-NN means are taken over their own
    * probed neighborhoods. The margin arithmetic downstream of the
    * pair stage is byte-identical to the brute face
    * ([[marginFromPairs]]), so at nProbe = nCentroids the routed
    * output EQUALS the brute output (exhaustive equivalence, the q35
    * recall contract — spec-pinned); at nProbe < nCentroids recall < 1
    * by construction, the standard ANN trade. Measured (RecallProbe,
    * sf0.1, nProbe = 4 of 16): 0.670 of the brute accepted pairs
    * survive routing on the synthetic ISOTROPIC embeddings — the
    * documented IVF worst case (cells carry no structure there; a
    * clustered real corpus routes much tighter, the q158 precedent).
    *
    * Scale shape: ONE broadcast of nCentroids rows, one corpus-wide
    * assignment window, and per-cell equi-joins — no corpus broadcast,
    * no all-pairs stage anywhere. Because the query side is the WHOLE
    * corpus (both parities need their k-NN means), routed pair mass is
    * structurally N²·nProbe/(2C) with C = nCentroids — so SIZE C WITH
    * THE CORPUS, C ≈ √N (the FAISS nlist guidance), which makes the
    * mass ≈ N^1.5·nProbe/2 and the per-query candidate count
    * N·nProbe/C ≈ √N·nProbe. The stress gate (MARGIN_ROUTE_COST_CLASS)
    * pins exactly that configuration; the checked sf faces keep the
    * shared 16-cell quantizer so the oracle replay stays tractable.
    * The k-NN mean windows and the margin equi-joins run on the routed
    * pair relation (checkpointed once, three readers). */
  def marginMiningRouted(emb: DataFrame, idCol: String, vecCol: String,
                         k: Int = 4, marginThresholdMicros: Long = 1000000L,
                         nCentroids: Int = 16, nProbe: Int = 4)
      : DataFrame = {
    require(k >= 1 && nCentroids >= 1 && nProbe >= 1,
      "need k, nCentroids, nProbe >= 1")
    val base = emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    marginFromPairs(marginRoutedPairs(base, nCentroids, nProbe), k,
      marginThresholdMicros)
  }

  /** SIMPLIFIED SILHOUETTE clustering-quality card (Hruschka et al.
    * 2004's linear-time variant of Rousseeuw 1987): per point,
    * a = squared-L2 to its OWN centroid, b = squared-L2 to the nearest
    * OTHER centroid, s = (b − a)/max(a, b) ∈ [−1, 1]; per cell the
    * mean s answers "is this cluster real or an artifact of k" —
    * the eval the ANN family (q35/q47 IVF cells, q84 semantic-dedup
    * cells) ships without. The full silhouette's all-pairs a/b is
    * quadratic; the centroid form is the standard scale substitute
    * and what sklearn's users actually run at size.
    *
    * Determinism: distances are per-pair rounded [[l2Chain]] micros
    * (the PQ contract); assignment = min distance, centroid-id ties
    * ascending; s divides sign-symmetrically by max(a, b) with the
    * degenerate a = b = 0 point scoring 0 (a point ON two centroids
    * separates nothing). Per-cell mean divides the signed sum
    * sign-symmetrically (the attribution idiom). Centroids here are
    * the id-seeded set ([[ivfRouting]]'s choice) so the card grades
    * the SAME clustering the routed queries use.
    *
    * Scale shape: one broadcast of nCentroids rows against one corpus
    * scan, a per-point 2-extremes window (WindowGroupLimit), one
    * combinable per-cell agg. */
  def silhouetteCard(emb: DataFrame, idCol: String, vecCol: String,
                     nCentroids: Int = 16, dim: Int = 64): DataFrame = {
    require(nCentroids >= 2 && dim >= 1,
      "need nCentroids >= 2, dim >= 1")
    val base = emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .localCheckpoint(eager = false)
    val cents = base.orderBy(col("id")).limit(nCentroids)
      .select(col("id").as("cent_id"), col("v").as("cv"))
    val dists = base.crossJoin(broadcast(cents))
      .select(col("id"), col("cent_id"),
        round(l2Chain(col("v"), col("cv"), dim) * 1000000.0)
          .cast("long").as("d"))
    val two = Windows.topKPerGroup(dists, Seq(col("id")),
        Seq(col("d").asc, col("cent_id").asc), 2)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("d").asc, col("cent_id").asc)
    val per = two.withColumn("rk", row_number().over(w))
      .groupBy(col("id"))
      .agg(max(when(col("rk") === 1, col("cent_id"))).as("cell"),
        max(when(col("rk") === 1, col("d"))).as("a"),
        max(when(col("rk") === 2, col("d"))).as("b"))
      .withColumn("s",
        when(greatest(col("a"), col("b")) === 0L, lit(0L))
          .otherwise(signum(col("b") - col("a")).cast("long") *
            expr("(1000000L * abs(b - a)) div greatest(a, b)")))
    per.groupBy(col("cell"))
      .agg(count(lit(1)).as("n"), sum(col("s")).as("ss"),
        sum(col("a")).as("sa"))
      .select(col("cell"), col("n"),
        (signum(col("ss")).cast("long") * expr("abs(ss) div n"))
          .as("mean_sil_micros"),
        expr("sa div n").as("mean_a_micros"))
  }

  /** HARD-NEGATIVE MINING for contrastive training (the in-batch-
    * negatives upgrade of DPR/SimCLR pipelines: Karpukhin et al. 2020
    * showed retrieval quality hinges on negatives that are CLOSE but
    * wrong): for each anchor, the k most-similar vectors whose LABEL
    * differs — random negatives are trivially separable and teach
    * nothing; the near-misses carry the gradient. Output:
    * (query_id, cand_id, cos) per anchor, the training-pair table a
    * contrastive run consumes.
    *
    * Same determinism contract as [[bruteForceTopK]] (round-4 +
    * signed-zero cosine before ranking, cand-id tie-break); the label
    * mismatch filters BEFORE ranking, so a k-th same-label neighbor
    * never crowds out a true negative.
    *
    * Scale shape: the strided anchor set broadcasts against one
    * labeled corpus scan; per-anchor top-k via WindowGroupLimit. This
    * brute face is the ORACLE for [[hardNegativesRouted]], the shipped
    * corpus-scale form (cell routing; mismatch survives routing
    * unchanged). */
  def hardNegatives(emb: DataFrame, labels: DataFrame, idCol: String,
                    vecCol: String, stride: Long = 10L, k: Int = 3)
      : DataFrame = {
    require(stride >= 1 && k >= 1, "need stride >= 1, k >= 1")
    val lab = labels.select(col(labels.columns(0)).as("cand_id"),
      col(labels.columns(1)).as("cand_label"))
    val base = emb.select(col(idCol).as("cand_id"),
        asDouble(col(vecCol)).as("v"))
      .join(lab, Seq("cand_id"))
    val q = base.filter(col("cand_id") % stride === 0)
      .select(col("cand_id").as("query_id"), col("v").as("qv"),
        col("cand_label").as("q_label"))
    val scored = base.join(broadcast(q),
        col("cand_id") =!= col("query_id") &&
          col("cand_label") =!= col("q_label"))
      .select(col("query_id"), col("cand_id"),
        (round(cosine(col("qv"), col("v")), 4) + lit(0.0)).as("cos"))
    Windows.topKPerGroup(scored, Seq(col("query_id")),
      Seq(col("cos").desc, col("cand_id").asc), k)
  }

  /** [[hardNegativesRouted]]'s scored candidate relation — anchors
    * probe their `nProbe` nearest IVF cells and score ONLY those
    * cells' label-mismatched members (round-4 + signed-zero cosine).
    * Exposed for the stress gate: this relation's row count is the
    * routed candidate mass (anchors × their probed cells' members),
    * vs the brute face's anchors × (N−1) — a lost nProbe filter
    * reverts it to ≈ the brute class. */
  private[graft] def hardNegRoutedScored(emb: DataFrame, labels: DataFrame,
                                         idCol: String, vecCol: String,
                                         stride: Long, nCentroids: Int,
                                         nProbe: Int): DataFrame = {
    val lab = labels.select(col(labels.columns(0)).as("id"),
      col(labels.columns(1)).as("lbl"))
    val base = emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .join(lab, Seq("id"))
    val cents = base.orderBy(col("id")).limit(nCentroids)
      .select(col("id").as("cent_id"), col("v").as("cv"))
    // row-local routing (r17; see ivfRouting) off one labeled base —
    // the checkpoint holds base ALONE (the per-row cents array would
    // multiply the materialized bytes by nCentroids·dim)
    val based = base.localCheckpoint(eager = false)
    val withArr = based.crossJoin(broadcast(centsArr(cents)))
    val cells = withArr
      .select(topCent1(col("v")).as("cent_id"), col("id").as("cand_id"),
        col("v"), col("lbl").as("cand_label"))
    val probes = withArr.filter(col("id") % stride === 0)
      .select(col("id").as("query_id"), col("v").as("qv"),
        col("lbl").as("q_label"),
        explode(graft.functions.IvfTopCents.ivf_top_cents(col("v"),
          col("__cents"), nProbe)).as("p"))
      .select(col("p.cent_id").as("cent_id"), col("query_id"),
        col("qv"), col("q_label"))
    probes.join(cells, Seq("cent_id"))
      .filter(col("cand_id") =!= col("query_id") &&
        col("cand_label") =!= col("q_label"))
      .select(col("query_id"), col("cand_id"),
        (round(cosine(col("qv"), col("v")), 4) + lit(0.0)).as("cos"))
      .distinct()
  }

  /** ROUTED hard-negative mining — [[hardNegatives]]' label-mismatch
    * top-k on the [[ivfRouting]] candidate stage: each anchor scores
    * only the members of its `nProbe` probed IVF cells instead of the
    * whole labeled corpus, killing the corpus-proportional broadcast
    * (N/stride anchors × full scan = N²/stride cosines) the brute face
    * pays. The probed-cell membership is the OVER-FETCH: routing cuts
    * candidates BEFORE the label filter, and because every mismatched
    * member of a probed cell is scored (not a pre-cut top-k), a k-th
    * same-label neighbor can never crowd a true negative out —
    * mismatch-then-rank order is preserved from the brute face.
    *
    * At nProbe = nCentroids every cell is probed and the routed output
    * EQUALS the brute output (exhaustive equivalence, spec-pinned); at
    * nProbe < nCentroids a negative hiding outside the anchor's probed
    * cells is unseen — the standard ANN recall trade. Measured
    * (RecallProbe, sf0.1, nProbe = 4 of 16): 0.515 of the brute
    * top-3 negatives survive routing on the synthetic ISOTROPIC
    * embeddings (the documented IVF worst case — no cell structure to
    * exploit; clustered corpora route much tighter, and for training
    * purposes any routed near-miss is a valid hard negative even when
    * it isn't the globally nearest one).
    *
    * Scale shape: broadcast of nCentroids rows + ONE corpus assignment
    * window + a per-cell equi-join whose mass is stress-gated (the
    * IVFPQ_ROUTE class); anchors never broadcast, the corpus never
    * broadcasts. */
  def hardNegativesRouted(emb: DataFrame, labels: DataFrame, idCol: String,
                          vecCol: String, stride: Long = 10L, k: Int = 3,
                          nCentroids: Int = 16, nProbe: Int = 4)
      : DataFrame = {
    require(stride >= 1 && k >= 1 && nCentroids >= 1 && nProbe >= 1,
      "need stride, k, nCentroids, nProbe >= 1")
    Windows.topKPerGroup(
      hardNegRoutedScored(emb, labels, idCol, vecCol, stride, nCentroids,
        nProbe),
      Seq(col("query_id")), Seq(col("cos").desc, col("cand_id").asc), k)
  }

  /** k-CENTER CORESET selection (Gonzalez 1985 greedy farthest-point —
    * the 2-approximation every coreset / diverse-subset pipeline
    * reaches for): seed with the min-id point, then repeatedly add the
    * point FARTHEST from the selected set (max over candidates of min
    * squared-L2 to any pick). Where [[mmrRerank]] diversifies a
    * per-query shortlist, k-center covers the whole corpus — the
    * "pick k maximally-spread exemplars" move behind annotation-budget
    * allocation, prototype selection, and seeding [[ivfCentroids]]
    * far apart. Output: (pick, cand_id, d_micros) — d_micros is the
    * selection radius (NULL for the seed), nonincreasing by
    * construction, and pick k+1's radius bounds the covering radius
    * of the chosen k within 2×.
    *
    * Determinism: squared L2 is the explicit left-associated
    * [[l2Chain]] both engines evaluate bit-identically (the PQ
    * contract), rounded to integer micros per pair BEFORE the min;
    * argmax ties break id-asc. The greedy loop unrolls as oracle CTEs.
    *
    * Scale shape: the selected set is ≤ k rows — every step broadcasts
    * it against ONE corpus scan (candidates × ≤k sims), one combinable
    * min-agg, one 1-row argmax; per-step checkpoint keeps the plan
    * linear in k (the mmrRerank lesson). O(N·k²) total sims, never
    * quadratic in the corpus. */
  def kCenterSelect(emb: DataFrame, idCol: String, vecCol: String,
                    k: Int = 5, dim: Int = 64): DataFrame = {
    require(k >= 1 && dim >= 1, "need k >= 1, dim >= 1")
    val base = emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .localCheckpoint(eager = false)
    var selected = base
      .join(broadcast(base.agg(min(col("id")).as("id"))), Seq("id"))
      .select(lit(1L).as("pick"), col("id"), col("v"),
        lit(null).cast("long").as("d_micros"))
      .localCheckpoint(eager = false)
    for (step <- 2 to k) {
      val top = base
        .join(selected.select(col("id").as("sid")),
          col("id") === col("sid"), "left_anti")
        .crossJoin(broadcast(selected.select(col("v").as("sv"))))
        .select(col("id"),
          round(l2Chain(col("v"), col("sv"), dim) * 1000000.0)
            .cast("long").as("dm"))
        .groupBy(col("id")).agg(min(col("dm")).as("dm"))
        .agg(max(struct(col("dm"), (-col("id")).as("nid"),
          col("id"))).as("m"))
        .select(col("m.id").as("id"), col("m.dm").as("d_micros"))
      val pick = top.join(base, Seq("id"))
        .select(lit(step.toLong).as("pick"), col("id"), col("v"),
          col("d_micros"))
      selected = selected.unionByName(pick).localCheckpoint(eager = false)
    }
    selected.select(col("pick"), col("id").as("cand_id"), col("d_micros"))
  }

  /** Deterministic random hyperplanes (seeded) for sign-bit signatures.
    * `private[graft]` so OracleGen can embed the same constants in the
    * DuckDB oracle SQL. */
  private[graft] def hyperplanes(nBits: Int, dim: Int): Seq[Array[Double]] = {
    val rng = new scala.util.Random(7)
    Seq.fill(nBits)(Array.fill(dim)(rng.nextGaussian()))
  }

  /** DCG position weights in integer micros — round(1e6 / log2(i+1))
    * for rank i, the ONE definition both faces share (the
    * poissonThresholds precedent: the oracle SQL embeds these exact
    * longs, so no engine ever computes a logarithm at query time). */
  val ndcgWeightMicros: IndexedSeq[Long] = (1 to 64).map { i =>
    math.round(1000000.0 / (math.log(i + 1.0) / math.log(2.0)))
  }

  /** Retrieval EVALUATION of a ranked run against a binary truth set —
    * the IR eval triple every ANN/retrieval deployment monitors:
    * hits@k (recall numerator), MRR (1e6 div first-relevant-rank —
    * exact integer micros), and NDCG@k. DCG sums [[ndcgWeightMicros]]
    * over the relevant ranks and IDCG is the weight PREFIX SUM at
    * min(k, n_rel) — both pure long integers precomputed at build time, so
    * the single round-4 division for NDCG is the only float op (NDCG
    * is non-negative: no signed-zero exposure).
    *
    * `run` must carry (query_id, cand_id, rank 1..k); `truth` carries
    * the relevant (query_id, cand_id) pairs. Queries in `truth` with
    * no run rows (router returned nothing) score zeros — the honest
    * face: silently dropping them would inflate every mean.
    *
    * Scale shape: one equi-join run⋈truth on (query, cand), two
    * combinable aggs, truth-side n_rel combinable — output is one row
    * per query. */
  def retrievalEval(run: DataFrame, truth: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= ndcgWeightMicros.length,
      s"need 1 <= k <= ${ndcgWeightMicros.length}")
    val weights = array(ndcgWeightMicros.take(k).map(lit): _*)
    val prefix = array(
      ndcgWeightMicros.take(k).scanLeft(0L)(_ + _).tail.map(lit): _*)
    val marked = run
      .join(truth.select(col("query_id"), col("cand_id"),
        lit(1L).as("rel")), Seq("query_id", "cand_id"), "left")
      .withColumn("rel", coalesce(col("rel"), lit(0L)))
    val per = marked.groupBy(col("query_id"))
      .agg(sum(col("rel")).as("hits_at_k"),
        min(when(col("rel") === 1L, col("rank"))).as("first_rel"),
        sum(when(col("rel") === 1L,
          element_at(weights, col("rank").cast("int")))
          .otherwise(0L)).as("dcg_micros"))
    val nrel = truth.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_rel"))
    nrel.join(per, Seq("query_id"), "left")
      .select(col("query_id"), col("n_rel"),
        coalesce(col("hits_at_k"), lit(0L)).as("hits_at_k"),
        coalesce(when(col("first_rel").isNotNull,
          expr("1000000L div first_rel")), lit(0L)).as("rr_micros"),
        coalesce(col("dcg_micros"), lit(0L)).as("dcg_micros"),
        round(coalesce(col("dcg_micros"), lit(0L)).cast("double") /
          element_at(prefix, least(lit(k), col("n_rel")).cast("int"))
            .cast("double"), 4).as("ndcg"))
  }

  /** AVERAGE PRECISION per query (the MAP numerator) — the rank-
    * sensitive complement to [[retrievalEval]]'s triple: NDCG rewards
    * any relevant hit by position weight, AP multiplies each hit by the
    * PRECISION at its rank, so a run that front-loads its relevant
    * results scores strictly higher than one that buries them below
    * non-relevant ones (Manning et al., IR ch. 8).
    *
    * ALL-INTEGER contract: the metric is DEFINED in micros —
    * ap_micros = (Σ_{hit at rank j} (1e6·tp_j) div j) div min(k, n_rel)
    * with tp_j the cumulative hits through rank j. Every operand is a
    * non-negative long, so Spark's truncating `div` equals DuckDB's
    * floor `//` and both faces agree bit-for-bit; no float appears
    * anywhere (stronger than the round-4 class). Queries in `truth`
    * with no run rows score zeros, the [[retrievalEval]] honesty rule.
    *
    * Scale shape: one equi-join run⋈truth on (query, cand), one
    * per-query rank window over ≤ k rows, two combinable aggs — output
    * is one row per query. */
  def averagePrecision(run: DataFrame, truth: DataFrame,
                       k: Int): DataFrame = {
    require(k >= 1, "need k >= 1")
    val marked = run
      .join(truth.select(col("query_id"), col("cand_id"),
        lit(1L).as("rel")), Seq("query_id", "cand_id"), "left")
      .withColumn("rel", coalesce(col("rel"), lit(0L)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("rank").asc)
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val per = marked.withColumn("tp", sum(col("rel")).over(w))
      .groupBy(col("query_id"))
      .agg(sum(when(col("rel") === 1L,
          expr("(1000000L * tp) div rank")).otherwise(0L)).as("ap_num"),
        sum(col("rel")).as("n_hits"))
    val nrel = truth.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_rel"))
    nrel.join(per, Seq("query_id"), "left")
      .select(col("query_id"), col("n_rel"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(expr(s"ap_num div least(${k}L, n_rel)"), lit(0L))
          .as("ap_micros"))
  }

  /** Deterministic Householder unit vectors (seeded) — the rotation
    * family for [[opqRotate]]. `private[graft]` for the same oracle-
    * embedding reason as [[hyperplanes]]. */
  private[graft] def householderVectors(reflections: Int,
                                        dim: Int): Seq[Array[Double]] = {
    val rng = new scala.util.Random(11)
    Seq.fill(reflections) {
      val u = Array.fill(dim)(rng.nextGaussian())
      val n = math.sqrt(u.map(x => x * x).sum)
      u.map(_ / n)
    }
  }

  /** OPQ-STYLE fixed rotation before product quantization (Ge et al.
    * 2013's optimized PQ premise, the non-learned form: a seeded
    * orthonormal rotation decorrelates/balances energy across the m
    * subspaces; FAISS ships the same idea as OPQMatrix / random
    * pre-rotation). R is a product of `reflections` Householder
    * reflections H = I − 2uuᵀ with [[householderVectors]]' seeded unit
    * vectors — exactly orthonormal by construction (up to float
    * rounding), so L2 distances are preserved and PQ in the rotated
    * space targets the SAME neighbor ranking. Each reflection is one
    * projection stage (v := v − 2(u·v)u via zip_with), materialized
    * per reflection so the expression tree stays linear in
    * `reflections`. Per-row map work, no shuffle.
    *
    * Measured (RecallProbe, PQ m=8 k=64 iters=3, L2 truth): recall@5
    * 0.22 → 0.21 on the isotropic sf embeddings (already balanced —
    * nothing for a rotation to fix) and 0.15 → 0.12 on the 16-cluster
    * corpus (its structure is axis-aligned, which plain PQ's
    * coordinate subspaces exploit directly; rotating smears it across
    * subspaces). NO registered query face — the seeded non-learned
    * rotation only pays off when subspace energies are unbalanced,
    * which neither test corpus exhibits; the op stays available for
    * corpora that are (e.g. PCA-projected embeddings, whose leading
    * dims dominate). A LEARNED R (full OPQ, alternating Procrustes)
    * is the documented next step if such a corpus shows up. */
  /** LEARNED OPQ rotation — the full alternating optimization (Ge et
    * al. 2013 §4, OPQ-NP; the step [[opqRotate]]'s scaladoc names as
    * next if a corpus warrants it): alternate (a) PQ codebook training
    * in the rotated space and (b) the orthogonal-Procrustes solve
    * R = U·Vᵀ from the SVD of Xᵀ·Y (Y = the PQ reconstruction), which
    * is the norm-constrained minimizer of ‖X·R − Y‖_F. Returns the
    * d×d rotation as rows.
    *
    * Scale shape: the fit runs on the DETERMINISTIC id-stride sample
    * — the same bounded-sample contract as [[pqArtifacts]]'
    * trainStride — collected to the driver (sample·d doubles; the
    * codebooks only need approximate subspace geometry, so a few
    * thousand rows suffice at any corpus size) where the per-subspace
    * Lloyd rounds are O(sample·k·sub) and the SVD is on the CONSTANT
    * d×d correlation (breeze/LAPACK, d = 64 ⇒ trivial). Applying R is
    * a per-row map (no shuffle), like [[opqRotate]].
    *
    * Measured (RecallProbe r12, PQ m=8 k=64 iters=3 vs the SAME L2
    * truth, equal bytes): see PLANS.md round-12 log — the
    * registration discipline is the r11 OPQ rule: a query face ships
    * ONLY if recall improves at equal bytes. */
  def opqTrainRotation(emb: DataFrame, idCol: String, vecCol: String,
                       m: Int = 8, k: Int = 64, lloydIters: Int = 3,
                       alternations: Int = 4, trainStride: Long = 1,
                       dim: Int = 64): Array[Array[Double]] = {
    import breeze.linalg.{DenseMatrix, svd => bsvd}
    require(dim % m == 0 && m >= 1, "need dim divisible by m")
    require(alternations >= 1 && lloydIters >= 1 && trainStride >= 1,
      "need alternations, lloydIters, trainStride >= 1")
    val sub = dim / m
    val sample = emb
      .select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .filter(col("id") % trainStride === 0)
      .orderBy(col("id"))
      .collect()
      .map(_.getSeq[Double](1).toArray)
    require(sample.nonEmpty, "empty training sample")
    val n = sample.length
    val kk = math.min(k, n)
    val X = DenseMatrix.tabulate(n, dim)((i, j) => sample(i)(j))
    var R = DenseMatrix.eye[Double](dim)
    def nearest(z: DenseMatrix[Double], i: Int, lo: Int,
                cents: Array[Array[Double]]): Int = {
      var best = 0; var bd = Double.MaxValue
      var c = 0
      while (c < cents.length) {
        var d2 = 0.0; var d = 0
        while (d < sub) {
          val t = z(i, lo + d) - cents(c)(d); d2 += t * t; d += 1
        }
        if (d2 < bd) { bd = d2; best = c }
        c += 1
      }
      best
    }
    for (_ <- 1 to alternations) {
      val Z = X * R
      val Y = DenseMatrix.zeros[Double](n, dim)
      for (j <- 0 until m) {
        val lo = j * sub
        val cents = Array.tabulate(kk, sub)((c, d) => Z(c, lo + d))
        for (_ <- 1 to lloydIters) {
          val sums = Array.fill(kk, sub)(0.0)
          val cnt = Array.fill(kk)(0)
          for (i <- 0 until n) {
            val c = nearest(Z, i, lo, cents)
            cnt(c) += 1
            var d = 0
            while (d < sub) { sums(c)(d) += Z(i, lo + d); d += 1 }
          }
          for (c <- 0 until kk if cnt(c) > 0; d <- 0 until sub)
            cents(c)(d) = sums(c)(d) / cnt(c)
        }
        for (i <- 0 until n) {
          val c = nearest(Z, i, lo, cents)
          var d = 0
          while (d < sub) { Y(i, lo + d) = cents(c)(d); d += 1 }
        }
      }
      val s = bsvd(X.t * Y)
      R = s.U * s.Vt
    }
    Array.tabulate(dim, dim)((i, j) => R(i, j))
  }

  def opqRotate(df: DataFrame, vecCol: String, reflections: Int = 4,
                dim: Int = 64): DataFrame = {
    require(reflections >= 1, "need reflections >= 1")
    householderVectors(reflections, dim).foldLeft(
      df.withColumn(vecCol, asDouble(col(vecCol)))) { (d, uArr) =>
        val u = array(uArr.map(lit).toIndexedSeq: _*)
        d.withColumn("__hdot",
            aggregate(zip_with(col(vecCol), u, (x, y) => x * y),
              lit(0.0), (acc, x) => acc + x))
          .withColumn(vecCol, zip_with(col(vecCol), u,
            (x, uc) => x - lit(2.0) * col("__hdot") * uc))
          .drop("__hdot")
    }
  }

  /** Random-hyperplane LSH signature (nBits) of a vector column — the
    * native [[graft.functions.HyperplaneSig]] expression (one codegen'd
    * nested loop per row; the HOF baseline below evaluates nBits×dim
    * interpreted per-element lambdas per vector, measured ~6× slower at
    * sf0.1 — PLANS.md).
    * Fails fast on a dimension mismatch: a silent all-zero signature would
    * collapse the whole corpus into one bucket (an O(N²) cross join
    * downstream). */
  /** JOHNSON–LINDENSTRAUSS random projection to `outDim` dimensions —
    * the dimensionality-reduction step an embedding pipeline runs before
    * brute-force or ANN scoring (distances are preserved within
    * 1 ± ε for outDim = O(ln N / ε²); the PRACTICAL win is outDim/dim
    * less score arithmetic and shuffle width). The projection matrix is
    * the SAME seeded hyperplane family the LSH signatures use
    * ([[hyperplanes]]) — known at build time, so DuckDB replays the
    * identical matrix and the oracle hash-verifies coordinates (q146).
    *
    * Output: one (id, dim_j, coord) row per projected coordinate,
    * coord = round-6 `+ 0.0` of the left-associated dot fold (the
    * annLshSql parity contract — same fold order both engines, signed
    * zero canonicalized since coords go negative).
    *
    * Scale shape: per-row map-side arithmetic, no shuffle. The HOF fold
    * is interpreted per element — fine at thousands of vectors; a
    * 100 TB run lifts it to a native Expression exactly like
    * [[graft.functions.HyperplaneSig]] did for the sign-only variant
    * (same escalation, measured there at ~30 µs/pair interpreted). */
  def jlProject(vec: Column, outDim: Int = 16, dim: Int = 64): Column = {
    val planes = hyperplanes(outDim, dim)
    val v = asDouble(vec)
    val coords = array(planes.zipWithIndex.map { case (p, j) =>
      val plane = array(p.map(lit).toIndexedSeq: _*)
      val dot = aggregate(zip_with(v, plane, (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)
      struct(lit(j).as("dim_j"), (round(dot, 6) + lit(0.0)).as("coord"))
    }.toIndexedSeq: _*)
    coords
  }

  /** [[jlProject]] exploded to the checked-relation shape:
    * (`idCol`, dim_j, coord). */
  def jlProjected(df: DataFrame, idCol: String, vecCol: String,
                  outDim: Int = 16, dim: Int = 64): DataFrame =
    df.select(col(idCol), explode(jlProject(col(vecCol), outDim, dim))
        .as("c"))
      .select(col(idCol), col("c.dim_j").as("dim_j"), col("c.coord").as("coord"))

  def lshSignature(vec: Column, nBits: Int = 16, dim: Int = 64): Column = {
    val planes = hyperplanes(nBits, dim)
    val v0 = asDouble(vec)
    // null vectors → null signature (they drop out of the bucket join:
    // null keys never equi-match); wrong-dim vectors fail fast with a
    // real message (coalesce keeps raise_error's argument non-null)
    val v = when(v0.isNull, v0)
      .when(size(v0) === dim, v0)
      .otherwise(raise_error(concat(
        lit(s"lshSignature: expected dim $dim, got vector of size "),
        coalesce(size(v0).cast("string"), lit("null")))))
    graft.functions.HyperplaneSig.hyperplane_sig(v, planes)
  }

  /** Built-ins-only signature baseline (zip_with + aggregate per plane):
    * bit-identical to [[lshSignature]] (same left-to-right double fold,
    * same null/dim edge semantics — spec-pinned on the embeddings corpus);
    * kept as the reference implementation for engines/tests that want
    * zero custom expressions. */
  def lshSignatureHof(vec: Column, nBits: Int = 16, dim: Int = 64): Column = {
    val planes = hyperplanes(nBits, dim)
    val v0 = asDouble(vec)
    val v = when(v0.isNull, v0)
      .when(size(v0) === dim, v0)
      .otherwise(raise_error(concat(
        lit(s"lshSignature: expected dim $dim, got vector of size "),
        coalesce(size(v0).cast("string"), lit("null")))))
    val sig = planes.zipWithIndex.map { case (p, i) =>
      val pl = array(p.toIndexedSeq.map(lit): _*)
      val dotv = aggregate(zip_with(v, pl, (x, y) => x * y), lit(0.0d),
        (acc, x) => acc + x)
      when(dotv > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    // the bit terms fold a null dot to 0, so a null VECTOR would otherwise
    // produce signature 0 — colliding every null row into one bucket (a
    // skew bomb); null in → null out, like the native form
    when(v0.isNull, lit(null).cast("long")).otherwise(sig)
  }

  /** Shared bucket-explode: one row per (chunk, key) byte-chunk of a
    * signature column — used by lshTopK and Dedup.embeddingNearDups so
    * bucketing changes land in one place. */
  private[graft] def chunkedBuckets(df: DataFrame, sigCol: Column,
                                    nChunks: Int): DataFrame =
    df.withColumn("__b",
        explode(array((0 until nChunks).map { c =>
          struct(lit(c).as("chunk"),
            shiftright(sigCol, c * 8).bitwiseAND(lit(0xFFL)).as("key"))
        }: _*)))
      .withColumn("chunk", col("__b.chunk"))
      .withColumn("key", col("__b.key"))
      .drop("__b")

  /** IVF (inverted-file) ANN: deterministic coarse quantizer — the first
    * `nCentroids` vectors by id act as centroids (a seeded sample stands in
    * for k-means; the partition/probe mechanics are identical). Every
    * vector is assigned to its `nProbe` nearest centroids; queries search
    * only their probed cells. Complements `lshTopK`: IVF cells adapt to
    * the data distribution, LSH is data-independent.
    *
    * Scale: centroids broadcast (small); assignment is a per-row map;
    * the search join shuffles on cell id — each query touches
    * |cell| · nProbe candidates instead of N. */
  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String,
              k: Int = 5, nCentroids: Int = 16, nProbe: Int = 2,
              queryStride: Long = 100, trainIters: Int = 0,
              trainSampleFraction: Double = 1.0): DataFrame = {
    val base = emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    val centroids =
      if (trainIters > 0)
        kMeansCentroids(base, nCentroids, trainIters, trainSampleFraction)
      else base.orderBy(col("id")).limit(nCentroids)
        .select(col("id").as("cent_id"), col("v").as("cv"))
    // nProbe nearest cells per vector (rank over the broadcast
    // centroids), materialized ONCE (lazy localCheckpoint, the q88
    // pattern): the assignment feeds BOTH the query side and the
    // candidate side — without this each consumer re-runs the centroid
    // fan-out + top-k, which doubles the dominant stage when the query
    // side is the whole corpus (knnGraph's queryStride = 1)
    val assigned = base.crossJoin(broadcast(centsArr(centroids)))
      .select(col("id"), col("v"),
        explode(graft.functions.IvfTopCents.ivf_top_cents(col("v"),
          col("__cents"), nProbe)).as("p"))
      .select(col("id"), col("v"), col("p.cent_id").as("cent_id"))
      .localCheckpoint(eager = false)
    val cells = assigned.select(col("cent_id"), col("id"), col("v"))
    val queries = cells.filter(col("id") % queryStride === 0)
      .select(col("cent_id"), col("id").as("query_id"), col("v").as("qv"))
    val scored = queries.join(cells, Seq("cent_id"))
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id").as("cand_id"),
        (round(cosine(col("qv"), col("v")), 4) + lit(0.0)).as("cos"))
      // ONE exchange for dedup + rank (r17, guide §2.4): hash-partition
      // by query_id once; the (query_id, cand_id) dedup agg and the
      // top-k window both have their clustering satisfied by it (a
      // multi-probe pair appears once per shared cell with the SAME
      // cosine, so max == any). `.distinct()` + window paid two
      // exchanges of the full candidate mass.
      .repartition(col("query_id"))
      .groupBy(col("query_id"), col("cand_id")).agg(max(col("cos")).as("cos"))
    Windows.topKPerGroup(scored, Seq(col("query_id")),
      Seq(col("cos").desc, col("cand_id").asc), k)
  }

  /** IVF OPERATING CURVE — recall@k and candidate mass at EACH nProbe
    * in one pass: the tuning card an IVF deployment reads before
    * fixing its probe count ("how much recall does the next probe
    * buy, at what candidate-mass price"), computed against the
    * brute-force truth on the strided query sample. The whole sweep
    * costs ONE assignment at max(probes) with the PROBE RANK kept:
    * a (query, cand) pair is routed at probe p iff some shared cell
    * holds both at rank ≤ p, so pmin = min over shared cells of
    * max(query rank, cand rank) decides every sweep point from one
    * pair relation — no per-p re-route, no per-p re-score. Output one
    * row per nProbe: (n_probe, n_queries, n_candidates, n_hits,
    * recall_micros).
    *
    * Determinism: the q47 assignment contract (round-6 centroid
    * cosine, cent_id tie-break), the q26 scoring contract (round-4
    * +0.0 cosine, cand_id tie-break); pmin/mass/hits are exact
    * integers; recall is one exact micros floor.
    *
    * Scale shape: bounded by the max-probe candidate mass — the same
    * routed-join class the IVFPQ_ROUTE stress gate pins; the sweep
    * explode multiplies the PAIR relation (already cell-bounded) by
    * |probes|, never the corpus. The brute truth side is the
    * documented sample-truth eval class (strided queries — drop it
    * and the curve's mass column still stands at full scale). */
  def ivfOperatingCurve(emb: DataFrame, idCol: String, vecCol: String,
                        k: Int = 5, nCentroids: Int = 16,
                        probes: Seq[Int] = Seq(1, 2, 4, 8),
                        queryStride: Long = 100): DataFrame = {
    require(probes.nonEmpty && probes.forall(_ >= 1),
      "need at least one probe count >= 1")
    val maxP = probes.max
    val base = emb.select(col(idCol).as("id"),
      asDouble(col(vecCol)).as("v"))
    val centroids = base.orderBy(col("id")).limit(nCentroids)
      .select(col("id").as("cent_id"), col("v").as("cv"))
    val assigned = base.crossJoin(broadcast(centsArr(centroids)))
      .select(col("id"), col("v"),
        posexplode(graft.functions.IvfTopCents.ivf_top_cents(col("v"),
          col("__cents"), maxP)).as(Seq("pos", "p")))
      .select(col("id"), col("v"), col("p.cent_id").as("cent_id"),
        (col("pos") + 1).as("pr"))
      .localCheckpoint(eager = false)
    val queries = assigned.filter(col("id") % queryStride === 0)
      .select(col("cent_id"), col("id").as("query_id"),
        col("v").as("qv"), col("pr").as("qr"))
    val pairs = queries
      .join(assigned.select(col("cent_id"), col("id").as("cand_id"),
        col("v"), col("pr").as("cr")), Seq("cent_id"))
      .filter(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        greatest(col("qr"), col("cr")).as("pp"),
        (round(cosine(col("qv"), col("v")), 4) + lit(0.0)).as("cos"))
      .groupBy(col("query_id"), col("cand_id"))
      .agg(min(col("pp")).as("pmin"), max(col("cos")).as("cos"))
      .localCheckpoint(eager = false)
    val swept = pairs
      .withColumn("n_probe",
        explode(array(probes.map(p => lit(p.toLong)): _*)))
      .filter(col("pmin") <= col("n_probe"))
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(col("n_probe"), col("query_id"))
      .orderBy(col("cos").desc, col("cand_id").asc)
    val topk = swept.withColumn("rn", row_number().over(wr))
      .filter(col("rn") <= k)
    val truth = bruteForceTopK(emb, idCol, vecCol, k,
        stride = queryStride)
      .select(col("query_id"), col("cand_id"))
    val nq = queries.select(col("query_id")).distinct()
      .agg(count(lit(1)).as("n_queries"))
    val mass = swept.groupBy(col("n_probe"))
      .agg(count(lit(1)).as("n_candidates"))
    val hits = topk.join(truth, Seq("query_id", "cand_id"))
      .groupBy(col("n_probe")).agg(count(lit(1)).as("n_hits"))
    mass.join(hits, Seq("n_probe"), "left")
      .join(broadcast(nq), lit(true))
      .select(col("n_probe"), col("n_queries"), col("n_candidates"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        expr(s"(1000000L * coalesce(n_hits, 0L))" +
          s" div (${k}L * n_queries)").as("recall_micros"))
  }

  /** Semantic K-NN GRAPH build — directed unit-weight edges from every
    * vector to its k approximate nearest neighbors via the IVF cell
    * routing (exactly [[ivfTopK]] with EVERY vector as a query): the
    * graph×similarity bridge that turns an embedding corpus into input
    * for the [[graft.ops.Graph]] family (PageRank centrality over the
    * semantic neighborhood graph — q124 — HITS, components-as-clusters,
    * walks for node2vec-style corpora).
    *
    * Scale shape: identical to [[ivfTopK]] — broadcast centroids, one
    * shuffle on cell id, per-query work bounded by its probed cells —
    * with the query side the whole corpus, so candidate volume is
    * Σ_cells |cell|² · nProbe ≈ N²·nProbe/C, the q190 cost class —
    * SIZE nCentroids WITH THE CORPUS, C ≈ √N (the FAISS nlist
    * guidance), which makes the mass ≈ N^1.5·nProbe (the
    * MARGIN_ROUTE_COST_CLASS gate pins exactly this stride-1
    * configuration on the shared routing); output is N·k narrow edge
    * rows.
    * Recall < 1 by construction (a true neighbor outside the probed
    * cells is unseen) — the standard approximate-KNN-graph trade. */
  def knnGraph(emb: DataFrame, idCol: String, vecCol: String,
               k: Int = 5, nCentroids: Int = 16,
               nProbe: Int = 2): DataFrame =
    ivfTopK(emb, idCol, vecCol, k, nCentroids, nProbe, queryStride = 1)
      .select(col("query_id").as("src"), col("cand_id").as("dst"),
        lit(1L).as("w"))

  /** FILTERED ANN — metadata-predicate vector search (the classically
    * hard vector-retrieval case: "nearest neighbors WHERE label = X").
    * This is the PRE-FILTER design: the candidate predicate is applied
    * before the cell index is built, so every probed cell contains only
    * admissible vectors and each query's k results are exact top-k *of
    * the filtered corpus* within its probed cells. The alternative —
    * post-filtering an unfiltered top-k — silently under-returns when
    * the predicate is selective (k results, few survive the filter);
    * pre-filtering keeps recall independent of selectivity.
    *
    * Queries stay UNFILTERED (you search on behalf of any row); centroids
    * are seeded from the FULL corpus so cell geometry — and therefore the
    * probe routing — is stable under any predicate (an index property:
    * one cell layout serves every filter).
    *
    * Scale: identical to [[ivfTopK]] — centroid broadcast + one shuffle
    * on cell id — except the shuffled candidate side is ALREADY filtered,
    * so a selective predicate shrinks the exchange and the per-cell join
    * instead of wasting them on rows the filter would discard. */
  def ivfFilteredTopK(emb: DataFrame, idCol: String, vecCol: String,
                      candPredicate: Column, k: Int = 5,
                      nCentroids: Int = 16, nProbe: Int = 2,
                      queryStride: Long = 100): DataFrame = {
    val base = emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"),
      candPredicate.as("__cand"))
    val centroids = base.orderBy(col("id")).limit(nCentroids)
      .select(col("id").as("cent_id"), col("v").as("cv"))
    // materialized ONCE (lazy localCheckpoint, the q84 pattern): the
    // assignment feeds BOTH the query side and the candidate side —
    // without this each consumer re-runs the centroid fan-out + top-k
    val assigned = Windows.topKPerGroup(
      base.join(broadcast(centroids), lit(true))
        .select(col("id"), col("v"), col("__cand"), col("cent_id"),
          round(cosine(col("v"), col("cv")), 6).as("cent_cos")),
      Seq(col("id")), Seq(col("cent_cos").desc, col("cent_id").asc), nProbe)
      .localCheckpoint(eager = false)
    val cells = assigned.filter(col("__cand"))
      .select(col("cent_id"), col("id"), col("v"))
    val queries = assigned.filter(col("id") % queryStride === 0)
      .select(col("cent_id"), col("id").as("query_id"), col("v").as("qv"))
    val scored = queries.join(cells, Seq("cent_id"))
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id").as("cand_id"),
        (round(cosine(col("qv"), col("v")), 4) + lit(0.0)).as("cos"))
      // ONE exchange for dedup + rank (r17, guide §2.4): hash-partition
      // by query_id once; the (query_id, cand_id) dedup agg and the
      // top-k window both have their clustering satisfied by it (a
      // multi-probe pair appears once per shared cell with the SAME
      // cosine, so max == any). `.distinct()` + window paid two
      // exchanges of the full candidate mass.
      .repartition(col("query_id"))
      .groupBy(col("query_id"), col("cand_id")).agg(max(col("cos")).as("cos"))
    Windows.topKPerGroup(scored, Seq(col("query_id")),
      Seq(col("cos").desc, col("cand_id").asc), k)
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009): combine N retriever
    * runs over the same query set by summing 1/(c + rank) per candidate
    * — the standard hybrid-retrieval merge (e.g. exact-cosine + LSH, or
    * dense + BM25): a candidate that ranks decently in SEVERAL runs
    * beats one that tops a single run, and no score calibration between
    * runs is needed because only ranks enter.
    *
    * Each run is re-ranked internally by `rankOrder` (a deterministic
    * total order — include a key tie-break), so callers pass raw scored
    * runs, not pre-ranked ones. The fused score rounds to 6; summation
    * order across runs cannot perturb it (IEEE addition is commutative,
    * and each (query, cand) sums at most one term per run).
    *
    * Scale shape: per-run ranking rides one shuffle on the query column
    * (WindowGroupLimit-free but runs are already top-k-sized); the
    * fusion is ONE combinable aggregation over the unioned runs; the
    * final top-k is a per-query window over ≤ N·k rows per query. */
  def rrfFuse(runs: Seq[DataFrame], queryCol: String, candCol: String,
              rankOrder: Seq[Column], k: Int, c: Int = 60): DataFrame = {
    require(runs.nonEmpty, "need at least one run")
    require(k >= 1 && c >= 0, "need k >= 1 and c >= 0")
    val ranked = runs.map { r =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(queryCol)).orderBy(rankOrder: _*)
      r.withColumn("__rank", row_number().over(w))
        .select(col(queryCol), col(candCol), col("__rank"))
    }
    val fused = ranked.reduce(_ unionByName _)
      .groupBy(col(queryCol), col(candCol))
      .agg(round(sum(lit(1.0) / (col("__rank") + lit(c.toLong))), 6)
        .as("rrf"))
    Windows.topKPerGroup(fused, Seq(col(queryCol)),
      Seq(col("rrf").desc, col(candCol).asc), k)
  }

  /** Symmetric per-vector INT8 quantization of an embedding column — the
    * standard 4× storage/bandwidth cut for a vector index at corpus
    * scale (a 100 TB float32 index becomes 25 TB; candidate generation
    * runs on int8, exact re-ranking on the float originals — the
    * two-tier design every large ANN deployment ships). scale =
    * round(max|x| / 127, 6); q_i = clamp(round(x_i / scale), ±127);
    * `max_err` reports the per-vector reconstruction bound (≤ scale/2
    * by construction — emitted so a pipeline can gate on it).
    *
    * Deterministic cross-engine: x is exact (float widened to double),
    * scale is one IEEE division rounded to 6, q_i is one IEEE division
    * rounded half-away-from-zero — the same value in any engine — so
    * the oracle replays the arrays verbatim (the native expressions use
    * Spark `Round`'s own BigDecimal HALF_UP algorithm). A zero or empty
    * vector quantizes to zeros with scale 0 (division guarded); null
    * vectors propagate null. Pure map: no shuffle; the per-element work
    * is the native codegen'd [[graft.functions.Int8Vec]] family
    * ([[quantizeInt8Hof]] is the spec-pinned built-ins reference). */
  /** The (scale, guarded divisor, clamped-round element) columns of the
    * BUILT-INS-ONLY int8 quantization — kept as the reference semantics
    * for the native [[graft.functions.Int8Vec]] expressions (spec-pinned
    * bit-equal; the same reference-vs-native pattern as
    * [[cosineHof]]/[[cosine]]). The HOF lambdas evaluate interpreted per
    * ELEMENT, which priced q104 at 2.49 s for 5k×64 vectors — the native
    * loop is what ships. */
  private[graft] def int8Parts(vec: Column): (Column, Column, Column => Column) = {
    val v = asDouble(vec)
    val scale = round(array_max(transform(v, x => abs(x))) / 127.0, 6)
    val s = when(scale === 0.0, lit(1.0)).otherwise(scale)
    val qElem = (x: Column) =>
      greatest(lit(-127.0), least(lit(127.0), round(x / s)))
    (scale, s, qElem)
  }

  /** Built-ins-only baseline of [[quantizeInt8]] (see [[int8Parts]]). */
  private[graft] def quantizeInt8Hof(emb: DataFrame, idCol: String,
                                     vecCol: String): DataFrame = {
    val v = asDouble(col(vecCol))
    val (scale, s, qElem) = int8Parts(col(vecCol))
    emb.select(col(idCol),
      scale.as("scale"),
      transform(v, x => qElem(x).cast("int")).as("q"),
      round(array_max(transform(v, x => abs(x - qElem(x) * s))), 6)
        .as("max_err"))
  }

  def quantizeInt8(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    import graft.functions.Int8Vec._
    val v = asDouble(col(vecCol))
    val scale = int8_scale(v)
    emb.select(col(idCol),
      scale.as("scale"),
      int8_quant(v, scale).as("q"),
      int8_max_err(v, scale).as("max_err"))
  }

  /** TWO-TIER retrieval over the [[quantizeInt8]] representation: the
    * candidate stage scores every (query, candidate) pair with the INT8
    * dot product rescaled by the two vectors' scales (exact integer
    * arithmetic × two IEEE multiplies — bit-deterministic in any
    * engine), keeps `candK` per query, and only those re-rank by exact
    * float cosine for the final `k`. This is the deployment shape the
    * int8 cut exists for: the wide scan runs on the 4×-smaller
    * representation (at cluster scale: 4× less memory bandwidth and
    * cache footprint on the N·Q stage), and full-precision vectors are
    * touched for only candK·Q rows. Recall < 1 by construction —
    * the int8 approximation can misrank near-ties across the candK
    * boundary; raise `candK` to trade cost for recall (recall@5 vs the
    * exact brute force is spec-measured in NewOpsPropertySpec). */
  def int8RerankTopK(emb: DataFrame, idCol: String, vecCol: String,
                     k: Int = 5, candK: Int = 20,
                     queryStride: Long = 100): DataFrame = {
    require(k >= 1 && candK >= k && queryStride >= 1,
      "need k >= 1, candK >= k, queryStride >= 1")
    import graft.functions.Int8Vec._
    val vIn = asDouble(col(vecCol))
    val scale = int8_scale(vIn)
    val all = emb.select(col(idCol).as("id"), vIn.as("v"),
      scale.as("scale"), int8_quant(vIn, scale).as("q"))
      // materialized once (lazy, the q84/q88 pattern): the int8 scan, the
      // query subset, and the float join-back all read it — without this
      // each consumer re-runs the quantization over the corpus
      .localCheckpoint(eager = false)
    val queries = all.filter(col("id") % queryStride === 0)
    // the candidate SCAN carries int8 + scale ONLY — this is the whole
    // point of the representation (at cluster scale: the N·Q stage moves
    // 4× fewer vector bytes); float vectors join back for just the
    // candK·Q winners below. int8 dot: exact long accumulation (|q| <=
    // 127, dim-bounded — far inside long), then two IEEE multiplies and
    // round(6): every engine computes the identical approx score.
    val approx = all.select(col("id"), col("scale"), col("q"))
      .join(broadcast(queries.select(col("id").as("query_id"),
        col("scale").as("qscale"), col("q").as("qq"))),
        col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("cand_id"),
        (round(int8_dot(col("q"), col("qq")).cast("double")
          * col("scale") * col("qscale"), 6) + lit(0.0)).as("approx"))
    val cands = Windows.topKPerGroup(approx, Seq(col("query_id")),
        Seq(col("approx").desc, col("cand_id").asc), candK)
      .select(col("query_id"), col("cand_id"))
    // float join-back: the candidate list is candK·Q rows — it BROADCASTS
    // into the corpus scan (no corpus shuffle), and the query vectors
    // ride a second broadcast
    val reranked = all.select(col("id").as("cand_id"), col("v"))
      .join(broadcast(cands), Seq("cand_id"))
      .join(broadcast(queries.select(col("id").as("query_id"),
        col("v").as("qv"))), Seq("query_id"))
      .select(col("query_id"), col("cand_id"),
        (round(cosine(col("qv"), col("v")), 4) + lit(0.0)).as("cos"))
    Windows.topKPerGroup(reranked, Seq(col("query_id")),
      Seq(col("cos").desc, col("cand_id").asc), k)
  }

  /** PRODUCT QUANTIZATION (Jégou, Douze & Schmid 2011, "Product
    * Quantization for Nearest Neighbor Search") — the standard
    * memory-compressed ANN representation beyond [[quantizeInt8]]'s 4×:
    * the vector splits into `m` subvectors, each quantized to one of
    * `k` trained codewords, so a dim-64 float corpus stores as m=8
    * BYTES per vector (32×) and query scoring becomes the ADC
    * (asymmetric distance) table lookup — per query, m·k subspace
    * distances computed ONCE, then every candidate scores as m integer
    * table additions, no float work per candidate at all.
    *
    * DETERMINISM (the repo's quantized-Lloyd story, L2 edition): every
    * subspace distance is an EXPLICIT left-associated 8-term
    * `Σ (x_i − c_i)²` chain — the identical expression tree in Spark
    * and the SQL oracle, so the doubles are bit-equal — rounded to 6
    * for assignments; codeword means round to 6 with the signed-zero
    * `+ 0.0` canonicalization; ADC distances convert to integer MICROS
    * (`round(d · 10⁶)` — half-away == HALF_UP on non-negatives) so the
    * per-candidate sum is exact long arithmetic in any engine.
    *
    * Scale shape: training touches N·m narrow subvector rows per round
    * (one broadcast codebook join + one top-1 + one mean — the
    * [[kMeansCentroids]] dataflow, keyed by subspace so all m books
    * train in ONE relation, no per-subspace loop); encoding is the same
    * join+top-1 once; the ADC table is queries·m·k rows (tiny,
    * broadcast) and candidate scoring is an equi-join on (subspace,
    * code) + one combinable long sum — the corpus never moves except
    * one shuffle of its (id, j, code) bytes.
    *
    * Recall honesty: the synthetic ISOTROPIC embeddings are PQ's worst
    * case (no cluster structure for the codebooks to exploit) —
    * measured recall@5 on them: 0.32 at (m=8, k=16, 2 iters), 0.52 at
    * (m=8, k=64, 3 iters — the q127 params); the codebook-size knob is
    * the recall lever, and real embedding corpora (clustered by
    * construction) sit far higher at the same bytes. For production
    * recall compose ADC top-candK with an exact float re-rank, exactly
    * like [[int8RerankTopK]]'s second tier. */
  def pqTopK(emb: DataFrame, idCol: String, vecCol: String,
             m: Int = 8, k: Int = 16, trainIters: Int = 2,
             topK: Int = 5, queryStride: Long = 100,
             dim: Int = 64, trainStride: Long = 1): DataFrame = {
    val (base, books, codes) =
      pqArtifacts(emb, idCol, vecCol, m, k, trainIters, dim, trainStride)
    require(topK >= 1 && queryStride >= 1, "need topK, queryStride >= 1")
    val qdist = pqAdcTable(base.filter(col("id") % queryStride === 0),
      books, m, dim / m)
    val scored = pqScoredPairs(codes, qdist)
      .groupBy(col("query_id"), col("id"))
      .agg(sum(col("dm")).as("adc_micros"))
      .select(col("query_id"), col("id").as("cand_id"), col("adc_micros"))
    Windows.topKPerGroup(scored, Seq(col("query_id")),
      Seq(col("adc_micros").asc, col("cand_id").asc), topK)
  }

  /** The brute-ADC scoring relation — (query_id, id, j, cid, dm) rows
    * entering [[pqTopK]]'s per-candidate sum. Exposed so the stress
    * gate's candidate-mass count measures the operator's OWN join (a
    * codes- or ADC-table-duplication regression IS a change in this
    * count): structurally queries · (N−1) · m rows, exactly. */
  private[graft] def pqScoredPairs(codes: DataFrame,
                                   qdist: DataFrame): DataFrame =
    codes.join(broadcast(qdist), Seq("j", "cid"))
      .filter(col("id") =!= col("query_id"))

  /** The trained PQ representation — (base(id, v), codebooks(j, cid,
    * cv), codes(id, j, cid)) — shared by [[pqTopK]] and [[ivfPqTopK]];
    * see [[pqTopK]]'s scaladoc for the determinism contract.
    *
    * `trainStride > 1` trains the Lloyd rounds on the deterministic
    * id-stride sample (`id % trainStride == 0` — the q86 sampling
    * idiom, a pure function of ids so the oracle replays it) and then
    * encodes the FULL corpus with ONE final assignment. This is the
    * deployment-standard shape (FAISS trains codebooks on a bounded
    * sample; Jégou et al. 2011 §V): at corpus scale it turns
    * trainIters+1 full-corpus passes into trainIters sample passes +
    * one full encode pass. trainStride = 1 keeps the legacy
    * full-corpus trainer. */
  private[graft] def pqArtifacts(emb: DataFrame, idCol: String,
                                 vecCol: String, m: Int, k: Int,
                                 trainIters: Int, dim: Int,
                                 trainStride: Long = 1)
      : (DataFrame, DataFrame, DataFrame) = {
    require(m >= 1 && dim % m == 0, "need dim divisible by m")
    require(k >= 1 && trainIters >= 0, "need k >= 1, trainIters >= 0")
    require(trainStride >= 1, "need trainStride >= 1")
    val sub = dim / m
    val base = emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .localCheckpoint(eager = false)
    val js = explode(sequence(lit(0), lit(m - 1))).as("j")
    val subv = base.select(col("id"), col("v"), js)
      .select(col("id"), col("j"),
        slice(col("v"), col("j") * sub + 1, lit(sub)).as("sv"))
      .localCheckpoint(eager = false)
    // seed codebooks: subvectors of the first k vectors by id (cid =
    // rank 0..k-1; the k-row single-partition window is trivial)
    val w0 = org.apache.spark.sql.expressions.Window.orderBy(col("id"))
    val seeds = base.orderBy(col("id")).limit(k)
      .withColumn("cid", row_number().over(w0) - 1)
    // NOTE (r17): the per-round localCheckpoint on books is load-bearing
    // even though books is only m·k rows — each round broadcasts books
    // into the next assign, and without the checkpoint every broadcast
    // re-executes the ENTIRE previous training chain (no cross-query
    // exchange reuse across the later materializations); measured
    // q127/q129/q158/q297 ~30-40% slower with lazy books.
    var books = seeds.select(col("cid"), col("v"), js)
      .select(col("j"), col("cid"),
        slice(col("v"), col("j") * sub + 1, lit(sub)).as("cv"))
      .localCheckpoint(eager = false)
    // training sample: a pure function of ids, so both engines draw it
    val subvTrain =
      if (trainStride > 1) subv.filter(col("id") % trainStride === 0)
      else subv
    // assignment is ROW-LOCAL (r17, guide §2.4): the codebook collapses
    // to one cid-sorted array per subspace (m broadcast rows) and
    // `pq_best_cid` picks argmin round-6 L2 with the cid-asc tie-break in
    // a codegen'd loop — same winner as the former broadcast-join +
    // top-1-per-(id, j) form (bit-identical rounding; see PqAssign), but
    // with NO corpus-sized exchange per pass: the join form shuffled one
    // winner row per (id, j) every training round AND in the final
    // encode, ~N·m rows per pass at corpus scale.
    def assign(bk: DataFrame, sv: DataFrame): DataFrame =
      sv.join(broadcast(bk.groupBy(col("j"))
          .agg(sort_array(collect_list(struct(col("cid"), col("cv"))))
            .as("__cands"))), Seq("j"))
        .select(col("id"), col("j"), col("sv"),
          graft.functions.PqAssign.pq_best_cid(col("sv"), col("__cands"))
            .as("cid"))
    // per-round mean: ONE groupBy with `sub` per-position avg columns
    // (the positions are a compile-time constant) — not
    // posexplode → groupBy(j,cid,pos) → collect_list, which shuffles
    // N·m·sub exploded rows twice; this shuffles N·m rows once with
    // sub accumulators. Same value set per (j,cid,pos) → same round-6
    // means.
    val mus = (0 until sub).map { i =>
      (round(avg(element_at(col("sv"), i + 1)), 6) + lit(0.0))
        .as(s"mu$i")
    }
    for (_ <- 1 to trainIters) {
      books = assign(books, subvTrain)
        .groupBy(col("j"), col("cid"))
        .agg(mus.head, mus.tail: _*)
        .select(col("j"), col("cid"),
          array((0 until sub).map(i => col(s"mu$i")): _*).as("cv"))
        .localCheckpoint(eager = false)
    }
    // encode: final top-1 code per (vector, subspace) — always the FULL
    // corpus, the one unavoidable N-pass
    val codes = assign(books, subv).select(col("id"), col("j"), col("cid"))
      .localCheckpoint(eager = false)
    (base, books, codes)
  }

  /** Explicit left-associated squared-L2 chain — the shared expression
    * tree both engines evaluate bit-identically (see [[pqTopK]]). */
  private def l2Chain(a: Column, b: Column, sub: Int): Column =
    (0 until sub).map { i =>
      val d = element_at(a, i + 1) - element_at(b, i + 1)
      d * d
    }.reduce(_ + _)

  /** ADC table for a query set: per (query, subspace, codeword) squared
    * distance in integer micros — queries·m·k rows, broadcast-sized. */
  private[graft] def pqAdcTable(queries: DataFrame, books: DataFrame,
                                m: Int, sub: Int): DataFrame = {
    val js = explode(sequence(lit(0), lit(m - 1))).as("j")
    queries.select(col("id").as("query_id"), col("v"), js)
      .select(col("query_id"), col("j"),
        slice(col("v"), col("j") * sub + 1, lit(sub)).as("qv"))
      .join(broadcast(books), Seq("j"))
      .select(col("query_id"), col("j"), col("cid"),
        round(l2Chain(col("qv"), col("cv"), sub) * 1000000.0).cast("long")
          .as("dm"))
  }

  /** IVF-PQ (the Jégou et al. 2011 deployment form, FAISS's IVFPQ): the
    * IVF coarse quantizer routes each query to its `nProbe` nearest
    * cells and ONLY those cells' members score, by the same integer ADC
    * lookups as [[pqTopK]] — the composition that makes PQ usable at
    * corpus scale, because the wide per-candidate stage shrinks from N
    * to Σ|probed cells| while every candidate still costs just m table
    * additions on its 8-byte codes. This variant encodes RAW vectors
    * (not cell residuals — residual encoding is the classic refinement;
    * raw codes keep one global codebook, simplify incremental adds, and
    * replay in the oracle without m·nCentroids CTEs; documented trade).
    *
    * Scale shape: [[pqArtifacts]]' one-shuffle train/encode + the
    * [[ivfTopK]] routing (broadcast centroids, cell equi-join) + the
    * broadcast ADC table; candidates move as (query_id, id, j, code)
    * narrow rows only. Recall compounds the two approximations (cell
    * routing misses × quantization misranking) — both knobs (`nProbe`,
    * `k`) trade cost for recall independently. */
  def ivfPqTopK(emb: DataFrame, idCol: String, vecCol: String,
                m: Int = 8, k: Int = 64, trainIters: Int = 3,
                nCentroids: Int = 16, nProbe: Int = 2,
                topK: Int = 5, queryStride: Long = 100,
                dim: Int = 64, trainStride: Long = 1): DataFrame = {
    require(topK >= 1 && queryStride >= 1 && nCentroids >= 1 && nProbe >= 1,
      "need topK, queryStride, nCentroids, nProbe >= 1")
    val (base, books, codes) =
      pqArtifacts(emb, idCol, vecCol, m, k, trainIters, dim, trainStride)
    val cand = ivfRoutedCandidates(base, nCentroids, nProbe, queryStride)
    val qdist = pqAdcTable(base.filter(col("id") % queryStride === 0),
      books, m, dim / m)
    val scored = codes.join(cand, Seq("id"))
      .join(broadcast(qdist), Seq("query_id", "j", "cid"))
      .groupBy(col("query_id"), col("id"))
      .agg(sum(col("dm")).as("adc_micros"))
      .select(col("query_id"), col("id").as("cand_id"), col("adc_micros"))
    Windows.topKPerGroup(scored, Seq(col("query_id")),
      Seq(col("adc_micros").asc, col("cand_id").asc), topK)
  }

  /** IVF CELL-BALANCE TELEMETRY — the routing-skew observability card
    * for the whole routed family (q35/q127/q149/q158/q190/q206/q278
    * all lean on [[ivfRouting]]'s cells): per-cell member counts
    * rolled into (nonempty cells, max cell, imbalance = C·max/n — 1.0
    * means perfectly balanced, C means everything collapsed into one
    * cell) plus the average-case read, expected probe mass
    * Σ(c_i/n)² = the fraction of the corpus a single-probe query
    * scans when queries distribute like the data (the q285
    * marginal-squares idiom on cells). The q287 convergence-card move
    * applied to the ANN side: every routed cost-class gate assumes
    * cells stay usefully sized — this card SAYS whether they do, and
    * a drifting corpus shows up here before it shows up as a tripped
    * candidate-mass gate.
    *
    * Determinism: the [[ivfRouting]] assignment contract (min-id
    * centroids, round-6 cosine, cent_id tie-break); counts exact;
    * both ratios are non-negative integer-micros floors on the
    * decimal ladder.
    *
    * Scale shape: ONE corpus assignment (the broadcast-centroid
    * window every routed face already runs) + two combinable aggs;
    * 1-row card. */
  def ivfCellBalance(emb: DataFrame, idCol: String, vecCol: String,
                     nCentroids: Int = 16): DataFrame = {
    require(nCentroids >= 1, "need nCentroids >= 1")
    val base = emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    val (_, cells, _) = ivfRouting(base, nCentroids, nProbe = 1,
      queryStride = Long.MaxValue)
    cells.groupBy(col("cent_id")).agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("nonempty_cells"),
        sum(col("c")).as("n_vectors"), max(col("c")).as("max_cell"),
        sum(col("c").cast("decimal(38,0)") * col("c")).as("__c2"))
      .select(lit(nCentroids.toLong).as("n_centroids"),
        col("n_vectors"), col("nonempty_cells"), col("max_cell"),
        // through decimal(38,0) like expected_probe_micros below: with a
        // user-supplied nCentroids (only >= 1 required) and a large max
        // cell the plain-long product can exceed Long.MaxValue and wrap
        // silently in non-ANSI Spark while DuckDB promotes to HUGEINT
        expr(s"try_cast((1000000L * cast(${nCentroids}L as decimal(38,0))" +
          " * max_cell) div n_vectors as bigint)")
          .as("imbalance_micros"),
        expr("try_cast((1000000L * __c2) div" +
          " (cast(n_vectors as decimal(38,0)) * n_vectors) as bigint)")
          .as("expected_probe_micros"))
  }

  /** PQ QUANTIZATION-DISTORTION TELEMETRY — the codebook-quality
    * observability card beside [[ivfCellBalance]]'s routing-skew card
    * (q291): per subspace, how much of the corpus's geometry the
    * trained codebook destroys. Every ADC-ranked face (q127/q129/
    * q158/q214) assumes the per-subspace quantization error is small
    * and roughly balanced across subspaces; this card SAYS whether it
    * is — a subspace whose MSE dwarfs the others (or that uses a
    * fraction of its k codewords) is where recall dies first, and a
    * drifting corpus shows up here before it shows up in a recall
    * probe. Output per subspace j: vectors encoded, distinct codewords
    * actually used (of k), exact SSE and MSE in micros.
    *
    * Determinism: the [[pqArtifacts]] contract end-to-end (round-6
    * assignment chain, round-6 signed-zero codeword means); each
    * assigned distance converts to integer micros (round(d·10⁶) on the
    * round-6 value — half-away == HALF_UP on non-negatives, the
    * [[pqAdcTable]] idiom), so SSE is an exact long sum in any engine
    * and MSE is a non-negative floor division.
    *
    * Scale shape: training/encoding is [[pqArtifacts]] (sample-trained
    * Lloyd, one full encode pass); the card itself is ONE equi-join of
    * the codes back to their m·k broadcast codebook rows plus one
    * combinable m-row aggregate — nothing new touches the corpus
    * beyond the encode pass the ANN faces already pay. */
  def pqDistortion(emb: DataFrame, idCol: String, vecCol: String,
                   m: Int = 8, k: Int = 64, trainIters: Int = 3,
                   dim: Int = 64, trainStride: Long = 4): DataFrame = {
    val (base, books, codes) =
      pqArtifacts(emb, idCol, vecCol, m, k, trainIters, dim, trainStride)
    val sub = dim / m
    val js = explode(sequence(lit(0), lit(m - 1))).as("j")
    val subv = base.select(col("id"), col("v"), js)
      .select(col("id"), col("j"),
        slice(col("v"), col("j") * sub + 1, lit(sub)).as("sv"))
    subv.join(codes, Seq("id", "j"))
      .join(broadcast(books), Seq("j", "cid"))
      .select(col("j"), col("cid"),
        round(round(l2Chain(col("sv"), col("cv"), sub), 6) *
          lit(1000000.0)).cast("long").as("dm"))
      .groupBy(col("j"))
      .agg(count(lit(1)).as("n_vectors"),
        countDistinct(col("cid")).as("codes_used"),
        sum(col("dm")).as("sse_micros"))
      .select(col("j"), col("n_vectors"), col("codes_used"),
        col("sse_micros"),
        expr("sse_micros div n_vectors").as("mse_micros"))
  }

  /** [[ivfPqTopK]]'s routing stage — the (query_id, id) candidate pairs
    * from the query's `nProbe` probed IVF cells (the q35 coarse
    * quantizer: broadcast centroids, round-6 cosine, members in their
    * top-1 cell). Exposed so the stress gate's candidate-mass count
    * measures the operator's OWN routing relation: a lost nProbe filter
    * reverts this to all-cells ≈ all-pairs, ~nCentroids/nProbe× the
    * pinned mass. `base` must be (id, v) with v already double[]. */
  private[graft] def ivfRoutedCandidates(base: DataFrame, nCentroids: Int,
                                         nProbe: Int,
                                         queryStride: Long): DataFrame = {
    val (_, cells, probes) = ivfRouting(base, nCentroids, nProbe,
      queryStride)
    // candidate pairs: probed cells' members (narrow, equi-join on cell)
    probes.select(col("cent_id"), col("query_id"))
      .join(cells.select(col("cent_id"), col("id")), Seq("cent_id"))
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id"))
      .distinct()
  }

  /** The shared IVF coarse-quantizer routing (the q35 shape): returns
    * (cents(cent_id, cv), cells(cent_id, id, v) — every member in its
    * top-1 round-6-cosine cell — and probes(cent_id, query_id, v) —
    * each query's nProbe nearest cells), vectors riding along so
    * residual variants can subtract centroids without a second corpus
    * join. `base` must be (id, v) with v already double[]. */
  private[graft] def ivfRouting(base: DataFrame, nCentroids: Int,
                                nProbe: Int, queryStride: Long)
      : (DataFrame, DataFrame, DataFrame) = {
    val cents = base.orderBy(col("id")).limit(nCentroids)
      .select(col("id").as("cent_id"), col("v").as("cv"))
    // ROW-LOCAL routing (r17, guide §2.4): the former broadcast-join
    // fan-out (N × nCentroids rows) + per-id top-k rank paid an
    // id-keyed exchange of the corpus WITH its vectors per call;
    // ivf_top_cents picks the same (round-6 cosine desc, cent_id asc)
    // winners inside one codegen'd loop per row — no exchange at all.
    val withArr = base.crossJoin(broadcast(centsArr(cents)))
    val cells = withArr
      .select(topCent1(col("v")).as("cent_id"), col("id"), col("v"))
    val probes = withArr.filter(col("id") % queryStride === 0)
      .select(col("id").as("query_id"), col("v"),
        explode(graft.functions.IvfTopCents.ivf_top_cents(col("v"),
          col("__cents"), nProbe)).as("p"))
      .select(col("p.cent_id").as("cent_id"), col("query_id"), col("v"))
    (cents, cells, probes)
  }

  /** The centroid table collapsed to ONE cent_id-sorted array row — the
    * broadcast side of the row-local routing
    * ([[graft.functions.IvfTopCents]]; r17). */
  private def centsArr(cents: DataFrame): DataFrame =
    cents.agg(sort_array(collect_list(struct(
      col("cent_id").cast("long").as("cent_id"), col("cv")))).as("__cents"))

  /** Top-1 cell id of `v` against the `__cents` array column. */
  private def topCent1(v: Column): Column =
    element_at(graft.functions.IvfTopCents.ivf_top_cents(v,
      col("__cents"), 1), 1).getField("cent_id")

  /** IVF-PQ with RESIDUAL encoding — the classic recall refinement at
    * the same bytes (Jégou et al. 2011 §V.B; FAISS IVFPQ's default):
    * each member encodes r = v − centroid(cell(v)) instead of the raw
    * vector, and each query scores a probed cell's candidates with the
    * ADC table of ITS residual against THAT cell's centroid, so
    * d(q, v) ≈ ‖(q − c) − code(v − c)‖². Residuals concentrate around
    * the origin (the coarse quantizer has already absorbed the
    * between-cell variance), so the m·k codewords spend their capacity
    * on within-cell structure.
    *
    * Measured (RecallProbe, same params/bytes, L2 truth): on a
    * 16-cluster corpus recall@5 = 0.32 residual vs 0.15 raw — the 2.1×
    * gain the refinement exists for; on the synthetic ISOTROPIC sf
    * embeddings 0.13 vs 0.18 — cells carry no structure there, so
    * residuals (v − c with v, c near-independent) only widen the
    * distribution the codewords must cover. Pick residual encoding
    * when the corpus clusters (real embedding corpora do, by
    * construction); the isotropic number is the documented honesty
    * bound, same family as [[pqTopK]]'s recall note.
    *
    * Scale shape: [[ivfRouting]] + ONE broadcast-centroid zip_with for
    * member residuals (no extra shuffle — cells already carry v), the
    * [[pqArtifacts]] sample-train/encode-once dataflow over residuals,
    * and an ADC table of queries·nProbe·m·k rows (nProbe× the raw
    * variant's — still broadcast-sized). Candidate scoring is the same
    * (query, cell, subspace, code) equi-join + combinable long sum.
    * Determinism: residual subtraction is exact IEEE on both engines;
    * everything downstream is the proven PQ story. */
  def ivfPqResidualTopK(emb: DataFrame, idCol: String, vecCol: String,
                        m: Int = 8, k: Int = 64, trainIters: Int = 3,
                        nCentroids: Int = 16, nProbe: Int = 2,
                        topK: Int = 5, queryStride: Long = 100,
                        dim: Int = 64, trainStride: Long = 1): DataFrame = {
    require(topK >= 1 && queryStride >= 1 && nCentroids >= 1 && nProbe >= 1,
      "need topK, queryStride, nCentroids, nProbe >= 1")
    val sub = dim / m
    val base = emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .localCheckpoint(eager = false)
    val (cents, cells, probes) =
      ivfRouting(base, nCentroids, nProbe, queryStride)
    // member residuals: v − own-cell centroid (broadcast zip_with)
    val resid = cells.join(broadcast(cents), Seq("cent_id"))
      .select(col("cent_id"), col("id"),
        zip_with(col("v"), col("cv"), (a, b) => a - b).as("v"))
      .localCheckpoint(eager = false)
    val (_, books, codes) =
      pqArtifacts(resid, "id", "v", m, k, trainIters, dim, trainStride)
    // per-(query, probed cell) residual ADC table — queries·nProbe·m·k
    // rows, broadcast
    val js = explode(sequence(lit(0), lit(m - 1))).as("j")
    val qd = probes.join(broadcast(cents), Seq("cent_id"))
      .select(col("query_id"), col("cent_id"),
        zip_with(col("v"), col("cv"), (a, b) => a - b).as("rv"))
      .select(col("query_id"), col("cent_id"), col("rv"), js)
      .select(col("query_id"), col("cent_id"), col("j"),
        slice(col("rv"), col("j") * sub + 1, lit(sub)).as("qv"))
      .join(broadcast(books), Seq("j"))
      .select(col("query_id"), col("cent_id"), col("j"), col("cid"),
        round(l2Chain(col("qv"), col("cv"), sub) * 1000000.0).cast("long")
          .as("dm"))
    // candidates keep their cell: a member scores against the query's
    // residual table FOR THAT member's cell
    val cand = probes.select(col("cent_id"), col("query_id"))
      .join(cells.select(col("cent_id"), col("id")), Seq("cent_id"))
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("cent_id"), col("id"))
      .distinct()
    val scored = codes.join(cand, Seq("id"))
      .join(broadcast(qd), Seq("query_id", "cent_id", "j", "cid"))
      .groupBy(col("query_id"), col("id"))
      .agg(sum(col("dm")).as("adc_micros"))
      .select(col("query_id"), col("id").as("cand_id"), col("adc_micros"))
    Windows.topKPerGroup(scored, Seq(col("query_id")),
      Seq(col("adc_micros").asc, col("cand_id").asc), topK)
  }

  /** Persisted IVF index artifacts — the EMBEDDING-family sibling of the
    * text side's persisted indexes ([[graft.ops.Dedup.cosineIndex]],
    * bandKeys): the coarse-quantizer centroid table `(cent_id, cv)` and
    * the cell-grouped corpus `(cent_id, id, v)`, computed once per corpus
    * build and written down; every later batch probes them via
    * [[ivfAdmitFromIndex]] with the index FROZEN (the standard
    * incremental-IR choice — admission decisions must not drift as the
    * corpus grows between index builds). `trainIters > 0` trains the
    * cells with the quantized-Lloyd rounds (q47/q87 determinism).
    *
    * Scale: the centroid table is tiny; the cell table is one corpus
    * shuffle away (the per-id top-1 window) and is exactly what an IVF
    * index IS — the corpus re-grouped by cell. Persist it hive-
    * partitioned by `cent_id` and a probe reads only its probed cells. */
  def ivfIndex(emb: DataFrame, idCol: String, vecCol: String,
               nCentroids: Int = 16, trainIters: Int = 0)
      : (DataFrame, DataFrame) = {
    require(nCentroids >= 1 && trainIters >= 0,
      "need nCentroids >= 1, trainIters >= 0")
    val base = emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    val cent =
      if (trainIters > 0) kMeansCentroids(base, nCentroids, trainIters)
      else base.orderBy(col("id")).limit(nCentroids)
        .select(col("id").as("cent_id"), col("v").as("cv"))
    val cells = base.crossJoin(broadcast(centsArr(cent)))
      .select(topCent1(col("v")).as("cent_id"), col("id"), col("v"))
    (cent, cells)
  }

  /** Incremental SEMANTIC admission against a persisted [[ivfIndex]]:
    * flag each batch vector whose round-4 cosine to ANY indexed corpus
    * vector in its `nProbe` probed cells reaches `threshold` — "is this
    * new document semantically already in the training set?", decided
    * WITHOUT touching corpus text or recomputing the index (the
    * embedding-space analogue of [[graft.ops.Dedup.cosineAdmitFromIndex]],
    * and the incremental face of [[graft.ops.Dedup.semanticLeakageCellRouted]]'s
    * routing). Returns one row per batch vector — (id, n_hits, is_dup) —
    * zero-hit batch vectors included.
    *
    * Recall mirrors the routed-leakage bound: a true near-dup is seen iff
    * its indexed partner's home cell is among the batch vector's probed
    * cells; `nProbe = nCentroids` is exhaustive over the index.
    *
    * Scale shape: the batch is small next to the indexed corpus — batch
    * assignment rides the broadcast centroid table (a map), and the
    * probe BROADCASTS the assigned batch into an equi-join on cell id,
    * so the index streams through map-side and only probed cells do
    * cosine work. No corpus shuffle at any point. */
  def ivfAdmitFromIndex(centroids: DataFrame, cells: DataFrame,
                        batch: DataFrame, idCol: String, vecCol: String,
                        threshold: Double, nProbe: Int = 4): DataFrame = {
    require(nProbe >= 1, "nProbe must be >= 1")
    val b = batch.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    val probes = b.crossJoin(broadcast(centsArr(centroids)))
      .select(col("id").as("batch_id"), col("v").as("bv"),
        explode(graft.functions.IvfTopCents.ivf_top_cents(col("v"),
          col("__cents"), nProbe)).as("p"))
      .select(col("p.cent_id").as("cent_id"), col("batch_id"), col("bv"))
    val hits = cells.join(broadcast(probes), Seq("cent_id"))
      .select(col("batch_id"),
        (round(cosine(col("bv"), col("v")), 4) >= threshold)
          .cast("long").as("__hit"))
      .groupBy(col("batch_id"))
      .agg(sum(col("__hit")).as("__n"))
    // hits is at most |batch| narrow rows — broadcast by the same
    // small-batch contract that broadcasts the probes, so the join-back
    // never plans a sort-merge shuffle of either side
    b.select(col("id"))
      .join(broadcast(hits), col("id") === col("batch_id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("__n"), lit(0L)).as("n_hits"),
        (coalesce(col("__n"), lit(0L)) > 0).as("is_dup"))
  }

  /** Persisted IVF-PQ index artifacts — the production ANN shape
    * ([[ivfIndex]] upgraded with the PQ compression the index would
    * actually ship at 100 TB): the coarse-quantizer centroid table
    * `(cent_id, cv)`, the PQ codebooks `(j, cid, cv)` (m·k rows,
    * broadcast-sized), and the CELL-KEYED code table
    * `(cent_id, id, j, cid)` — the corpus as m·N narrow code rows,
    * 8 bytes of codes per vector instead of 256 bytes of floats.
    * Codes are raw-vector encodings (the q127 choice: one global
    * codebook, incremental adds need no per-cell retraining, oracle
    * replays without m·nCentroids CTEs — documented trade vs q158's
    * residuals). `trainIters`/`trainStride` run the quantized-Lloyd
    * codebook training on the deterministic id-stride sample
    * ([[pqArtifacts]]).
    *
    * Scale: persist the code table hive-partitioned by `cent_id`
    * (PersistedIndexSpec pins the round-trip) — a probing batch reads
    * ONLY its probed cells' partitions, so admission cost scales with
    * probed-cell volume, not corpus volume, and the scanned bytes are
    * the 32×-compressed codes. */
  def ivfPqIndex(emb: DataFrame, idCol: String, vecCol: String,
                 nCentroids: Int = 16, m: Int = 8, k: Int = 64,
                 trainIters: Int = 0, dim: Int = 64,
                 trainStride: Long = 1)
      : (DataFrame, DataFrame, DataFrame) = {
    require(nCentroids >= 1, "nCentroids must be >= 1")
    val base = emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .localCheckpoint(eager = false)
    val cent = base.orderBy(col("id")).limit(nCentroids)
      .select(col("id").as("cent_id"), col("v").as("cv"))
    val cells = base.crossJoin(broadcast(centsArr(cent)))
      .select(topCent1(col("v")).as("cent_id"), col("id"))
    val (_, books, codes) =
      pqArtifacts(base, "id", "v", m, k, trainIters, dim, trainStride)
    val cellCodes = codes.join(cells, Seq("id"))
      .select(col("cent_id"), col("id"), col("j"), col("cid"))
    (cent, books, cellCodes)
  }

  /** Incremental ADC admission against a persisted [[ivfPqIndex]]: flag
    * each batch vector whose ADC-approximated squared-L2 to ANY indexed
    * corpus vector in its `nProbe` probed cells is ≤
    * `adcThresholdMicros` — the [[ivfAdmitFromIndex]] decision made on
    * the COMPRESSED index: the probe touches 8-byte codes, never corpus
    * floats, which is what makes frozen-index admission affordable when
    * the index itself is too big to keep uncompressed. Output mirrors
    * [[ivfAdmitFromIndex]]: one row per batch vector,
    * (id, n_hits, is_dup), zero-hit vectors included.
    *
    * Determinism: the batch-side ADC table is the [[pqAdcTable]]
    * integer-micros contract; per-candidate ADC is a combinable long
    * sum of m table rows; the threshold compares exact longs. Recall
    * compounds cell-routing misses with PQ misranking near the
    * threshold — both documented trades ([[ivfPqTopK]]).
    *
    * Scale shape: batch assignment rides the broadcast centroid table;
    * the probe joins the code table on `cent_id` (partition-pruned when
    * the index is cent_id-partitioned parquet) against the BROADCAST
    * probe list, then looks codes up in the BROADCAST ADC table
    * (batch·m·k rows). The corpus-sized code table streams map-side —
    * no corpus shuffle, no float decode. */
  def ivfPqAdmitFromIndex(centroids: DataFrame, books: DataFrame,
                          codes: DataFrame, batch: DataFrame,
                          idCol: String, vecCol: String,
                          adcThresholdMicros: Long, nProbe: Int = 4,
                          m: Int = 8, dim: Int = 64): DataFrame = {
    require(nProbe >= 1 && m >= 1 && dim % m == 0,
      "need nProbe >= 1, m >= 1, dim divisible by m")
    val b = batch.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .localCheckpoint(eager = false)
    val probes = b.crossJoin(broadcast(centsArr(centroids)))
      .select(col("id").as("batch_id"),
        explode(graft.functions.IvfTopCents.ivf_top_cents(col("v"),
          col("__cents"), nProbe)).as("p"))
      .select(col("p.cent_id").as("cent_id"), col("batch_id"))
    val qd = pqAdcTable(b, books, m, dim / m)
      .select(col("query_id").as("batch_id"), col("j"), col("cid"),
        col("dm"))
    // each indexed id lives in exactly ONE cell (top-1 assignment), so
    // (batch_id, id) pairs are unique without a distinct
    val scored = codes.join(broadcast(probes), Seq("cent_id"))
      .join(broadcast(qd), Seq("batch_id", "j", "cid"))
      .groupBy(col("batch_id"), col("id"))
      .agg(sum(col("dm")).as("adc"))
    val hits = scored.filter(col("adc") <= adcThresholdMicros)
      .groupBy(col("batch_id"))
      .agg(count(lit(1)).as("__n"))
    b.select(col("id"))
      .join(broadcast(hits), col("id") === col("batch_id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("__n"), lit(0L)).as("n_hits"),
        (coalesce(col("__n"), lit(0L)) > 0).as("is_dup"))
  }

  /** Distributed spherical k-means (Lloyd) coarse quantizer for IVF:
    * seeds with the first `nCentroids` vectors by id, then `iters` rounds
    * of assign-to-nearest (by cosine, over the broadcast centroids) and
    * element-wise mean per cell. Pure DataFrame ops: assignment is a
    * broadcast-join + top-1, the mean is posexplode → avg per (cell,
    * component) → re-assembled array — both shuffle O(N·dim) narrow rows,
    * no driver-side math.
    *
    * Scale/use: `sampleFraction < 1` trains on a DETERMINISTIC hash
    * sample of the corpus (xxhash64(id) threshold — repartition-invariant,
    * like [[Sampling]]; the index only needs approximate cell shapes, so
    * a big corpus should train on a few million rows, not all of them).
    * The seed centroids always come from the FULL corpus (first
    * `nCentroids` by id) so the trained result is a pure function of
    * (corpus, params) whatever the fraction. Lineage is capped by a LAZY
    * `localCheckpoint` after every round: planning happens at call time,
    * so each round's logical plan flattens to a LogicalRDD (constant plan
    * depth at any `iters` — spec-pinned at 8) while NO job runs until a
    * downstream action materializes the chain (query build stays
    * zero-job). Cells that lose all members disappear (standard Lloyd
    * degeneracy — acceptable for a candidate generator; probing covers
    * the gap).
    *
    * DETERMINISM: training is QUANTIZED — the assignment cosine and every
    * new centroid component are rounded to 6 decimals each round. The
    * only order-sensitive float op in Lloyd is the member mean (partial
    * sums follow partition order); rounding collapses the ~1e-15 relative
    * wobble to one bit-stable value unless a mean sits within 5e-7 of a
    * rounding boundary (not observed across thread counts or engines on
    * the testdata — the Determinism tool and the q47 DuckDB oracle, which
    * replays the same quantized rounds in SQL, both pin it). This is what
    * makes the TRAINED path oracle-checkable (q47), not just the seeded
    * q35 variant. */
  private[graft] def kMeansCentroids(base: DataFrame, nCentroids: Int,
                                     iters: Int,
                                     sampleFraction: Double = 1.0): DataFrame = {
    require(sampleFraction > 0.0 && sampleFraction <= 1.0,
      s"sampleFraction must be in (0, 1], got $sampleFraction")
    val train =
      if (sampleFraction >= 1.0) base
      else base.filter(pmod(xxhash64(col("id")), lit(1000000L)) <
        lit((sampleFraction * 1000000L).toLong))
    var cents = base.orderBy(col("id")).limit(nCentroids)
      .select(col("id").as("cent_id"), col("v").as("cv"))
    for (_ <- 1 to iters) {
      // row-local top-1 assignment (r17): same winners as the former
      // fan-out + rank, no per-round corpus exchange (see ivfRouting)
      val assigned = train.crossJoin(broadcast(centsArr(cents)))
        .select(topCent1(col("v")).as("cent_id"), col("v"))
      cents = assigned
        .select(col("cent_id"), posexplode(col("v")))
        .groupBy(col("cent_id"), col("pos"))
        .agg(round(avg(col("col")), 6).as("m"))
        .groupBy(col("cent_id"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cent_id"),
          transform(col("pm"), x => x.getField("m")).as("cv"))
        // lazy checkpoint: flattens this round's LOGICAL plan to a
        // LogicalRDD now (constant plan depth across rounds) without
        // running a job until something downstream materializes
        .localCheckpoint(eager = false)
    }
    cents
  }

  /** LSH-bucketed ANN: same-bucket pairs scored by exact cosine, top-k per
    * query within its bucket. Approximate (recall < 1) — the scale path;
    * `bruteForceTopK` is the exact baseline. Buckets on byte-chunks of the
    * signature so each vector lands in `nBits/8` buckets.
    *
    * `probeBits` > 0 turns on MULTI-PROBE: the query side ALSO probes
    * every chunk key with one of its low `probeBits` bits flipped — a
    * near-neighbor that disagrees with the query on exactly one
    * hyperplane per chunk still meets it. The classic recall lever that
    * costs extra PROBES (query-side rows × (1+probeBits)) instead of a
    * bigger INDEX (the corpus-side bucket table is untouched — at 100 TB
    * that is the difference between re-sharding the stored index and just
    * fanning out the lookup). Candidates strictly contain the
    * single-probe set (spec-pinned), so recall can only go up. */
  def lshTopK(emb: DataFrame, idCol: String, vecCol: String,
              k: Int = 5, nBits: Int = 16, dim: Int = 64,
              probeBits: Int = 0, queryStride: Long = 0): DataFrame =
    Windows.topKPerGroup(
      lshCandidatePairs(emb, idCol, vecCol, nBits, dim, probeBits,
        queryStride),
      Seq(col("query_id")), Seq(col("cos").desc, col("cand_id").asc), k)

  /** The candidate stage of [[lshTopK]]: distinct scored same-bucket
    * (query_id, cand_id, cos) pairs, query side fanned out to Hamming-1
    * probe keys when `probeBits` > 0. `queryStride > 0` restricts the
    * QUERY side to id % stride == 0 BEFORE candidate scoring — per-query
    * results are identical to post-filtering a full run (buckets and
    * per-query ranks never see other queries), but the candidate join
    * and the top-k window shrink by ~stride× (the q98 fusion caller only
    * fuses the stride query set; scoring every other query was waste).
    * Exposed for calibration — the candidate count is the COST axis of
    * the (probeBits → recall) operating curve recorded in PLANS.md
    * (tools/RecallProbe sweeps it). */
  private[graft] def lshCandidatePairs(emb: DataFrame, idCol: String,
                                       vecCol: String, nBits: Int, dim: Int,
                                       probeBits: Int,
                                       queryStride: Long = 0): DataFrame = {
    require(probeBits >= 0 && probeBits <= 8, "probeBits in [0, 8]")
    require(queryStride >= 0, "queryStride must be >= 0 (0 = all queries)")
    val sigs = emb.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"),
      lshSignature(col(vecCol), nBits, dim).as("sig"))
    val chunked = chunkedBuckets(sigs, col("sig"), nBits / 8)
      .select(col("id"), col("v"), col("chunk"), col("key"))
    val qsideAll = chunked.select(col("chunk"), col("key"),
      col("id").as("query_id"), col("v").as("qv"))
    val qside0 = if (queryStride > 0)
      qsideAll.filter(col("query_id") % queryStride === 0) else qsideAll
    val qside = if (probeBits == 0) qside0
      else qside0.withColumn("key", explode(array(
        col("key") +: (0 until probeBits).map(j =>
          col("key").bitwiseXOR(lit(1L << j))): _*)))
    qside
      .join(chunked.select(col("chunk"), col("key"),
        col("id").as("cand_id"), col("v").as("v")), Seq("chunk", "key"))
      .filter(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        (round(cosine(col("qv"), col("v")), 4) + lit(0.0)).as("cos"))
      .distinct()
  }
}
