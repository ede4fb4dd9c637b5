package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.ops.{Dedup, TextAnalysis}

/** Scale-stress GATE: synthesizes a 40×-replicated corpus (200k docs at
  * sf0.1) with controlled near-dup structure — each copy perturbs ~30% of
  * tokens — times the dedup family on it, and FAILS (exit 1) when any
  * shape exceeds its time budget. Budgets are ~2.5× the measured local[32]
  * times, so load noise passes but a q29-class selectivity regression
  * (candidate-generation suddenly quadratic) trips the gate before it
  * reaches the bench. Run alongside `sbt test` (tools/ci.sh).
  *
  *   sbt "runMain graft.tools.Stress /root/testdata/sf0.1 40"
  *
  * Budgets are NOT absolute wall-clock: a fixed calibration shape
  * (CPU-hash + shuffle over `spark.range`, no input data) is timed in the
  * same JVM after warm-up, and every budget is multiplied by
  * `max(1, t_calib / CALIB_REF_SEC)` — a slower or loaded host scales its
  * budgets instead of failing without a regression. `GRAFT_STRESS_SCALE`
  * overrides the multiplier explicitly (set it when wall-clock itself is
  * untrustworthy, e.g. a heavily over-subscribed CI box).
  *
  * `--only=SUBSTR` runs just the shapes whose name contains SUBSTR
  * (case-insensitive) — for iterating on one budget without paying the
  * full gate.
  *
  * `--plant` demonstrates the gate catching a regression: it runs the
  * near-dup shape with round 1's actual q29 regression — UNIGRAM simhash
  * features at wide radius (unselective signatures: ~8% of ALL pairs land
  * under the hamming cut, so the exact-verify join sees ~N²/12 pairs;
  * measured 12.8 s on 5k docs where the shipped shape takes ~0.5 s) at
  * 1/40 scale under the proportionally tightened budget — expected
  * outcome is BUDGET_OVER and exit 1.
  *
  * Since round 9 the three LONG posting sweeps (jaccard / sparse-cosine /
  * containment, the shapes whose wall-clock swings ~2.5× with machine
  * load) are primarily gated by DETERMINISTIC cost-class probes: the
  * exact Σ posting² candidate-row count over the operators' own guarded
  * posting relation, against an absolute ceiling with zero noise margin
  * (see costClassGate). Their wall budgets remain only as generous
  * backstops. `--plant-guard` demonstrates THAT gate catching the q62
  * guard-loss class (boilerplate corpus, guard disabled — expected
  * COST_CLASS_OVER and exit 1).
  */
object Stress {
  // cost-class ceilings (see costClassGate): measured 1.129e9 retained
  // Σ posting² on the 2026-08-14 regenerated sf0.1 stress corpus for
  // both probes (the guarded distinct postings and cosineIndex's
  // docfreq-guarded postings retain the SAME posting lengths by
  // construction). Values are DETERMINISTIC per corpus, so the ~2×
  // headroom only covers testdata regeneration drift — zero machine
  // noise enters. A lost guard lands ~8× over the ceiling even with the
  // copy-perturbation diluting the template (--plant-guard measured
  // Σ f² = 1.80e10 vs the 2.3e9 ceiling; an unperturbed boilerplate
  // corpus lands ~100×).
  private val PostingAbsMax = 2300000000L
  private val CosineAbsMax = 2300000000L
  // q117's prefix posting relation on the same corpus: measured
  // Σ f² = 2,498,350 (full) / 1,162,470 (half) — the (1−t)-prefix under
  // the rare-first order sits ~450× below even the GUARDED full-posting
  // mass (1.129e9), which is the whole point of the algorithm; ceiling
  // ~2× measured, same regeneration-drift-only headroom as the others.
  // A broken prefix-length computation (e.g. the float-ceil bug the
  // rational arithmetic exists to prevent) either drops pairs
  // (correctness specs catch it) or degenerates toward full postings
  // (this ceiling catches it at ~450× over).
  private val PrefixAbsMax = 5000000L

  def main(args: Array[String]): Unit = {
    val positional = args.filterNot(_.startsWith("--"))
    val dir = positional.headOption.getOrElse("/root/testdata/sf0.1")
    val plant = args.contains("--plant")
    val plantGuard = args.contains("--plant-guard")
    val only = args.collectFirst { case a if a.startsWith("--only=") =>
      a.stripPrefix("--only=").toLowerCase }
    val copies0 = positional.lift(1).map(_.toInt).getOrElse(40)
    val copies = if (plant) math.max(1, copies0 / 40) else copies0
    val spark = GraftSession(appName = "graft-stress")

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def replicate(base: org.apache.spark.sql.DataFrame) = base
      .crossJoin(spark.range(0, copies).withColumnRenamed("id", "copy"))
      .select((col("doc_id") * copies + col("copy")).as("doc_id"),
        concat_ws(" ", transform(split(col("text"), " "),
          (t, i) => when(pmod(i + col("copy"), lit(10)) < 3,
            concat(t, lit("_"), col("copy"))).otherwise(t))).as("text"))
    val big = replicate(docs).repartition(32).cache()
    println(s"DOCS=${big.count()} (distinct=${big.select("doc_id").distinct().count()})")

    // Per-run budget normalization — shared with the FaScale gate
    // ([[Calib]]): budgets scale by how much slower this host is than the
    // reference host.
    val budgetScale = Calib.budgetScale(spark)
    println(f"BUDGET_SCALE=$budgetScale%.2f")

    var failed = List.empty[String]

    // ------- COST-CLASS probes (deterministic; zero machine noise) ------
    // Σ posting² over the operators' OWN guarded posting relation
    // (Dedup.guardedDistinctGrams for the jaccard/containment sweeps,
    // Dedup.cosineIndex postings for the TF-IDF sweep — shared with the
    // operators by construction, so a guard change in the operator IS a
    // change in this metric). Σ f² is exactly the self-join's candidate
    // row count — the cost the wall budgets were trying to bound through
    // 2.5×-noisy wall-clock. Pure counts: replayable, no budget to
    // re-widen. `maxF` scales with the corpus exactly as the gated shapes
    // configure it (1% of docs, min 100).
    def sumF2(postings: org.apache.spark.sql.DataFrame): Long =
      postings.groupBy("g").agg(count(lit(1)).as("f"))
        .agg(sum(col("f") * col("f")).cast("long")).collect()(0).getLong(0)
    // maxF is FIXED across the two probe scales (1% of the FULL corpus):
    // the operators configure maxF = 1% of their own corpus, but a probe
    // whose cutoff moves with N measures the cutoff policy, not the cost
    // class — mid-frequency corpus-wide grams under a moving cutoff
    // quadruple across scales even with the guard working (measured
    // ratio 3.6). With the cutoff pinned, a working guard is linear
    // (every retained posting is bounded by the same constant) and a
    // lost guard is ~4x.
    def postingCost(d: org.apache.spark.sql.DataFrame,
                    maxF: Option[Int]): Long =
      sumF2(Dedup.guardedDistinctGrams(d, "doc_id", "text", 3, maxF))
    def cosineCost(d: org.apache.spark.sql.DataFrame, maxF: Int): Long =
      sumF2(Dedup.cosineIndex(d, "doc_id", "text", 3, maxF)._1
        .select(col("doc_id"), col("g")))
    // The GATE is the absolute ceiling: Σ f² is a pure function of the
    // (deterministic) corpus, so the ceiling needs only ~2× headroom for
    // testdata-regeneration drift — no machine-noise margin at all — and
    // a lost guard overshoots it ~100× (--plant-guard). The half-scale
    // probe is printed as telemetry, NOT gated on: measured full/half =
    // 3.62 with the guard WORKING, because mid-frequency gram docfreq
    // scales with the corpus on the replicated-duplicate shape (every
    // common trigram's f doubles when base docs double, so retained f²
    // quadruples) — on this corpus the scaling RATIO does not separate a
    // working guard from a lost one; the absolute retained mass does,
    // sharply.
    def costClassGate(name: String, fullC: org.apache.spark.sql.DataFrame,
                      halfC: org.apache.spark.sql.DataFrame,
                      costAt: org.apache.spark.sql.DataFrame => Long,
                      absMax: Long): Unit = {
      if (only.forall(name.toLowerCase.contains)) {
        val full = costAt(fullC)
        val half = costAt(halfC)
        val ratio = full.toDouble / half.toDouble
        val ok = full <= absMax
        if (!ok) failed ::= name
        println(f"$name full=$full half=$half ratio=$ratio%.2f " +
          f"(absMax=$absMax) " + (if (ok) "OK" else "COST_CLASS_OVER"))
      }
    }

    def gated(name: String, budgetSec: Double)(body: => Long): Unit = {
      if (only.forall(name.toLowerCase.contains)) {
        val budget = budgetSec * budgetScale
        val t0 = System.nanoTime()
        val n = body
        val t = (System.nanoTime() - t0) / 1e9
        val verdict = if (t <= budget) "OK" else { failed ::= name; "BUDGET_OVER" }
        println(f"$name=$n t=$t%.1fs budget=$budget%.0fs $verdict")
      }
    }

    if (plant) {
      // PLANTED REGRESSION DEMO (1/40 scale, proportionally tight
      // budget): unigram signature features at wide radius — round 1's
      // real q29 selectivity regression, the class this gate exists for.
      gated("SIMHASH_NEARDUPS_VERIFIED_PLANTED", budgetSec = 3) {
        Dedup.simHashNearDups(big, "doc_id", "text", maxHamming = 12,
          shingleSize = 2, threshold = 0.8, featureShingle = 1).count()
      }
    } else if (plantGuard) {
      // PLANTED GUARD-LOSS DEMO: one boilerplate template verbatim in
      // 1/3 of base docs, hot-shingle guard DISABLED — the exact q62
      // regression class (reverted guard on a corpus with corpus-wide
      // boilerplate). The template's grams carry f ≈ N/3 per copy
      // stream, so the retained Σ f² lands ~8× over the ceiling
      // (measured 1.80e10 vs 2.3e9): expected outcome is COST_CLASS_OVER
      // and exit 1 — proving the deterministic gate catches what the
      // noisy wall budgets were for, with zero machine-noise margin in
      // the bound.
      val boilDocs = docs.select(col("doc_id"),
        when(pmod(col("doc_id"), lit(3)) === 0,
          lit("all rights reserved terms of service privacy policy " +
            "cookie notice copyright footer navigation home about " +
            "contact page")).otherwise(col("text")).as("text"))
      costClassGate("POSTING_COST_CLASS_PLANTED",
        replicate(boilDocs).repartition(32),
        replicate(boilDocs.filter(pmod(col("doc_id"), lit(2)) === 0))
          .repartition(32),
        d => postingCost(d, None), absMax = PostingAbsMax)
    } else {
      // deterministic Σ posting² cost-class gates for the guarded
      // sweeps — the PRIMARY regression detector for the three long
      // shapes (wall budgets below stay only as generous backstops; see
      // the cost-class comment above).
      val halfBig = replicate(docs.filter(pmod(col("doc_id"), lit(2)) === 0))
        .repartition(32)
      val gateMaxF = (big.count() / 100).toInt max 100
      costClassGate("POSTING_COST_CLASS_GUARDED", big, halfBig,
        d => postingCost(d, Some(gateMaxF)), absMax = PostingAbsMax)
      costClassGate("COSINE_COST_CLASS_GUARDED", big, halfBig,
        d => cosineCost(d, gateMaxF), absMax = CosineAbsMax)
      // q117's prefix-filter candidate mass — UNguarded corpus, the
      // prefix itself is the guard: Σ f² over Dedup.prefixPostings (the
      // operator's own self-join input, shared by construction)
      costClassGate("PREFIX_COST_CLASS", big, halfBig,
        d => sumF2(Dedup.prefixPostings(d, "doc_id", "text", 3, 4L, 5L)),
        absMax = PrefixAbsMax)
      // ------- GRAPH cost-class gates (deterministic) -------
      // Wedge candidate mass Σ C(out-deg, 2) over triangleCounts' OWN
      // degree-ordered orientation, on a 200k-node graph with 200
      // planted 1000-spoke hubs (the skew shape the orientation exists
      // for). A working orientation points every spoke AT its hub, so
      // the mass stays ~|E|-linear (measured 261,914 exactly — spokes
      // hold out-degree 1-3 from their hub edge plus whichever ring
      // edges they win on the (deg, id) tie); an id-ordered or reversed
      // orientation hands each hub C(999, 2) wedges → ~1e8, 180× the
      // ceiling. Pure count: deterministic by construction, zero noise.
      val wedgeOn = only.forall("graph_wedge_cost_class".contains)
      val walkOn = only.forall("graph_walk_frontier".contains)
      if (wedgeOn || walkOn) {
        val gN = 200000L
        val ring = spark.range(gN).select(col("id").as("src"),
          ((col("id") * 7 + 1) % gN).as("dst"), lit(1L).as("w"))
        val hubs = spark.range(gN).select(col("id").as("src"),
          (col("id") - pmod(col("id"), lit(1000L))).as("dst"),
          lit(1L).as("w"))
        val gEdges = ring.union(hubs)
        if (wedgeOn) {
          val (_, oriented) = graft.ops.Graph.degreeOriented(gEdges)
          val wedgeMass = oriented.groupBy("src")
            .agg(count(lit(1)).as("f"))
            .agg(expr("CAST(sum((f * (f - 1)) div 2) AS LONG)"))
            .collect()(0).getLong(0)
          val wedgeMax = 550000L // ~2x the measured 261,914 exact mass
          val ok = wedgeMass <= wedgeMax
          if (!ok) failed ::= "GRAPH_WEDGE_COST_CLASS"
          println(s"GRAPH_WEDGE_COST_CLASS mass=$wedgeMass " +
            s"(absMax=$wedgeMax) " + (if (ok) "OK" else "COST_CLASS_OVER"))
        }
        // Random-walk frontier bound on the same graph: every live walk
        // contributes AT MOST one row per step (inverse-CDF selection
        // picks the unique covering edge), so total output is hard-capped
        // at (steps+1)·|V|. A frontier blow-up — cumulative bounds
        // overlapping so a draw matches several edges — multiplies rows
        // per step and smashes through this structural ceiling.
        // Own guard (not nested in the wedge gate's): `--only
        // graph_walk_frontier` runs it independently.
        if (walkOn) {
          val steps = 3
          val nNodes = gEdges.select(col("src").as("n"))
            .union(gEdges.select(col("dst").as("n"))).distinct().count()
          val walkRows = graft.ops.Graph.randomWalks(gEdges, steps).count()
          val walkMax = (steps + 1) * nNodes
          val wok = walkRows <= walkMax
          if (!wok) failed ::= "GRAPH_WALK_FRONTIER"
          println(s"GRAPH_WALK_FRONTIER rows=$walkRows nodes=$nNodes " +
            s"(absMax=$walkMax) " + (if (wok) "OK" else "COST_CLASS_OVER"))
        }
      }
      // ------- PQ / IVF-PQ ADC cost-class gates (deterministic) -------
      // The two slowest bench families previously had plan pins but no
      // candidate-mass gate — a routing/table-duplication regression
      // would have surfaced only as wall-clock noise. Both counts run the
      // operators' OWN relations (Similarity.pqScoredPairs /
      // ivfRoutedCandidates) on a 40×-replicated, per-copy-perturbed
      // embedding corpus — pure functions of the deterministic corpus,
      // pinned exact with ~2× regeneration-drift headroom, zero machine
      // noise.
      val pqOn = only.forall("pq_adc_cost_class".contains)
      val ivfpqOn = only.forall("ivfpq_route_cost_class".contains)
      val marginOn = only.forall("margin_route_cost_class".contains)
      val hardnegOn = only.forall("hardneg_route_cost_class".contains)
      val knnOn = only.forall("knn_route_cost_class".contains)
      val mutualOn = only.forall("mutual_route_cost_class".contains)
      val lshvOn = only.forall("lshvec_cost_class".contains)
      if (pqOn || ivfpqOn || marginOn || hardnegOn || knnOn || mutualOn ||
          lshvOn) {
        import graft.ops.Similarity
        val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        // per-copy deterministic perturbation: copies must land in
        // DIFFERENT IVF cells (identical copies would collapse routing
        // into one degenerate cell and the gate couldn't see a lost
        // nProbe filter)
        val bigEmb = emb
          .crossJoin(spark.range(0, copies).withColumnRenamed("id", "copy"))
          .select((col("vec_id") * copies + col("copy")).as("vec_id"),
            transform(col("embedding"), (x, i) =>
              x.cast("double") +
                (pmod(col("copy") * 37 + i * 13, lit(100)) - 50) / 100.0)
              .as("embedding"))
          .repartition(32)
        val qStride = 4000L
        val nEmb = bigEmb.count()
        if (pqOn) {
          // brute ADC is structurally queries·(N−1)·m: 20·79,999·8 =
          // 12,799,840 on the 40× corpus. A codes- or ADC-table
          // duplication regression multiplies it.
          val (_, books, codes) = Similarity.pqArtifacts(bigEmb,
            "vec_id", "embedding", m = 8, k = 64, trainIters = 0,
            dim = 64)
          val base = bigEmb.select(col("vec_id").as("id"),
            transform(col("embedding"), x => x.cast("double")).as("v"))
          val qdist = Similarity.pqAdcTable(
            base.filter(col("id") % qStride === 0), books, 8, 8)
          val mass = Similarity.pqScoredPairs(codes, qdist).count()
          val massMax = 26000000L // ~2x the structural 12,799,840
          val ok = mass <= massMax
          if (!ok) failed ::= "PQ_ADC_COST_CLASS"
          println(s"PQ_ADC_COST_CLASS mass=$mass n=$nEmb " +
            s"(absMax=$massMax) " + (if (ok) "OK" else "COST_CLASS_OVER"))
        }
        if (ivfpqOn) {
          val base = bigEmb.select(col("vec_id").as("id"),
            transform(col("embedding"), x => x.cast("double")).as("v"))
          val cand = Similarity.ivfRoutedCandidates(base,
            nCentroids = 16, nProbe = 2, queryStride = qStride).count()
          // measured 239,140 exact on this corpus (2026-08-14, 40×
          // perturbed embeddings); a lost nProbe filter reverts routing
          // to all cells ≈ 20·N = 1.6e6, ~6.7× over this ceiling
          val candMax = 400000L
          val ok = cand <= candMax
          if (!ok) failed ::= "IVFPQ_ROUTE_COST_CLASS"
          println(s"IVFPQ_ROUTE_COST_CLASS cand=$cand n=$nEmb " +
            s"(absMax=$candMax) " + (if (ok) "OK" else "COST_CLASS_OVER"))
        }
        if (marginOn) {
          // Margin mining's query side is the WHOLE corpus (both parity
          // halves need their k-NN means), so routed pair mass is
          // structurally N²·nProbe/(2C) — the cut over brute N²/4 is
          // C/(2·nProbe), which only wins when the cell count scales
          // with the corpus (the FAISS nlist ∝ √N sizing the operator
          // scaladoc contracts). The gate therefore measures at the
          // scale-correct configuration for its corpus: N = 20,000
          // (quarter slice, both parities), C = 128 ≈ √N·0.9,
          // nProbe = 4 → measured 2,060,961 exact (2026-08-15; trained-
          // free seeded cells are skewed, so the uniform-cell estimate
          // 6.3e6 overshoots). A lost nProbe filter reverts probes to
          // all C cells — mass → N²/2 = 2e8, ~44× over this ceiling.
          val base = bigEmb.filter(col("vec_id") < 20000)
            .select(col("vec_id").as("id"),
              transform(col("embedding"), x => x.cast("double")).as("v"))
          val cand = Similarity.marginRoutedPairs(base,
            nCentroids = 128, nProbe = 4).count()
          val candMax = 4500000L // ~2.2x the measured mass
          val ok = cand <= candMax
          if (!ok) failed ::= "MARGIN_ROUTE_COST_CLASS"
          println(s"MARGIN_ROUTE_COST_CLASS cand=$cand n=20000 " +
            s"(absMax=$candMax) " + (if (ok) "OK" else "COST_CLASS_OVER"))
        }
        if (hardnegOn) {
          // deterministic 7-way label so the mismatch filter engages the
          // routed relation the q206 face ships
          val labels = bigEmb.select(col("vec_id").as("doc_id"),
            concat(lit("L"), (col("vec_id") % 7).cast("string")).as("lang"))
          // measured 376,424 exact (2026-08-15, 40× perturbed corpus:
          // 20 anchors × 4 probed cells × ~5000-member cells × 6/7
          // mismatch); the brute face is anchors × mismatched corpus ≈
          // (N/4000)·N·6/7 = 1.37e8, ~180× over this ceiling
          val cand = Similarity.hardNegRoutedScored(bigEmb, labels,
            "vec_id", "embedding", stride = qStride,
            nCentroids = 16, nProbe = 4).count()
          val candMax = 760000L // ~2x the measured mass
          val ok = cand <= candMax
          if (!ok) failed ::= "HARDNEG_ROUTE_COST_CLASS"
          println(s"HARDNEG_ROUTE_COST_CLASS cand=$cand n=$nEmb " +
            s"(absMax=$candMax) " + (if (ok) "OK" else "COST_CLASS_OVER"))
        }
        if (knnOn) {
          // the q149 shape at gate scale: strided queries, 5-way labels
          // on the rest. Measured 475,220 exact (2026-08-15, 40×
          // perturbed corpus: 20 queries × 4 probed cells × skewed
          // seeded cells); the brute face is queries × N = 20·80,000 =
          // 1.6e6 — and a lost nProbe filter reverts routing to all 16
          // cells ≈ the brute class, ~3.4× over this ceiling.
          val labeled = bigEmb.filter(col("vec_id") % qStride =!= 0)
            .select(col("vec_id").as("id"), col("embedding").as("vec"),
              (col("vec_id") % 5).as("label"))
          val queries = bigEmb.filter(col("vec_id") % qStride === 0)
            .select(col("vec_id").as("id"), col("embedding").as("vec"))
          val cand = Similarity.knnRoutedScored(labeled, queries,
            nCentroids = 16, nProbe = 4).count()
          val candMax = 950000L // ~2x the measured mass
          val ok = cand <= candMax
          if (!ok) failed ::= "KNN_ROUTE_COST_CLASS"
          println(s"KNN_ROUTE_COST_CLASS cand=$cand n=$nEmb " +
            s"(absMax=$candMax) " + (if (ok) "OK" else "COST_CLASS_OVER"))
        }
        if (mutualOn) {
          // the q278 shape at gate scale: stride-100 subset (800
          // members, EVERY one a query — mutuality needs both
          // directions), 4 of 16 probed cells. The brute face is
          // (N/stride)² = 800·799 = 639,200; a lost nProbe filter
          // reverts routing to all 16 cells ≈ the brute class, ~4×
          // over the routed mass. Measured 185,762 exact (2026-08-16,
          // 40× perturbed corpus: 800 queries × 4 probed cells ×
          // skewed seeded cells).
          val cand = Similarity.mutualRoutedScored(bigEmb, "vec_id",
            "embedding", stride = 100L, nCentroids = 16, nProbe = 4)
            .count()
          val candMax = 400000L // ~2x the measured mass
          val ok = cand <= candMax
          if (!ok) failed ::= "MUTUAL_ROUTE_COST_CLASS"
          println(s"MUTUAL_ROUTE_COST_CLASS cand=$cand n=$nEmb " +
            s"(absMax=$candMax) " + (if (ok) "OK" else "COST_CLASS_OVER"))
        }
        if (lshvOn) {
          // vector-LSH same-bucket candidate mass at the q30 params
          // (nBits = 16, single-probe) with strided queries — the one
          // ANN candidate stage that had a calibration face
          // (lshCandidatePairs) but no pinned gate (round-13 audit).
          // A bucketing regression (shorter chunk keys, lost stride,
          // accidental probe fan-out) multiplies this count. Measured
          // 73,827 exact (2026-08-15, 40x perturbed corpus: 20 queries
          // x 2 chunk buckets x ~2k same-key rows); the unbucketed
          // class is queries x N = 1.6e6, ~10x over this ceiling.
          val cand = Similarity.lshCandidatePairs(bigEmb, "vec_id",
            "embedding", nBits = 16, dim = 64, probeBits = 0,
            queryStride = qStride).count()
          val candMax = 150000L // ~2x the measured mass
          val ok = cand <= candMax
          if (!ok) failed ::= "LSHVEC_COST_CLASS"
          println(s"LSHVEC_COST_CLASS cand=$cand n=$nEmb " +
            s"(absMax=$candMax) " + (if (ok) "OK" else "COST_CLASS_OVER"))
        }
      }
      // Budgets: measured local[32] 2026-08 (9.1 / 15.9 / 2.2 / 3.9 /
      // 1.5 / 153 s) × ~2.5 headroom.
      gated("MINHASH_PAIRS", budgetSec = 20) {
        Dedup.minHashCandidates(big, "doc_id", "text", 16, 4, 3).count()
      }
      // the q25 shape: LSH candidates then exact verification of only the
      // candidates — the scale replacement for the standalone sweep
      gated("MINHASH_NEARDUPS_VERIFIED", budgetSec = 35) {
        Dedup.minHashNearDups(big, "doc_id", "text",
          k = 16, bands = 8, shingleSize = 3,
          minEstJaccard = 0.5, threshold = 0.8).count()
      }
      gated("SIMHASH_PAIRS", budgetSec = 8) {
        Dedup.simHashPairs(big, "doc_id", "text", 3).count()
      }
      // simhash end-to-end in its scale regime: tight radius (16-bit
      // chunks), shingle features, exact-verified — the 100 TB shape.
      // Wide radii (4-bit chunk keys) are exactly what `--plant` shows
      // the budget catching.
      gated("SIMHASH_NEARDUPS_VERIFIED", budgetSec = 12) {
        Dedup.simHashNearDups(big, "doc_id", "text", maxHamming = 3,
          shingleSize = 2, threshold = 0.8, featureShingle = 2).count()
      }
      gated("EXACT_GROUPS>1", budgetSec = 6) {
        Dedup.exactGroups(big, "doc_id",
          TextAnalysis.contentFingerprint(col("text")))
          .filter(col("group_size") > 1).count()
      }
      // exact-Jaccard with the hot-shingle guard (the inverted-index skew
      // bomb protection): shingles in >1% of docs are dropped pre-join.
      // Slow by design (it IS the baseline sweep) — budget catches it
      // going quadratic past the guard.
      // Same 2026-08-14 recalibration as its siblings: measured
      // 120 / 137 / 186 / 349 s across same-code runs; 500 s ≈ 1.4×
      // worst observed, still hours under the unguarded class.
      // WALL BACKSTOP only (since round 9): the primary regression gate
      // for this shape is POSTING_COST_CLASS_GUARDED above — exact
      // candidate-row counts, immune to the ~2.5x machine-load swing
      // that forced two rounds of budget re-widening. The generous wall
      // ceiling still catches a non-cost pathology (e.g. a plan that
      // recomputes the postings subtree per consumer).
      gated("JACCARD_PAIRS_GUARDED", budgetSec = 900) {
        Dedup.jaccardPairs(big, "doc_id", "text", 3, 0.8,
          maxShingleFreq = Some((big.count() / 100).toInt max 100)).count()
      }
      // TF-IDF shingle-cosine pairs WITH the docfreq guard engaged (the
      // q69 configuration) on the dup-cluster corpus: retained posting
      // lists are bounded at 1% of docs, so candidate volume stays
      // linear in gram volume; the budget catches the guard being
      // bypassed/defaulted off (the posting self-join reverting to the
      // all-pairs class on duplicate-heavy corpora).
      // Budget recalibrated 2026-08-13 (pre-regen): A/B isolation put the
      // load-normalized cost at ~133 s → 250 s budget. Re-recalibrated
      // 2026-08-14 on the REGENERATED testdata: three same-code runs
      // measured 242 / 339 / 369 s (the 2 s CALIB probe under-predicts
      // sustained-load slowdown on this, the longest shape), so 250 s sat
      // inside the shape's own noise band and tripped on an unchanged
      // code path. 450 s ≈ 1.2× the worst observed run and still an
      // order+ under the unguarded all-pairs class (hours) — the
      // regression this gate exists to catch.
      // WALL BACKSTOP only — primary gate: COSINE_COST_CLASS_GUARDED.
      gated("SPARSE_COSINE_GUARDED", budgetSec = 900) {
        Dedup.sparseCosinePairs(big, "doc_id", "text", 3,
          maxDocFreq = (big.count() / 100).toInt max 100,
          minCos = 0.6).count()
      }
      // Containment sweep WITH the guard engaged (the q62 configuration)
      // on the dup-cluster corpus: every doc shares most grams with its
      // 40 perturbed copies, so posting lists carry real dup mass. The
      // guard bounds the self-join at posting <= 1% of docs per retained
      // gram; the budget catches the guard being bypassed/defaulted off
      // (the unguarded sweep on a corpus with corpus-wide boilerplate is
      // the O(N^2) class q62 was graded weak for in round 5).
      // Budget re-recalibrated 2026-08-14 (regenerated testdata): four
      // same-code runs measured 153 / 171 / 182 / 397 s — the long
      // posting sweeps swing ~2.5× with machine memory pressure the 2 s
      // CALIB probe cannot see, so the old 250 s sat inside the noise
      // band (sibling SPARSE_COSINE dropped 339→142 s in the SAME
      // session this shape spiked). 500 s ≈ 1.25× worst observed;
      // the guard-bypass regression this catches is the HOURS class.
      // WALL BACKSTOP only — primary gate: POSTING_COST_CLASS_GUARDED
      // (containment self-joins the same guardedDistinctGrams relation).
      gated("CONTAINMENT_PAIRS_GUARDED", budgetSec = 900) {
        Dedup.containmentPairs(big, "doc_id", "text", 3, 0.9,
          maxShingleFreq = Some((big.count() / 100).toInt max 100)).count()
      }
      // The bottom-k sketch sibling, in ITS regime: a mostly-unique
      // corpus with sparse containment pairs (the post-dedup shape the
      // probe is for — see containmentPairsSketch's scaladoc regime
      // note). The 1-in-10 slice breaks the 40-copy clusters down to
      // 4-copy ones; on the FULL cluster corpus the sketch's
      // O(Σ_cands·|A|) verify is strictly worse than the sweep's
      // Σ posting² (measured: >37 GB shuffle spill vs the sweep's
      // 163 s) — that measurement is WHY the sweep stays the checked
      // path and the sketch is the sparse-regime alternative.
      gated("CONTAINMENT_SKETCH_SPARSE_20K", budgetSec = 60) {
        Dedup.containmentPairsSketch(
          big.filter(pmod(col("doc_id"), lit(10)) === 0),
          "doc_id", "text", 3, 0.9, sketchK = 8,
          maxShingleFreq = Some(200)).count()
      }
      // Degenerate-LSH-bucket shape: 50% of the corpus is ONE verbatim
      // boilerplate template -> identical signatures -> one 100k-doc
      // bucket per band -> O(c^2) = 5e9 candidate pairs unguarded (AQE
      // skew-split only spreads that work, it cannot shrink it). With
      // maxBucketSize the boilerplate buckets are counted and dropped on
      // the narrow index; the other half's candidates are untouched. The
      // budget catches the guard losing the anti-join (candidate volume
      // reverts to quadratic and the count blows past any budget).
      // COUNT-PRIMARY since round 10: the candidate count is
      // deterministic (29,067 on this corpus — the guard dropping the
      // boilerplate buckets; ceiling ~2x for regeneration drift) while
      // the wall swings with sustained load (15.9 s observed right
      // after the sketch shape's heap churn where the same code
      // measured 7.0 s — the r9-documented noise class the 2 s calib
      // probe cannot see; that swing tripped the old 10 s budget on an
      // unchanged code path). A lost guard lands ~5e9 candidates
      // (~170,000x the count ceiling) and hours of wall — both gates
      // catch it; only the count gate is noise-free.
      gated("LSH_DEGENERATE_BUCKET_200K", budgetSec = 60) {
        val boiler = big.select(col("doc_id"),
          when(pmod(col("doc_id"), lit(2)) === 0,
            lit("all rights reserved terms of service privacy policy " +
              "cookie notice copyright footer navigation home about contact"))
            .otherwise(col("text")).as("text"))
        val n = Dedup.minHashCandidates(boiler, "doc_id", "text", 16, 8, 3,
          minEstJaccard = 0.5, maxBucketSize = Some(1000)).count()
        val nMax = 60000L
        if (n > nMax) {
          failed ::= "LSH_DEGENERATE_BUCKET_COUNT"
          println(s"LSH_DEGENERATE_BUCKET_COUNT n=$n (absMax=$nMax) " +
            "COST_CLASS_OVER")
        }
        n
      }
      // q45's FULL pipeline at replicated scale: banded candidates →
      // est-prune → exact verify → O(log d) label contraction → canonical
      // filter. This is the clustering loop's only replicated-scale
      // budget; its per-round job count (2 actions: hook + jump, the
      // convergence probe rides the jump's CollectMetrics) is exactly the
      // regression class this line exists to catch. threshold=0.5 keeps
      // the copy-cluster edges (pairwise Jaccard between perturbed copies
      // sits in [~0.3, ~0.6]), so components contracts real 200k-node /
      // multi-million-edge input, not an empty edge set.
      // Budget reflects the measured WALL distribution, not CPU: 40.7 s
      // alone on an idle host, 109-216 s when run (as here) right after
      // the guarded sweep's heap churn in the same JVM (GC-dominated
      // waits the CPU-throughput calibration cannot normalize — the
      // 216 s outlier tripped a 170 s budget on a scale-1.0 host while
      // every compute-bound shape ran 3-6x FASTER than budgeted). A real
      // clustering blowup is minutes-to-unbounded, far above 350 s.
      gated("DROP_NEARDUPS_E2E", budgetSec = 350) {
        Dedup.dropNearDups(big, "doc_id", "text",
          shingleSize = 2, threshold = 0.5, k = 16, bands = 8).count()
      }
      // q50's nightly-ingest shape at replicated scale: 10% of the corpus
      // arrives as a batch, admitted against the other 90% via the band
      // index (batch side broadcasts) plus within-batch self-dedup. The
      // regression class this catches: candidate-volume blowups in the
      // cross join (est-prune losing selectivity) or a broadcast that
      // silently becomes a shuffle. Measured 1.4 s at 200k docs on a
      // scale-4.5 host (reference-host equivalent ~0.3 s); 4 s reference
      // budget = ~10x headroom for noise, far under any blowup regime.
      gated("INCREMENTAL_ADMIT", budgetSec = 4) {
        Dedup.incrementalNearDups(
          big.filter(col("doc_id") % 10 =!= 0),
          big.filter(col("doc_id") % 10 === 0),
          "doc_id", "text", k = 16, bands = 8, shingleSize = 3,
          minEstJaccard = 0.5, threshold = 0.8).count()
      }
      // q46 crossover evidence (PLANS.md): FIXED-FORMAT corpus — random
      // 12-hex-char serials, every string the same length — the shape
      // where length-only blocking degenerates to ONE all-pairs bucket.
      // The PassJoin segment path is gated at 100k rows; at 5k rows both
      // variants are raced informationally (the length-blocked baseline
      // is n² by construction there — timing it at 100k would BE the
      // quadratic blow-up).
      def serials(n: Long) = spark.range(n)
        .select(col("id"),
          substring(md5(col("id").cast("string")), 1, 12).as("s"))
      gated("EDITDIST_SEG_FIXEDFMT_100K", budgetSec = 60) {
        Dedup.editDistancePairsSegmented(serials(100000L), "id", "s", 2).count()
      }
      def timed(name: String)(body: => Long): Unit = {
        if (only.forall(name.toLowerCase.contains)) {
          val t0 = System.nanoTime()
          val n = body
          println(f"$name=$n t=${(System.nanoTime() - t0) / 1e9}%.1fs (informational)")
        }
      }
      for (n <- Seq(5000L, 10000L, 20000L, 40000L)) {
        timed(s"EDITDIST_SEG_FIXEDFMT_${n / 1000}K") {
          Dedup.editDistancePairsSegmented(serials(n), "id", "s", 2).count()
        }
        timed(s"EDITDIST_LEN_FIXEDFMT_${n / 1000}K") {
          Dedup.editDistancePairs(serials(n), "id", "s", 2).count()
        }
      }
      // Decontamination probe at replicated scale: a benchmark-sized eval
      // slice (0.5%, ~1k docs) against the remaining ~199k train docs via
      // exact 5-gram postings. The replicated corpus is adversarial here:
      // every doc shares most grams with its perturbed copies, so the hit
      // join carries real volume. Catches: eval-side broadcast silently
      // becoming a shuffle, or posting-join blowup.
      gated("NGRAM_CONTAMINATION", budgetSec = 5) { // measured 2.0 s @ scale 2.23
        Dedup.ngramContamination(
          big.filter(pmod(col("doc_id"), lit(200)) =!= 0),
          big.filter(pmod(col("doc_id"), lit(200)) === 0),
          "doc_id", "text", n = 5).count()
      }
      // Repetition metrics run the native RepetitionStats expression —
      // the budget catches its per-row constant blowing up: the expression
      // silently falling back to the interpreted HOF formulation
      // (measured 240+ s on this shape vs 0.36 s native — the lesson in
      // TextAnalysis's scaladoc), or a refactor reintroducing per-row
      // quadratic work in the trigram-dup term.
      gated("REPETITION_METRICS", budgetSec = 10) { // measured 4.8 s @ scale 2.23 (native expr)
        TextAnalysis.repetitionMetrics(big, "doc_id", "text")
          .filter(col("keep")).count()
      }
      // Bucketized range join at synthetic scale: 10M points vs 10k
      // intervals (mean span ≈ 2 buckets). The naive plan is a 10M×10k
      // nested loop — this must stay an equi-join.
      gated("RANGE_JOIN_10M", budgetSec = 5) { // measured 2.0 s @ scale 2.23
        val pts = spark.range(10000000L)
          .select(col("id").as("p_id"), pmod(col("id") * 2654435761L,
            lit(1000000L)).as("p"))
        val ivs = spark.range(10000L)
          .select(col("id").as("iv_id"),
            pmod(col("id") * 40503L, lit(1000000L)).as("s"))
          .withColumn("e", col("s") + pmod(col("iv_id"), lit(200L)))
        graft.ops.Joins.rangeJoinPoints(pts, "p", ivs, "s", "e",
          bucketWidth = 128).count()
      }
      // Bloom semi-join at synthetic scale: 20M-row fact, 100k-key dim
      // (0.5% selectivity). Gates the probe staying a scan-side filter;
      // the plain semi-join is raced informationally for the comparison.
      // Honest regime note: at THIS scale the plain semi-join is faster
      // (0.9 s vs 2.7 s) — a 100k-int dim broadcasts, so the exact join
      // never shuffles the fact side and the bloom probe is pure
      // overhead. The bloom path wins when the dim exceeds broadcast
      // (shuffle avoided) or the filter is REUSED across jobs/scans
      // (admission control). The gate pins the probe's cost class, not
      // a speedup claim.
      gated("BLOOM_SEMIJOIN_20M", budgetSec = 6) { // measured 2.7 s @ scale 2.23
        val fact = spark.range(20000000L).select(col("id").as("k"))
        val dim = spark.range(100000L)
          .select((col("id") * 200L).as("k"))
        graft.ops.Joins.bloomSemiJoin(fact, dim, Seq("k"),
          expectedItems = 100000L, numBits = 1600000L).count()
      }
      // Two-level prefix scan at replicated scale: the regression class is
      // someone "simplifying" it back to a global-order window, which
      // funnels all 200k rows through one partition (and at real scale,
      // everything).
      gated("PACK_TOKENS_200K", budgetSec = 6) {
        TextAnalysis.packTokens(big, "doc_id", "text", capacity = 2048)
          .agg(max(col("bin_last"))).collect()(0).getLong(0)
      }
      // Span dedup at replicated scale: two map-side-combinable hash
      // aggregations and nothing else. The regression class: the winner
      // selection decaying into a join-back (spans shuffled a second time
      // with full text) or the reassembly picking up a global-order
      // window — either way the span-text shuffle mass multiplies.
      gated("SPAN_DEDUP_200K", budgetSec = 10) { // measured 3.3 s @ scale 1.00
        Dedup.spanDedup(big, "doc_id", "text", spanWords = 10)
          .agg(sum(col("n_kept"))).collect()(0).getLong(0)
      }
      timed("PLAIN_SEMIJOIN_20M") {
        val fact = spark.range(20000000L).select(col("id").as("k"))
        val dim = spark.range(100000L)
          .select((col("id") * 200L).as("k"))
        graft.ops.Joins.semiJoin(fact, dim, Seq("k")).count()
      }
      // Trained IVF with SAMPLED training at replicated scale: k-means on
      // a deterministic 10% hash sample of a copies×-replicated,
      // per-copy-perturbed embedding corpus (every copy nudged ±0.003 per
      // component so the clones are near- but not exact dups). Gates BOTH
      // the wall budget and recall@5 vs brute force on the same corpus —
      // the sample-fraction machinery's only replicated-scale check.
      val bigEmb = spark.read.parquet(s"$dir/embeddings.parquet")
        .crossJoin(spark.range(0, copies).withColumnRenamed("id", "copy"))
        .select((col("vec_id") * copies + col("copy")).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            (x + (pmod(col("copy") * 31 + i, lit(7)) - lit(3))
              .cast("float") * lit(0.001f)).cast("float")).as("embedding"))
        .repartition(32)
        .cache()
      println(s"EMB=${bigEmb.count()}")
      gated("IVF_TRAINED_SAMPLE10_RECALL", budgetSec = 25) { // measured 8.9 s
        def topSet(df: org.apache.spark.sql.DataFrame) = df
          .select("query_id", "cand_id").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
          .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
        val stride = 2000L * copies / 40 // ~100 queries at the default 40×
        val bf = topSet(graft.ops.Similarity.bruteForceTopK(
          bigEmb, "vec_id", "embedding", k = 5, stride = stride))
        val ivf = topSet(graft.ops.Similarity.ivfTopK(
          bigEmb, "vec_id", "embedding", k = 5, nCentroids = 16, nProbe = 5,
          queryStride = stride, trainIters = 2, trainSampleFraction = 0.1))
        val recalls = bf.map { case (q, truth) =>
          ivf.get(q).map(c => (c & truth).size.toDouble / truth.size)
            .getOrElse(0.0)
        }
        val mean = recalls.sum / recalls.size
        println(f"IVF_SAMPLE10_RECALL@5=$mean%.3f queries=${bf.size}")
        if (mean < 0.9) failed ::= "IVF_TRAINED_SAMPLE10_RECALL(recall<0.9)"
        (mean * 1000).toLong
      }
      // SemDedup at replicated scale: 16 seeded cells over a 20k-vector
      // slice of the perturbed corpus (every 4th family member — each
      // clone family keeps copies/4 near-identical mates), in-cell pair
      // work Σ|cell|² ≈ N²/16 ≈ 25M cosines. Gates the cost class — a
      // regression to cartesian (16× the pairs) or a lost assignment
      // materialization (the centroid fan-out + top-1 shuffle running
      // twice) trips the budget. The perturbed clone families
      // (cos ≈ 0.999 ≫ 0.9) must collapse toward their lowest ids, so
      // the drop count also pins recall: each surviving vector is its
      // family's in-cell minimum.
      gated("SEMDEDUP_20K", budgetSec = 20) { // measured 4.5 s @ scale 1.0
        val semEmb = bigEmb.filter(pmod(col("vec_id"), lit(4)) === 0)
        val dropped = graft.ops.Dedup.semanticDedup(semEmb, "vec_id",
            "embedding", nCentroids = 16, threshold = 0.9)
          .filter(!col("kept")).count()
        if (dropped < semEmb.count() / 2)
          failed ::= s"SEMDEDUP_20K(dropped=$dropped too low)"
        dropped
      }
      // Worst-case SKEW: nCentroids=1 forces the whole 20k slice into ONE
      // cell — uncapped that is 400M in-cell cosines (~16× the gate
      // budget); maxCellSize=512 shards it to ceil(20k/512)=40 hash
      // shards ⇒ ~20k·512 ≈ 10M pairs, BELOW the healthy-cell gate
      // above. Pins the cost cap (budget) AND the predicted capped
      // recall: a clone family of size f over s shards drops
      // ~f²/2s members (birthday collisions), so with f ≈ 8 and s = 40
      // the expected drop rate is ~f/2s ≈ 10% — measured 2102/20000.
      // The bound is half that expectation: a collapse to near-zero
      // means the shard split stopped co-locating ANY clones (e.g. the
      // split became partition-dependent), which is the regression this
      // half-expectation bound catches.
      gated("SEMDEDUP_SKEW_CAP_20K", budgetSec = 20) {
        val semEmb = bigEmb.filter(pmod(col("vec_id"), lit(4)) === 0)
        val dropped = graft.ops.Dedup.semanticDedup(semEmb, "vec_id",
            "embedding", nCentroids = 1, threshold = 0.9,
            maxCellSize = Some(512))
          .filter(!col("kept")).count()
        if (dropped < semEmb.count() / 20)
          failed ::= s"SEMDEDUP_SKEW_CAP_20K(dropped=$dropped too low)"
        dropped
      }
      bigEmb.unpersist()
    }
    spark.stop()
    if (failed.nonEmpty) {
      println(s"STRESS_GATE_FAILED: ${failed.reverse.mkString(", ")}")
      sys.exit(1)
    } else println("STRESS_GATE_OK")
  }
}
