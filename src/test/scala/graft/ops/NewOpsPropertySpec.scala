package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.TestSpark

/** Property-based invariants for the round-5 operator family: randomized
  * inputs against naive reference formulations (the same style as
  * fa.PropertySpec — seeded generators, no scalatestplus bridge).
  */
class NewOpsPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val params = Gen.Parameters.default.withSize(30)
  private def forAllSeeded[T](g: Gen[T], n: Int = 4)(body: T => Unit): Unit =
    (1 to n).foreach { i =>
      g.apply(params, Seed(i.toLong)).foreach(body)
    }

  private val pointsGen = Gen.nonEmptyListOf(Gen.choose(-500L, 500L))
  private val intervalGen = Gen.nonEmptyListOf(for {
    s <- Gen.choose(-500L, 500L)
    span <- Gen.choose(-20L, 80L) // negative spans: inverted, must drop
  } yield (s, s + span))
  private val widthGen = Gen.oneOf(1L, 3L, 7L, 16L, 100L)

  test("rangeJoinPoints == naive non-equi join on random data, any width") {
    forAllSeeded(Gen.zip(pointsGen, intervalGen, widthGen)) {
      case (ps, ivs, w) =>
        val pts = ps.zipWithIndex.map { case (p, i) => (i.toLong, p) }
          .toDF("p_id", "p")
        val iv = ivs.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
          .toDF("iv_id", "s", "e")
        val got = Joins.rangeJoinPoints(pts, "p", iv, "s", "e", w)
          .select("p_id", "iv_id").as[(Long, Long)].collect().sorted.toList
        val naive = pts.join(iv, $"p" >= $"s" && $"p" <= $"e")
          .select("p_id", "iv_id").as[(Long, Long)].collect().sorted.toList
        assert(got == naive, s"width=$w")
    }
  }

  test("rangeJoinIntervals == naive overlap join, no duplicate pairs") {
    forAllSeeded(Gen.zip(intervalGen, intervalGen, widthGen)) {
      case (ls, rs, w) =>
        val l = ls.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
          .toDF("l_id", "ls", "le")
        val r = rs.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
          .toDF("r_id", "rs", "re")
        val got = Joins.rangeJoinIntervals(l, "ls", "le", r, "rs", "re", w)
          .select("l_id", "r_id").as[(Long, Long)].collect().toList
        val naive = l.filter($"le" >= $"ls")
          .join(r.filter($"re" >= $"rs"), $"ls" <= $"re" && $"rs" <= $"le")
          .select("l_id", "r_id").as[(Long, Long)].collect().toList
        assert(got.sorted == naive.sorted, s"width=$w")
        assert(got.distinct.size == got.size, s"dup pairs at width=$w")
    }
  }

  private val docGen = Gen.nonEmptyListOf(
    Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" ")))

  test("packTokens: exact tiling + equality with the naive global window") {
    forAllSeeded(docGen) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val rows = TextAnalysis.packTokens(df, "doc_id", "text",
          capacity = 7, bucketSize = 3)
        .orderBy("doc_id").select("n_tokens", "start_tok")
        .as[(Long, Long)].collect()
      assert(rows.head._2 == 0L)
      rows.sliding(2).foreach {
        case Array((n, s0), (_, s1)) => assert(s0 + n == s1)
        case _ =>
      }
    }
  }

  test("Snapshot.diff: diff(x, x) is empty; every mutation class detected") {
    forAllSeeded(Gen.nonEmptyListOf(Gen.zip(
      Gen.choose(0L, 30L), Gen.alphaStr.map(_.take(4))))) { kvs0 =>
      val kvs = kvs0.distinctBy(_._1)
      val df = kvs.toDF("k", "v")
      assert(Snapshot.diff(df, df, Seq("k")).count() == 0)
      // mutate: drop the first key, change the second's value (if present)
      val dropped = kvs.head._1
      val changed = kvs.drop(1).headOption.map(_._1)
      val mutated = kvs.collect {
        case (k, v) if k != dropped =>
          (k, if (changed.contains(k)) v + "!" else v)
      } :+ (1000L, "new")
      val d = Snapshot.diff(df, mutated.toDF("k", "v"), Seq("k"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(d(dropped) == "removed" && d(1000L) == "added")
      changed.foreach(k => assert(d(k) == "changed"))
    }
  }

  test("sparseCosinePairs == naive TF-IDF cosine over all shared-gram pairs " +
    "(minCos=0 so threshold flake can't hide membership bugs)") {
    forAllSeeded(docGen, n = 3) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = docs.toDF("doc_id", "text")
      val maxF = docs.size // guard wide open: every gram retained
      val got = Dedup.sparseCosinePairs(df, "doc_id", "text",
        shingleSize = 2, maxDocFreq = maxF, minCos = 0.0)
        .select("doc_a", "doc_b", "cos").as[(Long, Long, Double)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      // naive reference: explicit TF vectors, same weighting
      def grams(t: String): Seq[String] = {
        val ts = t.split(" ").toSeq
        if (ts.size < 2) Seq(ts.mkString(" "))
        else ts.sliding(2).map(_.mkString(" ")).toSeq
      }
      val tf = docs.map { case (id, t) =>
        id -> grams(t).groupBy(identity).view.mapValues(_.size).toMap }.toMap
      val dfreq = tf.values.flatMap(_.keys).groupBy(identity)
        .view.mapValues(_.size).toMap
      val n = docs.size.toDouble
      val w = tf.view.mapValues(_.map { case (g, c) =>
        g -> c * math.log(n / dfreq(g)) }).toMap
      def nrm(v: Map[String, Double]) = math.sqrt(v.values.map(x => x * x).sum)
      val naive = (for {
        (a, wa) <- w.toSeq; (b, wb) <- w.toSeq if a < b
        shared = wa.keySet & wb.keySet if shared.nonEmpty
      } yield (a, b) ->
        shared.toSeq.map(g => wa(g) * wb(g)).sum / (nrm(wa) * nrm(wb))).toMap
      assert(got.keySet == naive.keySet)
      // operator output is rounded to 4 decimals; allow the half-ulp of
      // that quantization plus float-sum noise
      naive.foreach { case (k, v) =>
        assert(math.abs(got(k) - v) < 5.01e-5, s"pair $k: ${got(k)} vs $v") }
    }
  }

  test("scrubPii is idempotent: scrubbing clean output changes nothing") {
    val piiGen = Gen.listOf(Gen.oneOf(
      "plain", "words", "a@b.co", "x.y@mail.example.org", "1234567",
      "12345", "https://host.example/p/q", "http://a.b/c?d=1", "@", "999"))
      .map(_.mkString(" "))
    forAllSeeded(Gen.nonEmptyListOf(piiGen), n = 4) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val once = TextAnalysis.scrubPii(df, "doc_id", "text")
      val twice = TextAnalysis.scrubPii(
        once.select(col("doc_id"), col("clean_text").as("text")),
        "doc_id", "text")
      val a = once.select("doc_id", "clean_text")
        .as[(Long, String)].collect().sortBy(_._1)
      val b = twice.select("doc_id", "clean_text")
        .as[(Long, String)].collect().sortBy(_._1)
      assert(a.sameElements(b))
      assert(twice.agg(sum(col("n_urls") + col("n_emails") + col("n_ids")))
        .collect()(0).getLong(0) == 0L, "second pass must replace nothing")
    }
  }

  test("canonicalPerCluster: canonical is a max-quality member; " +
    "n_members partitions the input") {
    val clusterGen = Gen.nonEmptyListOf(Gen.zip(
      Gen.choose(0L, 5L), Gen.choose(0L, 50L))) // (label, quality)
    forAllSeeded(clusterGen, n = 4) { rows =>
      val members = rows.zipWithIndex.map { case ((lab, q), i) =>
        (i.toLong, lab, q) }
      val comp = members.map { case (id, lab, _) => (id, lab) }
        .toDF("id", "label")
      val quality = members.map { case (id, _, q) => (id, q) }
        .toDF("doc_id", "quality")
      val got = Dedup.canonicalPerCluster(comp, quality, "doc_id", "quality")
        .select("cluster_id", "canonical_id", "quality", "n_members")
        .as[(Long, Long, Long, Long)].collect()
      val byLabel = members.groupBy(_._2)
      assert(got.length == byLabel.size)
      got.foreach { case (lab, canon, q, nm) =>
        val cluster = byLabel(lab)
        assert(nm == cluster.size)
        val maxQ = cluster.map(_._3).max
        assert(q == maxQ)
        // id ASC tie-break among max-quality members
        assert(canon == cluster.filter(_._3 == maxQ).map(_._1).min)
      }
      assert(got.map(_._4).sum == members.size)
    }
  }

  test("weightedTopKPerGroup: k per group, members only, and heavy rows " +
    "win far more often than light ones over many disjoint draws") {
    // 200 groups of 20 rows; one row per group has 50x weight. Its
    // expected inclusion rate at k=1 is 50/(50+19) ~ 0.72 vs ~0.014 for
    // any light row; assert the observed rate is between.
    val rows = for (g <- 0 until 200; i <- 0 until 20)
      yield (g.toLong * 100 + i, g.toLong, if (i == 0) 50.0 else 1.0)
    val df = rows.toDF("id", "grp", "w")
    val picked = Sampling.weightedTopKPerGroup(df, Seq("grp"), "id",
      col("w"), k = 1).select("id", "grp").as[(Long, Long)].collect()
    assert(picked.length == 200)
    assert(picked.forall { case (id, g) => id / 100 == g })
    val heavyWins = picked.count { case (id, _) => id % 100 == 0 }
    assert(heavyWins > 100 && heavyWins < 190,
      s"heavy row won $heavyWins/200 — expected ~144 (rate 50/69)")
  }

  test("weightedTopKPerGroup == exact JVM replay of the E-S priorities") {
    forAllSeeded(Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 3L),
      Gen.choose(0L, 10000L))), n = 3) { rows =>
      val data = rows.distinct
      val df = data.toDF("grp", "id")
      val es = Sampling.weightedTopKPerGroup(df, Seq("grp"), "id",
        lit(1.0), 3).select("grp", "id").as[(Long, Long)].collect()
        .sorted.toList
      def prio(id: Long): Double = {
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(id.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(8)
        val v = java.lang.Long.parseLong(hex, 16)
        -math.log((v.toDouble + 1.0) / 4294967296.0)
      }
      val expected = data.groupBy(_._1).toList.flatMap { case (g, ms) =>
        ms.map(_._2).sortBy(id => (prio(id), id)).take(3).map(g -> _)
      }.sorted
      assert(es == expected)
    }
  }

  test("temperatureBySource: alpha=1 == the natural uniform rate; alpha=0 " +
    "equalizes shares with the min(1,·) cap; kept set partition-invariant") {
    // 3 sources, 800/100/50 rows — the skewed-corpus shape temperature fixes
    val rows = (0 until 800).map(i => (i.toLong, "head")) ++
      (800 until 900).map(i => (i.toLong, "mid")) ++
      (900 until 950).map(i => (i.toLong, "tail"))
    val df = rows.toDF("id", "src")
    // alpha=1: rate collapses to budget/total for EVERY source (the N^1
    // cancels), i.e. exactly weightedByHash's uniform draw at 190/950 —
    // both sides divide exact-integer doubles, so the rates are the same
    // double and the kept sets must be identical, not just close
    val nat = Sampling.temperatureBySource(df, "id", "src", 1.0, 190L)
      .select("id").as[Long].collect().sorted.toList
    val uni = Sampling.weightedByHash(df, "id", lit(190.0 / 950.0))
      .select("id").as[Long].collect().sorted.toList
    assert(nat == uni)
    // alpha=0: per-source budget 150/3 = 50 rows; the 50-row tail computes
    // rate 50/50 = 1 (cap branch, kept whole), head keeps at 50/800
    val eq = Sampling.temperatureBySource(df, "id", "src", 0.0, 150L)
      .select("id", "src").as[(Long, String)].collect()
    val bySrc = eq.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc("tail") == 50, s"tail rate must cap at 1: $bySrc")
    assert(bySrc("head") > 25 && bySrc("head") < 80, s"head ~50: $bySrc")
    assert(bySrc("mid") > 25 && bySrc("mid") < 80, s"mid ~50: $bySrc")
    // md5-draw determinism: the kept set is a pure function of the data
    val again = Sampling.temperatureBySource(df.repartition(13), "id", "src",
      0.0, 150L).select("id").as[Long].collect().sorted.toList
    assert(again == eq.map(_._1).sorted.toList)
  }

  test("bloomSemiJoin == semiJoin on random key sets") {
    forAllSeeded(Gen.zip(Gen.nonEmptyListOf(Gen.choose(0L, 1000L)),
      Gen.nonEmptyListOf(Gen.choose(0L, 1000L)))) { case (fs, ds) =>
      val fact = fs.zipWithIndex.map { case (k, i) => (i.toLong, k) }
        .toDF("row_id", "k")
      val dim = ds.distinct.toDF("k")
      val got = Joins.bloomSemiJoin(fact, dim, Seq("k"), 2000, 16384)
        .select("row_id").as[Long].collect().sorted.toList
      val exact = Joins.semiJoin(fact, dim, Seq("k"))
        .select("row_id").as[Long].collect().sorted.toList
      assert(got == exact)
    }
  }

  test("autoCellCount: expected cell size is flat (within one cell of the " +
    "target) across corpus sizes, and auto semanticDedup matches an " +
    "explicit call at the derived count") {
    val target = Dedup.semanticDedupTargetCellSize
    Seq(1L, 100L, 1999L, 2000L, 2001L, 50000L, 1234567L, 10_000_000_000L)
      .foreach { n =>
        val k = Dedup.autoCellCount(n)
        assert(k >= 1, s"n=$n")
        val expCell = n.toDouble / k
        // ceil(n/target) cells ⇒ E|cell| in (target/2, target] once the
        // corpus spans 2+ cells; below one target-full the single cell
        // just holds everything
        assert(expCell <= target, s"n=$n k=$k expCell=$expCell")
        if (n > target) assert(expCell > target / 2.0,
          s"n=$n k=$k expCell=$expCell")
      }
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val auto = Dedup.semanticDedup(emb, "vec_id", "embedding",
        threshold = 0.35)
      .select("vec_id", "cent_id", "kept")
      .as[(Long, Long, Boolean)].collect().sorted.toList
    val explicit = Dedup.semanticDedup(emb, "vec_id", "embedding",
        nCentroids = Dedup.autoCellCount(emb.count()), threshold = 0.35)
      .select("vec_id", "cent_id", "kept")
      .as[(Long, Long, Boolean)].collect().sorted.toList
    assert(auto == explicit && auto.nonEmpty)
  }

  test("quantizeInt8: reconstruction error bounded by scale/2 + half-ulp; " +
    "zero vector quantizes to zeros with scale 0") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val q = Similarity.quantizeInt8(emb, "vec_id", "embedding")
    // |x - round(x/s)*s| <= s/2 whenever no clamp engages; the max-abs
    // element maps to exactly ±127 so the clamp never cuts a true value
    assert(q.filter(col("max_err") > col("scale") / 2 + lit(1e-9))
      .count() == 0)
    assert(q.filter(col("scale") <= 0).count() == 0)
    val zero = Seq((1L, Seq.fill(8)(0.0f))).toDF("vec_id", "embedding")
    val zq = Similarity.quantizeInt8(zero, "vec_id", "embedding")
      .as[(Long, Double, Seq[Int], Double)].collect().head
    assert(zq._2 == 0.0 && zq._3.forall(_ == 0) && zq._4 == 0.0)
  }

  test("rrfFuse is rank-only: a strictly monotone score transform leaves " +
    "the fusion unchanged, and fusing a run with itself preserves the " +
    "run's own order") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val bf = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      k = 10, stride = 100)
    val lsh = Similarity.lshTopK(emb, "vec_id", "embedding",
      k = 10, nBits = 16, dim = 64, queryStride = 100)
    val order = Seq(col("cos").desc, col("cand_id").asc)
    def fused(runs: Seq[org.apache.spark.sql.DataFrame]) =
      Similarity.rrfFuse(runs, "query_id", "cand_id", order, k = 5)
        .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val base = fused(Seq(bf, lsh))
    assert(base.nonEmpty)
    // exp(3x) is strictly increasing and injective: identical ranks,
    // identical fusion — no score magnitude ever crosses into the result
    val warp = (d: org.apache.spark.sql.DataFrame) =>
      d.withColumn("cos", exp(col("cos") * 3))
    assert(fused(Seq(warp(bf), warp(lsh))) == base)
    // self-fusion: every pair scores 2/(60+rank), so the fused top-5 IS
    // the run's own top-5 in the run's own order
    val self = Similarity.rrfFuse(Seq(bf, bf), "query_id", "cand_id",
        order, k = 5)
      .select(col("query_id"), col("cand_id"), col("rrf"))
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(-_._3).map(_._2).toSeq).toMap
    val own = Windows.topKPerGroup(bf, Seq(col("query_id")), order, 5)
      .select(col("query_id"), col("cand_id"), col("cos"))
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(r => (-r._3, r._2)).map(_._2).toSeq).toMap
    assert(self == own)
  }

  test("native Int8Vec expressions are bit-equal to the built-ins-only " +
    "quantization reference on the corpus") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("scale"),
          concat_ws(",", col("q")), col("max_err"))
        .as[(Long, Double, String, Double)].collect().sortBy(_._1).toSeq
    assert(rows(Similarity.quantizeInt8(emb, "vec_id", "embedding")) ==
      rows(Similarity.quantizeInt8Hof(emb, "vec_id", "embedding")))
  }

  test("funnelTrace windowed: the gap boundary is INCLUSIVE (ts == prev " +
    "+ gap converts; one second past does not), and the plain trace is " +
    "the gap-infinity limit") {
    val ev = Seq(
      (1L, "view", "2024-01-01 00:00:00"),
      (1L, "click", "2024-01-01 01:00:00"),   // within 1h: boundary-exact
      (2L, "view", "2024-01-01 00:00:00"),
      (2L, "click", "2024-01-01 01:00:01"),   // one second past: drops
      (3L, "view", "2024-01-01 00:00:00")     // never clicks
    ).toDF("user_id", "event_type", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s")))
    def trace(gap: Option[Long]) =
      Events.funnelTrace(ev, "user_id", "ts", "event_type",
          Seq("view", "click"), maxGapSeconds = gap)
        .select("user_id", "step_idx").as[(Long, Long)].collect().toSet
    assert(trace(Some(3600L)) ==
      Set((1L, 1L), (2L, 1L), (3L, 1L), (1L, 2L)))
    assert(trace(None) ==
      Set((1L, 1L), (2L, 1L), (3L, 1L), (1L, 2L), (2L, 2L)))
  }

  test("poissonBootstrap: B rows, constant column reproduces the " +
    "constant exactly, replicate means bracket the true mean, " +
    "partitioning-invariant") {
    val df = (1L to 400L).map(i => (i, (i % 7).toDouble + 1.0))
      .toDF("k", "v")
    val boot = Sampling.poissonBootstrap(df, "k", "v", replicates = 50)
      .as[(Long, Double)].collect().toMap
    assert(boot.size == 50 && boot.keySet == (0L to 49L).toSet)
    // the weighted mean of a CONSTANT column is that constant for every
    // replicate — num/den cancels exactly in cents
    val const = Sampling.poissonBootstrap(
        df.withColumn("v", lit(3.25)), "k", "v", replicates = 10)
      .as[(Long, Double)].collect()
    assert(const.forall(_._2 == 3.25), const.mkString(","))
    // statistical sanity, deterministic by construction: the true mean
    // sits inside the replicate range (400 rows, spread ~2 -> the 50
    // fixed md5 draws bracket it comfortably)
    val truth = df.agg(avg(col("v"))).as[Double].collect()(0)
    assert(boot.values.min <= truth && truth <= boot.values.max,
      s"truth $truth outside [${boot.values.min}, ${boot.values.max}]")
    val boot13 = Sampling.poissonBootstrap(df.repartition(13), "k", "v",
      replicates = 50).as[(Long, Double)].collect().toMap
    assert(boot13 == boot)
  }

  test("pqTopK: k results per query, non-negative integer ADC, and " +
    "recall@5 vs the exact L2 brute force at the q127 params") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val pq = Similarity.pqTopK(emb, "vec_id", "embedding",
      m = 8, k = 64, trainIters = 3, topK = 5, queryStride = 100)
      .as[(Long, Long, Long)].collect()
    assert(pq.length == 25, s"expected 5 queries x 5, got ${pq.length}")
    assert(pq.forall(_._3 >= 0L), "ADC distances must be non-negative")
    // exact L2 brute top-5 baseline (computed with independent HOF ops)
    val base = emb.select(col("vec_id").as("cand_id"),
      col("embedding").cast("array<double>").as("v"))
    val q = base.filter(col("cand_id") % 100 === 0)
      .select(col("cand_id").as("query_id"), col("v").as("qv"))
    val l2 = aggregate(zip_with(col("qv"), col("v"),
      (x, y) => (x - y) * (x - y)), lit(0.0d), (a, x) => a + x)
    val exact = Windows.topKPerGroup(
        base.join(broadcast(q), col("cand_id") =!= col("query_id"))
          .select(col("query_id"), col("cand_id"), l2.as("d")),
        Seq(col("query_id")), Seq(col("d").asc, col("cand_id").asc), 5)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val got = pq.map(r => (r._1, r._2)).toSet
    // PQ is lossy by design (8 bytes/vector), and the ISOTROPIC
    // synthetic embeddings are its worst case (no cluster structure for
    // the codebooks to exploit): measured recall@5 = 0.52 at these
    // params (0.32 at k=16 — the codebook-size knob works). Gate at a
    // floor well under measurement so only a real quantization/ADC
    // regression trips it, not corpus-regeneration drift.
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.3, s"pq recall@5 = $recall")
  }

  test("ivfPqTopK: nProbe = nCentroids (exhaustive probing) degenerates " +
    "to the global pqTopK result; routed recall lower-bounds nothing " +
    "but stays a large fraction of it at the q129 params") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("query_id"), col("cand_id")).as[(Long, Long)]
        .collect().toSet
    val global = pairs(Similarity.pqTopK(emb, "vec_id", "embedding",
      m = 8, k = 64, trainIters = 3, topK = 5, queryStride = 100))
    val exhaustive = pairs(Similarity.ivfPqTopK(emb, "vec_id", "embedding",
      m = 8, k = 64, trainIters = 3, nCentroids = 16, nProbe = 16,
      topK = 5, queryStride = 100))
    assert(exhaustive == global,
      "probing every cell must equal the unrouted ADC scan")
    val routed = pairs(Similarity.ivfPqTopK(emb, "vec_id", "embedding",
      m = 8, k = 64, trainIters = 3, nCentroids = 16, nProbe = 2,
      topK = 5, queryStride = 100))
    assert(routed.size == 25)
    // on the ISOTROPIC corpus cosine cells are weakly informative by
    // construction: nProbe=2 of 16 covers ~1/8 of the corpus, so a
    // ROUTING-BLIND sample would land ~12% overlap with the global ADC
    // top-5 — measured routed overlap is 0.24, about 2x that (the
    // routing earns its keep even here; clustered real corpora sit far
    // higher). Gate above the blind-coverage floor so a router that
    // stops routing (or probes the wrong cells) trips it.
    val overlap = (routed & global).size.toDouble / global.size
    assert(overlap >= 0.15, s"ivfpq overlap with global ADC = $overlap")
  }

  test("int8RerankTopK: recall@5 vs the exact brute force at the q105 " +
    "params, and candK = N-1 degenerates to the exact result") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("query_id"), col("cand_id")).as[(Long, Long)]
        .collect().toSet
    val exact = pairs(Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      k = 5, stride = 100))
    val tiered = pairs(Similarity.int8RerankTopK(emb, "vec_id", "embedding",
      k = 5, candK = 20, queryStride = 100))
    assert(exact.size == 25 && tiered.size == 25)
    // measured: 25/25 at candK=20 on this corpus (int8 over 64 dims
    // preserves cosine order far beyond the top-5 margin); gate at >= 0.8
    // so a quantization-order regression shows without pinning corpus
    // regeneration drift
    val recall = (exact & tiered).size.toDouble / exact.size
    assert(recall >= 0.8, s"two-tier recall@5 = $recall")
    // full candidate list = exact re-rank of everything = brute force
    val full = pairs(Similarity.int8RerankTopK(emb, "vec_id", "embedding",
      k = 5, candK = 499, queryStride = 100))
    assert(full == exact, "candK = N-1 must equal the exact brute force")
  }

  test("semanticLeakageCellRouted: per-id hits lower-bound brute, no " +
    "false-positive leaked flags, nProbe = nCentroids degenerates to the " +
    "exact brute relation, and recall at the q100 params is the measured " +
    "0.84 band") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val isEval = pmod(col("vec_id"), lit(97)) === 1
    def toMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.select(col("vec_id"), col("n_eval_hits"))
        .as[(Long, Long)].collect().toMap
    val brute = toMap(Dedup.semanticLeakage(emb, "vec_id", "embedding",
      isEval, threshold = 0.25))
    val routed = toMap(Dedup.semanticLeakageCellRouted(emb, "vec_id",
      "embedding", isEval, threshold = 0.25, nCentroids = 16, nProbe = 8,
      trainIters = 2))
    assert(routed.keySet == brute.keySet,
      "routed must emit one row per non-eval vector, zero-hit rows included")
    // lower bound per id ⇒ leaked never false-positives
    routed.foreach { case (id, n) =>
      assert(n <= brute(id), s"id=$id routed=$n brute=${brute(id)}")
    }
    // recall at the pinned q100 params (threshold 0.25 sits near the
    // cosine noise floor of this synthetic corpus — the HARD routing
    // case; real paraphrase leaks at >= 0.8 route together far more
    // reliably): measured 40/69 at nProbe=4, 58/69 at nProbe=8 (0.841),
    // 69/69 at nProbe=16. Gate at >= 0.8 so a routing regression shows.
    val bruteLeaked = brute.count(_._2 > 0)
    val routedLeaked = routed.count { case (id, n) => n > 0 }
    assert(bruteLeaked > 0, "corpus lost its leaked pairs — regen drift?")
    assert(routedLeaked.toDouble / bruteLeaked >= 0.8,
      s"recall ${routedLeaked.toDouble / bruteLeaked} below the 0.84 band")
    // exactness at full probe: every pair meets, the relation IS brute
    val full = toMap(Dedup.semanticLeakageCellRouted(emb, "vec_id",
      "embedding", isEval, threshold = 0.25, nCentroids = 16, nProbe = 16,
      trainIters = 2))
    assert(full == brute, "nProbe = nCentroids must equal brute exactly")
  }

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("pmiCollocations == naive JVM PMI on random word docs; minCount " +
    "drops rare pairs") {
    val words = Vector("a", "b", "c", "d", "e")
    val docGen = Gen.listOfN(12, Gen.oneOf(words)).map(_.mkString(" "))
    forAllSeeded(Gen.listOfN(20, docGen), n = 3) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val toks = texts.map(_.split(" ").toSeq)
      val uni = toks.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val t = toks.map(_.size).sum.toLong
      val bi = toks.flatMap(ts => ts.zip(ts.drop(1)))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val btot = bi.values.sum
      for (minCount <- Seq(1L, 3L)) {
        val expected = bi.collect {
          case ((p, w), c2) if c2 >= minCount =>
            ((p, w), (c2, round4(math.log(
              (c2.toDouble * t * t) / (btot.toDouble * uni(p) * uni(w))))))
        }.toMap
        val got = TextAnalysis.pmiCollocations(docs, "doc_id", "text", minCount)
          .as[(String, String, Long, Double)].collect()
          .map { case (p, w, c2, pmi) => ((p, w), (c2, pmi)) }.toMap
        assert(got == expected, s"minCount=$minCount")
      }
    }
  }

  test("dsirWeights: target-model-preferred docs keep; target-OOV " +
    "tokens score AGAINST the target (symmetric Laplace smoothing); " +
    "JVM replay matches at round-4") {
    // target vocabulary is {x, z}; the raw pool adds y-heavy docs
    val docs = Seq(
      (0L, "x x z x", "tgt"), (1L, "z x z z", "tgt"),
      (2L, "x z x z", "pool"), (3L, "y y y y", "pool"),
      (4L, "x y z y", "pool")
    ).toDF("doc_id", "text", "kind")
    val got = TextAnalysis.dsirWeights(docs, "doc_id", "text",
        col("kind") === "tgt")
      .as[(Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // JVM replay with the same add-one formula over the pool vocab
    val all = Seq("x x z x", "z x z z", "x z x z", "y y y y", "x y z y")
      .map(_.split(" ").toSeq)
    val tgtToks = all.take(2).flatten
    val cRaw = all.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cTgt = tgtToks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (tRaw, tTgt) = (all.flatten.size.toLong, tgtToks.size.toLong)
    val v = cRaw.size.toLong
    def lr(tok: String): Double =
      math.log((cTgt.getOrElse(tok, 0L) + 1L).toDouble / (tTgt + v)) -
        math.log((cRaw(tok) + 1L).toDouble / (tRaw + v))
    all.zipWithIndex.foreach { case (ts, i) =>
      val mean = round4(ts.map(lr).sum / ts.size)
      val (_, n, avg, keep) = got(i.toLong)
      assert(n == ts.size && avg == mean && keep == (mean > 0), s"doc $i")
    }
    // the target-language docs score positive, the y-only doc negative
    assert(got(0L)._4 && got(1L)._4 && !got(3L)._4)
  }

  test("lastTouchAttribution: latest strictly-preceding touch wins, " +
    "organic conversions keep NULL, same-instant ties break on ordCol, " +
    "users are isolated") {
    val ev = Seq(
      (1L, 1L, "2024-01-01 08:00:00", "purchase"), // organic: no prior click
      (1L, 2L, "2024-01-01 09:00:00", "click"),
      (1L, 3L, "2024-01-01 09:30:00", "click"),    // the LATEST touch
      (1L, 4L, "2024-01-01 10:00:00", "purchase"), // -> 3
      (1L, 5L, "2024-01-01 11:00:00", "click"),
      (1L, 6L, "2024-01-01 11:00:00", "purchase"), // same instant: 5 < 6 -> 5
      (1L, 7L, "2024-01-01 12:00:00", "view"),     // non-touch type ignored
      (2L, 8L, "2024-01-01 09:00:00", "purchase")  // other user: no leak
    ).toDF("user_id", "event_id", "ts_s", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val got = Events.lastTouchAttribution(ev, "user_id", "ts", "event_id",
        "event_type", "click", "purchase")
      .as[(Long, Long, Option[Long])].collect().toSet
    assert(got == Set((1L, 1L, None), (1L, 4L, Some(3L)),
      (1L, 6L, Some(5L)), (2L, 8L, None)))
  }

  test("scd2History: runs collapse to change points with correct " +
    "intervals; nulls drop without splitting a run; ties break on ordCol") {
    val ev = Seq(
      (1L, 1L, "2024-01-01 00:00:01", Option(5L)),
      (1L, 2L, "2024-01-01 00:00:02", Option(5L)),   // same value: no row
      (1L, 3L, "2024-01-01 00:00:03", Option(7L)),   // change
      (1L, 4L, "2024-01-01 00:00:04", Option.empty[Long]), // null: ignored
      (1L, 5L, "2024-01-01 00:00:05", Option(7L)),   // run CONTINUES over null
      (1L, 6L, "2024-01-01 00:00:06", Option(5L)),   // change back
      (2L, 7L, "2024-01-01 00:00:01", Option(9L))    // singleton user
    ).toDF("user_id", "event_id", "ts_s", "k")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val got = Events.scd2History(ev, "user_id", "ts", "event_id", col("k"))
      .select(col("user_id"), col("attr"),
        unix_timestamp(col("valid_from")).as("f"),
        unix_timestamp(col("valid_to")).as("t"), col("is_current"))
      .as[(Long, Long, Long, Option[Long], Boolean)].collect().toSet
    val base = got.map(_._3).min - 1 // epoch of 00:00:00
    assert(got == Set(
      (1L, 5L, base + 1, Some(base + 3), false),
      (1L, 7L, base + 3, Some(base + 6), false),
      (1L, 5L, base + 6, None, true),
      (2L, 9L, base + 1, None, true)), got)
  }

  test("rollingAnomalies: hand-computed spike flags at 3/2 sigma; stable " +
    "runs, cold starts and expired windows stay quiet; ts ties are " +
    "frame-symmetric") {
    val ev = Seq(
      // one group, 5 stable cents then a spike, all inside one hour
      (1L, "a", "2024-01-01 10:00:00", 1.00),
      (2L, "a", "2024-01-01 10:05:00", 1.00),
      (3L, "a", "2024-01-01 10:10:00", 1.00),
      (4L, "a", "2024-01-01 10:15:00", 1.00),
      (5L, "a", "2024-01-01 10:20:00", 1.00),
      (6L, "a", "2024-01-01 10:25:00", 100.00), // the spike
      (7L, "a", "2024-01-01 13:00:00", 100.00), // window expired: n=1
      // ts tie group: both rows share the instant and see each other
      (8L, "b", "2024-01-01 10:00:00", 1.00),
      (9L, "b", "2024-01-01 10:00:00", 2.00)
    ).toDF("event_id", "event_type", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val got = Events.rollingAnomalies(ev, "event_type", "ts", "value",
        windowSeconds = 3600L, sigmaNum = 3L, sigmaDen = 2L, minEvents = 5L)
      .select(col("event_id"), col("n_window"), col("is_anomaly"))
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    // cold start (n < 5) never flags
    (1L to 4L).foreach(i => assert(got(i) == ((i, i, false)), s"event $i"))
    // 5th stable event: n = 5 but variance 0 -> 0 > 0 is false
    assert(got(5L) == ((5L, 5L, false)))
    // the spike: n=6, x=10000, s1=10500, s2=100050000 ->
    // 4*(49500)^2 = 9.801e9 > 9*(490050000) = 4.4105e9
    assert(got(6L) == ((6L, 6L, true)))
    // window expired: alone in its frame
    assert(got(7L) == ((7L, 1L, false)))
    // tie symmetry: both instant-sharing rows count each other (n = 2)
    assert(got(8L)._2 == 2L && got(9L)._2 == 2L)
    assert(!got(8L)._3 && !got(9L)._3)
  }

  test("jaccardPairsPrefix == jaccardPairs on random word docs at " +
    "several thresholds (algorithm equivalence incl. exact-multiple " +
    "prefix lengths)") {
    val words = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val docGen = for {
      len <- Gen.choose(3, 9)
      ws <- Gen.listOfN(len, Gen.oneOf(words))
    } yield ws.mkString(" ")
    forAllSeeded(Gen.listOfN(25, docGen), n = 3) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      // 4/5 hits exact ceil multiples (the float-ceil trap); 1/2 and 3/10
      // exercise low-threshold long prefixes
      for ((tn, td) <- Seq((4L, 5L), (1L, 2L), (3L, 10L))) {
        val full = Dedup.jaccardPairs(docs, "doc_id", "text",
            shingleSize = 2, threshold = tn.toDouble / td)
          .as[(Long, Long, Double)].collect().toSet
        val pre = Dedup.jaccardPairsPrefix(docs, "doc_id", "text",
            shingleSize = 2, tNum = tn, tDen = td)
          .as[(Long, Long, Double)].collect().toSet
        assert(pre == full, s"t=$tn/$td missing=${full -- pre} " +
          s"extra=${pre -- full}")
      }
    }
  }

  test("looTargetEncode: exact JVM replay (cents arithmetic); " +
    "singletons encode null; own target never leaks into the feature") {
    val df = Seq(
      (1L, "a", 1.00), (2L, "a", 2.00), (3L, "a", 6.00),
      (4L, "b", 5.50), (5L, "b", 4.50),
      (6L, "c", 9.99) // singleton
    ).toDF("event_id", "event_type", "value")
    val got = Events.looTargetEncode(df, "event_type", "value",
        Seq("event_id"))
      .as[(Long, String, Option[Double])].collect()
      .map(r => r._1 -> r._3).toMap
    // category a sums to 9.00: each row's loo = (9 - own)/2, exact
    assert(got(1L).contains(4.0) && got(2L).contains(3.5) &&
      got(3L).contains(1.5))
    assert(got(4L).contains(4.5) && got(5L).contains(5.5))
    assert(got(6L).isEmpty, "singleton category must encode null")
  }

  test("kaplanMeier: hand-computed curve — censoring holds survival up, " +
    "risk sets shrink correctly, exhausted risk set gives surv 0") {
    val ev = Seq(
      (1L, "signup", "2024-01-01 00:00:00"),
      (1L, "purchase", "2024-01-02 00:30:00"),  // dur 1, observed
      (2L, "signup", "2024-01-01 00:00:00"),
      (2L, "purchase", "2024-01-04 00:00:00"),  // dur 3, observed
      (3L, "signup", "2024-01-01 00:00:00"),    // censored at horizon: dur 3
      (4L, "purchase", "2024-01-01 06:00:00"),  // purchase BEFORE signup
      (4L, "signup", "2024-01-02 00:00:00")     // -> censored, dur 2
    ).toDF("user_id", "event_type", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val got = Events.kaplanMeier(ev, "user_id", "ts", "event_type",
        "signup", "purchase")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 4L, 1L, 0.75), (2L, 3L, 0L, 0.75),
      (3L, 2L, 1L, 0.375)), got)
    // exhausted risk set: a lone converting user ends at surv = 0 exactly
    val one = Seq((1L, "signup", "2024-01-01 00:00:00"),
      (1L, "purchase", "2024-01-02 00:00:00"))
      .toDF("user_id", "event_type", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val g1 = Events.kaplanMeier(one, "user_id", "ts", "event_type",
        "signup", "purchase")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(g1 == Seq((1L, 1L, 1L, 0.0)), g1)
  }

  test("sequenceSupport: strictly-before exists semantics; (a,a) counts " +
    "repeats only") {
    val ev = Seq(
      (1L, "A", "2024-01-01 01:00:00"), (1L, "B", "2024-01-01 02:00:00"),
      (2L, "B", "2024-01-01 01:00:00"), (2L, "A", "2024-01-01 02:00:00"),
      (2L, "B", "2024-01-01 03:00:00")
    ).toDF("user_id", "event_type", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val got = Events.sequenceSupport(ev, "user_id", "ts", "event_type")
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == Map(("A", "B") -> 2L, ("B", "A") -> 1L,
      ("B", "B") -> 1L), got)
  }

  test("funnel: in-order completion only — pre-step events, skipped " +
    "steps and same-instant pairs don't convert") {
    val ev = Seq(
      (1L, "view", "2024-01-01 10:00:00"),  // u1 completes all three
      (1L, "click", "2024-01-01 10:01:00"),
      (1L, "purchase", "2024-01-01 10:02:00"),
      (2L, "click", "2024-01-01 09:00:00"), // click BEFORE view: no credit
      (2L, "view", "2024-01-01 10:00:00"),
      (3L, "view", "2024-01-01 10:00:00"),  // skips click entirely
      (3L, "purchase", "2024-01-01 11:00:00"),
      (4L, "purchase", "2024-01-01 10:00:00"), // never enters the funnel
      (5L, "view", "2024-01-01 10:00:00"),  // same instant: strict > fails
      (5L, "click", "2024-01-01 10:00:00")
    ).toDF("user_id", "event_type", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val got = Events.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set((1L, "view", 4L), (2L, "click", 1L),
      (3L, "purchase", 1L)), got)
  }

  test("retentionCohorts: hand-built two-cohort log — gaps leave holes, " +
    "returns re-count, week 0 counts every cohort member once") {
    // weeks (Mondays): 2024-01-01, -08, -15
    val ev = Seq(
      (1L, "2024-01-02 10:00:00"), (1L, "2024-01-03 10:00:00"), // u1 w0 twice
      (1L, "2024-01-16 10:00:00"),                              // u1 skips w1, returns w2
      (2L, "2024-01-04 10:00:00"), (2L, "2024-01-09 10:00:00"), // u2 w0, w1
      (3L, "2024-01-10 10:00:00")                               // u3 cohort week2 (Jan 8)
    ).toDF("user_id", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val got = Events.retentionCohorts(ev, "user_id", "ts")
      .select(col("cohort_week").cast("string"), col("week_offset"),
        col("n_active"))
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(
      ("2024-01-01", 0L, 2L),  // u1 + u2 (u1's two events collapse)
      ("2024-01-01", 1L, 1L),  // u2 only — u1's gap leaves a hole
      ("2024-01-01", 2L, 1L),  // u1 returns
      ("2024-01-08", 0L, 1L)), got) // u3's own cohort
  }

  test("neymanAllocation == exact JVM integer replay; constant strata " +
    "earn 0; alloc caps at stratum size") {
    val g = Gen.listOfN(60, for {
      s <- Gen.oneOf("a", "b", "c", "d")
      v <- Gen.choose(0L, 500L)
    } yield (s, v))
    forAllSeeded(g, n = 4) { rows =>
      // force one constant stratum (w = 0) and one tiny stratum (cap)
      val data = rows ++ Seq(("const", 7L), ("const", 7L), ("tiny", 400L))
      val df = data.zipWithIndex
        .map { case ((s, v), i) => (i.toLong, s, v) }
        .toDF("id", "lang", "n_chars")
      val budget = 40L
      val got = Sampling.neymanAllocation(df, "lang", "n_chars", budget)
        .as[(String, Long, Long, Long)].collect()
        .map(r => r._1 -> r).toMap
      val byS = data.groupBy(_._1)
      val w = byS.view.mapValues { vs =>
        val n = vs.size.toLong
        val s1 = vs.map(_._2).sum
        val s2 = vs.map(v => v._2 * v._2).sum
        (n, math.sqrt((n * s2 - s1 * s1).toDouble).toLong)
      }.toMap
      val tw = w.values.map(_._2).sum
      w.foreach { case (s, (n, wh)) =>
        val alloc = if (tw == 0) 0L else math.min(n, budget * wh / tw)
        assert(got(s) == ((s, n, wh, alloc)), s"stratum $s")
      }
      assert(got("const")._4 == 0L)
    }
  }

  test("linearAttribution: equal split with remainder to LAST touch, " +
    "touches bind to their NEXT conversion only, trailing touches and " +
    "organic conversions emit nothing, same-instant click binds") {
    val ev = Seq(
      (1L, 1L, "2024-01-01 09:00:00", "click"),
      (1L, 2L, "2024-01-01 09:30:00", "click"),
      (1L, 3L, "2024-01-01 09:45:00", "click"),
      (1L, 4L, "2024-01-01 10:00:00", "purchase"), // 3 touches: 1e6 div 3
      (1L, 5L, "2024-01-01 11:00:00", "click"),
      (1L, 6L, "2024-01-01 12:00:00", "purchase"), // 1 touch: full credit
      (1L, 7L, "2024-01-01 13:00:00", "click"),    // no later conv: dropped
      (2L, 8L, "2024-01-01 09:00:00", "purchase"), // organic: no touch rows
      (3L, 9L, "2024-01-01 09:00:00", "click"),    // same instant, 9 < 10:
      (3L, 10L, "2024-01-01 09:00:00", "purchase") //   click binds
    ).toDF("user_id", "event_id", "ts_s", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val got = Events.linearAttribution(ev, "user_id", "ts", "event_id",
        "event_type", "click", "purchase")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 4L, 1L, 333333L), (1L, 4L, 2L, 333333L), (1L, 4L, 3L, 333334L),
      (1L, 6L, 5L, 1000000L),
      (3L, 10L, 9L, 1000000L)))
    // per-conversion credit sums to exactly 1e6 — the integer-split
    // invariant the remainder-to-last rule exists for
    got.toSeq.groupBy(r => (r._1, r._2)).foreach { case (_, rs) =>
      assert(rs.map(_._4).sum == 1000000L)
    }
  }

  test("applyCdc: last-write-wins by seq, deletes remove, inserts appear, " +
    "untouched base passes through, delete-of-absent-key is a no-op, and " +
    "an empty batch is identity") {
    val base = Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c"),
      (4L, 40L, "d"), (5L, 50L, "e")).toDF("k", "v", "s")
    val changes = Seq(
      (2L, 21L, "b1", 1L, "U"), (2L, 22L, "b2", 2L, "U"), // seq 2 wins
      (3L, 0L, "x", 1L, "D"),                             // delete
      (6L, 60L, "f", 1L, "U"),                            // insert
      (4L, 0L, "x", 1L, "D"), (4L, 41L, "d1", 2L, "U"),   // U after D: upsert
      (7L, 0L, "x", 1L, "D")                              // absent key: no-op
    ).toDF("k", "v", "s", "seq", "op")
    val got = Snapshot.applyCdc(base, changes, Seq("k"), "seq", "op")
      .as[(Long, Long, String, String)].collect().toSet
    assert(got == Set(
      (1L, 10L, "a", "base"), (5L, 50L, "e", "base"),
      (2L, 22L, "b2", "cdc"), (4L, 41L, "d1", "cdc"),
      (6L, 60L, "f", "cdc")))
    val empty = changes.filter(col("k") < 0)
    val id = Snapshot.applyCdc(base, empty, Seq("k"), "seq", "op")
      .as[(Long, Long, String, String)].collect().toSet
    assert(id == base.as[(Long, Long, String)].collect()
      .map(r => (r._1, r._2, r._3, "base")).toSet)
  }

  test("pointInTimeJoin: half-open containment — boundary facts take the " +
    "STARTING interval, pre-history and no-history facts keep nulls") {
    val hist = Seq(
      (1L, "A", "2024-01-01 10:00:00", Option("2024-01-01 12:00:00")),
      (1L, "B", "2024-01-01 12:00:00", Option.empty[String])
    ).toDF("user_id", "attr", "from_s", "to_s")
      .select(col("user_id"), col("attr"),
        to_timestamp(col("from_s")).as("valid_from"),
        to_timestamp(col("to_s")).as("valid_to"))
    val facts = Seq(
      (1L, 1L, "2024-01-01 09:00:00"), // before first version -> null
      (1L, 2L, "2024-01-01 10:00:00"), // inclusive start -> A
      (1L, 3L, "2024-01-01 11:00:00"), // inside -> A
      (1L, 4L, "2024-01-01 12:00:00"), // change instant: exclusive end -> B
      (1L, 5L, "2024-01-01 13:00:00"), // open current -> B
      (2L, 6L, "2024-01-01 10:00:00")  // keyless-history user -> null
    ).toDF("user_id", "fact_id", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val got = Events.pointInTimeJoin(facts, hist, Seq("user_id"), "ts")
      .select(col("fact_id"), col("attr"))
      .as[(Long, Option[String])].collect().toMap
    assert(got == Map(1L -> None, 2L -> Some("A"), 3L -> Some("A"),
      4L -> Some("B"), 5L -> Some("B"), 6L -> None))
  }

  test("madOutliers: MAD fences hand-checked — zero-MAD group flags any " +
    "deviation, spread group stays quiet, the fence itself is NOT an " +
    "outlier (strict >)") {
    val ev = Seq(
      // constant group with one wild row: mad = 0, so dev 99 > 0 flags
      (1L, "a", 1.0), (2L, "a", 1.0), (3L, "a", 1.0), (4L, "a", 1.0),
      (5L, "a", 100.0),
      // spread group: med 20, mad 10, fence 30 — devs 10/0/10 quiet
      (6L, "b", 10.0), (7L, "b", 20.0), (8L, "b", 30.0),
      // boundary group: med 10, devs {10, 0, 30}, mad 10; dev 30 == 3*mad
      (9L, "c", 0.0), (10L, "c", 10.0), (11L, "c", 40.0)
    ).toDF("event_id", "event_type", "value")
    val got = Events.madOutliers(ev, "event_type", "event_id", "value")
      .select(col("event_id"), col("is_outlier"))
      .as[(Long, Boolean)].collect().toMap
    assert(got.filter(_._2).keySet == Set(5L))
    assert(got.size == 11)
  }

  test("winnowing: a shared w+k-1 token run GUARANTEES a shared " +
    "fingerprint; disjoint-vocab docs share nothing; short docs take the " +
    "whole-text branch; selection is partition-invariant") {
    val k = 3; val w = 10
    val common = (1 to (w + k - 1)).map(i => s"c$i").mkString(" ") // 12 toks
    val docA = ((1 to 20).map(i => s"a$i") :+ common) ++ (21 to 40).map(i => s"a$i")
    val docB = ((1 to 20).map(i => s"b$i") :+ common) ++ (21 to 40).map(i => s"b$i")
    val docC = (1 to 40).map(i => s"x$i") // disjoint vocabulary
    val docs = Seq((1L, docA.mkString(" ")), (2L, docB.mkString(" ")),
      (3L, docC.mkString(" ")), (4L, "tiny doc")).toDF("doc_id", "text")
    val pairs = TextAnalysis
      .winnowedOverlapPairs(docs, "doc_id", "text", k, w, minShared = 1L)
      .as[(Long, Long, Long)].collect().map(p => (p._1, p._2)).toSet
    assert(pairs.contains((1L, 2L)), s"guarantee violated: $pairs")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
    // short doc: whole text is the single gram -> exactly one fingerprint
    val fps = TextAnalysis.winnowedFingerprints(docs, "doc_id", "text", k, w)
    assert(fps.filter(col("doc_id") === 4L).count() == 1L)
    // density: far fewer fingerprints than positions, never zero
    val n1 = fps.filter(col("doc_id") === 1L).count()
    assert(n1 > 0 && n1 < docA.length)
    // pure function of the data: partitioning cannot change selection
    val re = TextAnalysis.winnowedFingerprints(
      docs.repartition(7), "doc_id", "text", k, w)
      .as[(Long, Long)].collect().toSet
    assert(re == fps.as[(Long, Long)].collect().toSet)
  }

  test("vocabKlDrift: hand-computed smoothed contributions; identical " +
    "corpora drift to exactly +0.0 everywhere") {
    val oldC = Seq((1L, "a a b")).toDF("doc_id", "text")
    val newC = Seq((2L, "a b b c")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabKlDrift(oldC, newC, "text")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // V=3, N_old=3, N_new=4
    def contrib(cn: Long, co: Long): Double = {
      val p = (cn + 1.0) / (4 + 3)
      val q = (co + 1.0) / (3 + 3)
      BigDecimal(p * math.log(p / q))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    }
    assert(got == Map(
      "a" -> (2L, 1L, contrib(1, 2)),
      "b" -> (1L, 2L, contrib(2, 1)),
      "c" -> (0L, 1L, contrib(1, 0))))
    // p == q term-by-term when the corpora are identical: ln 1 = 0, and
    // the +0.0 canonicalization keeps the sign positive
    val same = TextAnalysis.vocabKlDrift(oldC, oldC, "text")
      .as[(String, Long, Long, Double)].collect()
    assert(same.forall(r => r._4 == 0.0 &&
      !(1.0 / r._4).isNegInfinity)) // not -0.0
  }

  test("theilSenTrend: the outlier day moves 4 of 10 pairwise slopes but " +
    "not the median — robust slope stays the clean trend") {
    // days 0..4 with counts 10,12,14,16,100 (perfect +2/day, then a spike)
    val counts = Seq(0 -> 10, 1 -> 12, 2 -> 14, 3 -> 16, 4 -> 100)
    val ev = counts.toDF("d", "y")
      .select(expr("explode(sequence(1, y))").as("i"), col("d"))
      .select(lit("a").as("event_type"),
        (to_timestamp(lit("2024-01-01 00:00:00")) +
          make_dt_interval(col("d"))).as("ts"))
    val got = Events.theilSenTrend(ev, "event_type", "ts")
      .as[(String, Long, Double)].collect().head
    assert(got == (("a", 10L, 2.0)), got)
  }

  test("benfordDigits: integer-cents digit extraction, non-positives " +
    "excluded, hand-computed chi2 terms") {
    val df = Seq(("g", 1.00), ("g", 1.50), ("g", 2.00), ("g", 9.99),
      ("g", 0.50), ("g", -3.0), ("g", 0.0)).toDF("grp", "v")
    val got = DataQuality.benfordDigits(df, "grp", "v")
      .as[(String, Int, Long, Double, Double)].collect()
      .map(r => r._2 -> (r._3, r._4, r._5)).toMap
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def exp(d: Int) = 5 * math.log10(1.0 + 1.0 / d)
    def chi(o: Long, d: Int) = r4((o - exp(d)) * (o - exp(d)) / exp(d))
    // cents: 100->1, 150->1, 200->2, 999->9, 50->5; -3 and 0 excluded
    assert(got == Map(
      1 -> (2L, r4(exp(1)), chi(2, 1)),
      2 -> (1L, r4(exp(2)), chi(1, 2)),
      5 -> (1L, r4(exp(5)), chi(1, 5)),
      9 -> (1L, r4(exp(9)), chi(1, 9))), got)
  }

  test("maintainAgg: removed/changed/added keys adjust exactly, untouched " +
    "groups ride the base aggregate, emptied groups drop — and the " +
    "incremental result equals the full recompute") {
    val oldV = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L),
      (5L, "c", 5L)).toDF("k", "g", "cents")
    val newV = Seq((2L, "a", 25L), (3L, "b", 30L), (4L, "b", 40L))
      .toDF("k", "g", "cents") // 1 removed, 2 changed, 3 untouched, 4 added, c emptied
    val got = Snapshot.maintainAgg(oldV, newV, Seq("k"), "g", "cents")
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("a", 1L, 25L), ("b", 2L, 70L)))
    val full = newV.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"))
      .as[(String, Long, Long)].collect().toSet
    assert(got == full)
  }

  test("jlProjected: coordinates equal the left-associated plane-dot fold " +
    "replayed in Scala, all outDim rows per vector") {
    val vec = Array.tabulate(64)(i => (i % 7 - 3).toDouble / 4.0)
    val df = Seq((1L, vec)).toDF("vec_id", "embedding")
    val got = Similarity.jlProjected(df, "vec_id", "embedding",
        outDim = 16, dim = 64)
      .as[(Long, Int, Double)].collect().map(r => r._2 -> r._3).toMap
    assert(got.size == 16)
    val planes = Similarity.hyperplanes(16, 64)
    planes.zipWithIndex.foreach { case (p, j) =>
      var acc = 0.0
      var i = 0
      while (i < 64) { acc += vec(i) * p(i); i += 1 }
      val want = BigDecimal(acc)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
      assert(got(j) == want, s"dim $j")
    }
  }

  test("cuped: perfectly pre-correlated users adjust to a CONSTANT metric " +
    "(theta = 2 exactly, variance fully explained)") {
    // (x, y) cents: (100,200) (200,400) (300,600) — y = 2x, so theta = 2
    // and y_adj = y - 2(x - 200) = 400 for every user
    val ev = Seq(
      (1L, "2024-01-01 00:00:00", 1.00), (1L, "2024-02-01 00:00:00", 2.00),
      (2L, "2024-01-01 00:00:00", 2.00), (2L, "2024-02-01 00:00:00", 4.00),
      (3L, "2024-01-01 00:00:00", 3.00), (3L, "2024-02-01 00:00:00", 6.00)
    ).toDF("user_id", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val got = Events.cuped(ev, "user_id", "ts", "value",
        "2024-01-15 00:00:00")
      .as[(Long, Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(got.forall(r => r._4 == 2.0 && r._5 == 400.0), got.toSeq)
    assert(got.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((1L, 100L, 200L), (2L, 200L, 400L), (3L, 300L, 600L)))
  }

  test("weightedMedian: weight mass moves the median where row-median " +
    "would not; lower-median convention on even splits") {
    val df = Seq(("g", 10L, 1L), ("g", 20L, 1L), ("g", 30L, 10L),
      ("h", 1L, 1L), ("h", 2L, 1L)).toDF("grp", "v", "w")
    val got = Windows.weightedMedian(df, "grp", "v", "w")
      .as[(String, Long)].collect().toMap
    // g: total 12, cum(10)=1 cum(20)=2 cum(30)=12 -> first 2cum>=tot is 30
    // h: total 2, cum(1)=1 -> 2*1>=2 -> lower median 1
    assert(got == Map("g" -> 30L, "h" -> 1L))
  }

  test("knnClassify: majority label wins; vote ties break to the " +
    "smallest label") {
    val labeled = Seq(
      (1L, Array(1.0, 0.0), 0L), (2L, Array(0.9, 0.1), 0L),
      (3L, Array(0.0, 1.0), 1L), (4L, Array(0.1, 0.9), 1L)
    ).toDF("id", "vec", "label")
    val q1 = Seq((10L, Array(1.0, 0.05))).toDF("id", "vec")
    val got1 = Similarity.knnClassify(labeled, q1, k = 3)
      .as[(Long, Long, Long)].collect().head
    assert(got1 == ((10L, 0L, 2L)), got1) // two label-0 neighbors of 3
    // equidistant query, k=2: one vote each -> smallest label wins
    val q2 = Seq((11L, Array(1.0, 1.0))).toDF("id", "vec")
    val got2 = Similarity.knnClassify(
      Seq((1L, Array(1.0, 0.0), 0L), (2L, Array(0.0, 1.0), 1L))
        .toDF("id", "vec", "label"), q2, k = 2)
      .as[(Long, Long, Long)].collect().head
    assert(got2 == ((11L, 0L, 1L)), got2)
  }

  test("rfmSegments: distinct-metric users land one per quintile with " +
    "the documented orderings (R asc-better, F/M desc-better)") {
    val ev = (1 to 5).map { u =>
      (u.toLong, s"2024-01-0$u 00:00:00", "purchase", u.toDouble)
    }.toDF("user_id", "ts_s", "event_type", "value")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val got = Events.rfmSegments(ev, "user_id", "ts", "value",
        "purchase", "event_type")
      .as[(Long, Long, Long, Long, Long, Long, Long, String)]
      .collect().sortBy(_._1)
    (1 to 5).foreach { u =>
      val r = got(u - 1)
      // recency: user 5 bought last (0 days ago) -> best r_score 1
      assert(r == ((u.toLong, (5 - u).toLong, 1L, u * 100L,
        (6 - u).toLong, u.toLong, (6 - u).toLong,
        s"${6 - u}$u${6 - u}")), s"user $u: $r")
    }
  }

  test("markovTransitions: integer-micros row-normalized transition " +
    "counts over the per-user total order") {
    val ev = Seq(
      (1L, 1L, "view"), (1L, 2L, "click"), (1L, 3L, "purchase"),
      (1L, 4L, "click"),
      (2L, 5L, "view"), (2L, 6L, "view")
    ).map { case (u, i, t) => (u, i, s"2024-01-01 00:0$i:00", t) }
      .toDF("user_id", "event_id", "ts_s", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val got = Events.markovTransitions(ev, "user_id", "ts", "event_id",
        "event_type")
      .as[(String, String, Long, Long)].collect().toSet
    assert(got == Set(
      ("view", "click", 1L, 500000L), ("view", "view", 1L, 500000L),
      ("click", "purchase", 1L, 1000000L),
      ("purchase", "click", 1L, 1000000L)))
  }

  test("giniConcentration: equality scores 0, one-entity dominance " +
    "scores (n-1)/n in micros") {
    val ev = (
      (1 to 5).map(u => ("eq", u.toLong, 1.00)) ++
      (1 to 4).map(u => ("dom", u.toLong, 0.00)) :+ (("dom", 5L, 1.00))
    ).toDF("event_type", "user_id", "value")
    val got = Events.giniConcentration(ev, "event_type", "user_id", "value")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got == Map(
      "eq" -> (5L, 500L, 0L),
      "dom" -> (5L, 100L, 800000L))) // (n-1)/n = 0.8
  }

  test("dailyAutocorrelation: an alternating series scores r = -1/+1/-1 " +
    "at lags 1/2/3; a constant series yields NULL r (zero variance)") {
    // 6 days alternating 1,3,1,3,1,3 events; plus a constant-2 group
    def events(tp: String, counts: Seq[Int]) =
      counts.zipWithIndex.flatMap { case (c, d) =>
        (1 to c).map(i => (tp, f"2024-01-${d + 1}%02d 0$i:00:00"))
      }
    val ev = (events("alt", Seq(1, 3, 1, 3, 1, 3)) ++
      events("const", Seq(2, 2, 2, 2)))
      .toDF("event_type", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val got = Events.dailyAutocorrelation(ev, "event_type", "ts", maxLag = 3)
      .as[(String, Int, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got(("alt", 1)) == ((5L, Some(-1.0))))
    assert(got(("alt", 2)) == ((4L, Some(1.0))))
    assert(got(("alt", 3)) == ((3L, Some(-1.0))))
    (1 to 3).foreach(l => assert(got(("const", l))._2.isEmpty, s"lag $l"))
  }

  test("lorenzDeciles: one-user deciles give exact integer cumulative " +
    "shares ending at 1e6, monotone") {
    val ev = (1 to 10).map(u => ("t", u.toLong, u.toDouble))
      .toDF("event_type", "user_id", "value")
    val got = Events.lorenzDeciles(ev, "event_type", "user_id", "value")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._2)
    assert(got.length == 10)
    val total = 5500L // cents of 1..10 dollars
    (1 to 10).foreach { d =>
      val cum = (1 to d).map(_ * 100L).sum
      assert(got(d - 1) == (("t", d.toLong, 1L, d * 100L,
        cum * 1000000L / total)), s"decile $d")
    }
    assert(got.last._5 == 1000000L)
  }

  test("chi2Independence: perfectly proportional tables score exactly " +
    "zero in every cell; a skewed cell scores the hand formula") {
    val indep = (
      Seq.fill(10)(("x", "p")) ++ Seq.fill(20)(("x", "q")) ++
      Seq.fill(30)(("y", "p")) ++ Seq.fill(60)(("y", "q"))
    ).toDF("a", "b")
    val got = DataQuality.chi2Independence(indep, "a", "b")
      .as[(String, String, Long, Double, Double)].collect()
    assert(got.length == 4 && got.forall(_._5 == 0.0), got.toSeq)
    // dependent: diagonal-heavy 2x2 — check one cell by hand
    val dep = (Seq.fill(30)(("x", "p")) ++ Seq.fill(10)(("x", "q")) ++
      Seq.fill(10)(("y", "p")) ++ Seq.fill(30)(("y", "q"))).toDF("a", "b")
    val cell = DataQuality.chi2Independence(dep, "a", "b")
      .filter(col("a") === "x" && col("b") === "p")
      .as[(String, String, Long, Double, Double)].collect().head
    // expected = 40*40/80 = 20; chi2 = (30-20)^2/20 = 5
    assert(cell._4 == 20.0 && cell._5 == 5.0, cell)
  }

  test("coPairs: support counts baskets not rows (duplicate lines dedupe), " +
    "minSupport prunes, integer lift hand-checked") {
    val rows = Seq(
      (1L, "a"), (1L, "a"), (1L, "b"), (1L, "c"), // dup (1,a) collapses
      (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "d"),
      (4L, "b"), (4L, "c")
    ).toDF("bk", "it")
    val got = Baskets.coPairs(rows, "bk", "it", minSupport = 2L)
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // n=4 baskets; s(a)=3 s(b)=3 s(c)=2; (a,c) support 1 pruned
    assert(got == Map(
      ("a", "b") -> (2L, 2L * 4 * 1000000L / 9),
      ("b", "c") -> (2L, 2L * 4 * 1000000L / 6)))
  }

  test("resolveEntities: transitive closure chains pairwise matches past " +
    "the blocking radius; non-matching records stay singleton entities") {
    // aaaa—aaab (dist 1), aaab—aabb (dist 1): one entity even though
    // dist(aaaa, aabb) = 2 > maxDist 1. zzzz matches nothing.
    val recs = Seq((10L, "aaaa"), (11L, "aaab"), (12L, "aabb"),
      (13L, "zzzz")).toDF("id", "s")
    val got = Dedup.resolveEntities(recs, "id", "s", maxDist = 1)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 13L))
  }

  test("frequentSequences: user-distinct support (a user repeating a " +
    "path counts once), minSupport prunes, bigrams+trigrams from one " +
    "ordered stream") {
    val ev = Seq(
      // user 1: a b a b -> bigrams a>b (x2, counts once), b>a; trigrams
      (1L, 1L, 1L, "a"), (1L, 2L, 2L, "b"), (1L, 3L, 3L, "a"),
      (1L, 4L, 4L, "b"),
      // user 2: a b c
      (2L, 1L, 5L, "a"), (2L, 2L, 6L, "b"), (2L, 3L, 7L, "c"),
    ).toDF("user_id", "ts_s", "event_id", "event_type")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val got = graft.ops.Events.frequentSequences(ev, "user_id", "ts",
        "event_id", "event_type", maxLen = 3, minSupport = 2L)
      .as[(Long, String, Long)].collect().toSet
    // only a>b is shared by both users; everything else has support 1
    assert(got == Set((2L, "a>b", 2L)))
  }

  test("dailyTrend: exact slope/intercept on a hand series; " +
    "single-day groups emit NULL") {
    val ev = Seq(
      // g: counts 1,2,3 on consecutive days -> slope 1 exactly
      (1L, "2024-01-01 00:00:00", "g"),
      (2L, "2024-01-02 00:00:00", "g"), (3L, "2024-01-02 01:00:00", "g"),
      (4L, "2024-01-03 00:00:00", "g"), (5L, "2024-01-03 01:00:00", "g"),
      (6L, "2024-01-03 02:00:00", "g"),
      // h: one day only
      (7L, "2024-01-01 00:00:00", "h"),
    ).toDF("event_id", "ts_s", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val got = graft.ops.Events.dailyTrend(ev, "event_type", "ts")
      .select("event_type", "n_days", "slope")
      .as[(String, Long, Option[Double])].collect()
      .map { case (t, n, s) => t -> ((n, s)) }.toMap
    assert(got("g") == (3L, Some(1.0)))
    assert(got("h") == (1L, None))
  }

  test("blockBootstrap: a constant daily series bootstraps to exactly " +
    "its constant mean in every replicate; means of a varying series " +
    "stay inside [min, max] and the replicate count is exact") {
    // group g: 10 days x 3 events/day (constant) -> every replicate
    // mean is exactly 3.0 regardless of which blocks were drawn
    val const = (0 until 10).flatMap(d => (0 until 3).map(i =>
      (d * 3L + i, s"2024-01-${"%02d".format(d + 1)} 0$i:00:00", "g")))
    val vary = (0 until 10).flatMap(d => (0 to d % 4).map(i =>
      (1000L + d * 10 + i, s"2024-02-${"%02d".format(d + 1)} 0$i:00:00",
        "h")))
    val ev = (const ++ vary).toDF("event_id", "ts_s", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val got = graft.ops.Sampling.blockBootstrap(ev, "event_type", "ts",
        blockLen = 3, replicates = 20)
      .as[(String, Long, Double)].collect()
    assert(got.count(_._1 == "g") == 20 && got.count(_._1 == "h") == 20)
    assert(got.filter(_._1 == "g").forall(_._3 == 3.0),
      "constant series must bootstrap to its constant")
    // h's daily counts are 1..4 -> every block-resampled mean in [1, 4]
    assert(got.filter(_._1 == "h").forall(r => r._3 >= 1.0 && r._3 <= 4.0))
  }

  test("sourceOverlap: exact pairwise Jaccard over distinct " +
    "fingerprints; within-source duplicates collapse; disjoint pairs " +
    "are absent") {
    val docs = Seq(
      ("a", "x x"), ("a", "x"), // same fp after distinct-token sort!
      ("a", "y"), ("b", "x"), ("b", "z"), ("c", "w"),
    ).toDF("source", "text")
    val got = graft.ops.Dedup.sourceOverlap(docs, "source",
        graft.ops.TextAnalysis.contentFingerprint(col("text")))
      .select("source_a", "source_b", "n_a", "n_b", "n_common",
        "jaccard_micros")
      .as[(String, String, Long, Long, Long, Long)].collect().toSet
    // a = {fp(x), fp(y)} (the "x x" doc collapses with "x"), b =
    // {fp(x), fp(z)}: intersection 1, union 3 -> 333333 micros; c
    // shares nothing -> absent
    assert(got == Set(("a", "b", 2L, 2L, 1L, 333333L)))
  }

  test("ksAgainstRest: disjoint supports give KS = 1, identical " +
    "distributions give KS = 0, and a hand case matches the exact " +
    "step-function maximum") {
    import graft.ops.DataQuality
    // a={1,2}, b={10,20}: disjoint -> D=1 for both vs rest
    val disjoint = Seq(("a", 1L), ("a", 2L), ("b", 10L), ("b", 20L))
      .toDF("g", "v")
    val d1 = DataQuality.ksAgainstRest(disjoint, "g", "v")
      .select("grp", "ks").as[(String, Double)].collect().toMap
    assert(d1 == Map("a" -> 1.0, "b" -> 1.0))
    // identical distributions -> D=0
    val same = Seq(("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L))
      .toDF("g", "v")
    val d2 = DataQuality.ksAgainstRest(same, "g", "v")
      .select("grp", "ks").as[(String, Double)].collect().toMap
    assert(d2 == Map("a" -> 0.0, "b" -> 0.0))
    // hand case: a={1,3}, rest={2,4}: F_a-F_rest steps are
    // +1/2 at 1, 0 at 2, +1/2 at 3, 0 at 4 -> D = 0.5
    val hand = Seq(("a", 1L), ("a", 3L), ("b", 2L), ("b", 4L))
      .toDF("g", "v")
    val d3 = DataQuality.ksAgainstRest(hand, "g", "v")
      .select("grp", "ks").as[(String, Double)].collect().toMap
    assert(d3 == Map("a" -> 0.5, "b" -> 0.5))
  }

  test("bpeTrain: hand corpus — (a,a) merges first by weighted count, " +
    "then (a,b</w>), then the two fused symbols; equal-symbol runs " +
    "merge leftmost-greedily (aaab -> [aa, a, b</w>])") {
    import graft.ops.TextAnalysis
    val docs = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrain(docs, "text", merges = 3)
      .orderBy("step")
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "a", "a", 4L),
      (2L, "a", "b</w>", 3L),
      (3L, "aa", "ab</w>", 2L)), got)
  }

  test("bpeTrain: even-length equal-symbol run pairs up without " +
    "overlap, and count ties break lexicographically on (lhs, rhs)") {
    import graft.ops.TextAnalysis
    // aaaa -> [a,a,a,a</w>]; round 1 merges (a,a) count 2 (positions
    // 1-2 only: position 2 is consumed, position 3's next is a</w>),
    // leaving [aa, a, a</w>]; round 2 ties (aa,a) vs (a,a</w>) at 1,
    // lexicographic lhs picks (a, a</w>)
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrain(docs, "text", merges = 3)
      .orderBy("step")
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "a", "a", 2L),
      (2L, "a", "a</w>", 1L),
      (3L, "aa", "aa</w>", 1L)), got)
  }

  test("bpeEncode: applies EVERY learned merge (including the last) — " +
    "3 merges collapse aaab to one token; fewer merges tokenize " +
    "coarser, and the per-doc card rolls up by occurrence") {
    import graft.ops.TextAnalysis
    // same corpus as the bpeTrain hand test: merges learned are
    // (a,a), (a,b</w>), (aa,ab</w>); applying all three:
    //   aaab -> [aa,a,b</w>] -> [aa,ab</w>] -> [aaab</w>]  (1 token)
    //   ab   -> [a,b</w>]    -> [ab</w>]                   (1 token)
    val docs = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    val got3 = TextAnalysis.bpeEncode(docs, "doc_id", "text", merges = 3)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got3 == Seq((1L, 3L, 10L, 3L, 300000L)), got3)
    // merges=1 applies only (a,a): aaab -> [aa,a,b</w>] (3 tokens),
    // ab stays [a,b</w>] (2) -> 3+3+2 = 8 tokens over 10 chars
    val got1 = TextAnalysis.bpeEncode(docs, "doc_id", "text", merges = 1)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got1 == Seq((1L, 3L, 10L, 8L, 800000L)), got1)
  }

  test("activityStreaks: islands break on dark days, repeats within a " +
    "day don't extend a streak, and current is the run holding the " +
    "LAST active day even when a longer one came earlier") {
    import graft.ops.Events
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")
    // u1: d1,d2,d3 (streak 3) then d5,d5-dup (streak 1): longest 3,
    // current 1; u2: single day
    val rows = Seq((1L, ts(1)), (1L, ts(2)), (1L, ts(3)), (1L, ts(5)),
      (1L, ts(5)), (2L, ts(9))).toDF("user_id", "ts")
    val got = Events.activityStreaks(rows, "user_id", "ts")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 4L, 2L, 3L, 1L)), got(1L))
    assert(got(2L) == ((2L, 1L, 1L, 1L, 1L)), got(2L))
  }

  test("nelsonAalen: hand cohort — hazard terms are exact e/n_risk " +
    "micros, the cumulative sum is pure integer, censored users hold " +
    "the risk set, and a saturated last day stays finite (unlike KM)") {
    import graft.ops.Events
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")
    // 3 users sign up d1; u1 converts d2 (dur 1), u2 converts d3
    // (dur 2), u3 never (censored at horizon d3 -> dur 2)
    val rows = Seq(
      (1L, "signup", ts(1)), (2L, "signup", ts(1)), (3L, "signup", ts(1)),
      (1L, "purchase", ts(2)), (2L, "purchase", ts(3)))
      .toDF("user_id", "event_type", "ts")
    val got = Events.nelsonAalen(rows, "user_id", "ts", "event_type",
        "signup", "purchase")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // d=1: 1 event / 3 at risk -> 333333; d=2: 1 event / 2 at risk
    // (u2 event + u3 censored share the day) -> 500000; cum 833333
    assert(got == Seq((1L, 3L, 1L, 333333L, 333333L),
      (2L, 2L, 1L, 500000L, 833333L)), got)
  }

  test("twap: readings weigh by holding time (last extends to " +
    "midnight), the long-division micros are exact, and a same-second " +
    "tie contributes a zero-length segment") {
    import graft.ops.Events
    def ts(s: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $s")
    val rows = Seq(
      ("a", 1L, ts("00:00:00"), 1.0), ("a", 2L, ts("00:00:10"), 2.0),
      ("b", 3L, ts("00:00:00"), 1.0), ("b", 4L, ts("00:00:00"), 3.0))
      .toDF("event_type", "event_id", "ts", "value")
    val got = Events.twap(rows, "event_type", "ts", "event_id", "value")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    // a: (100c*10s + 200c*86390s)/86400s -> 199 full + exact remainder
    assert(got("a") == ((2L,
      199L * 1000000L + 85400L * 1000000L / 86400L)), got("a"))
    // b: id 3's segment is zero-length; id 4 holds the whole day
    assert(got("b") == ((2L, 300000000L)), got("b"))
  }

  test("stickiness: a user active on many days counts ONCE in MAU, " +
    "the trailing window slides off old users, and only active days " +
    "appear") {
    import graft.ops.Events
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")
    // windowDays=3: u1 active d1,d2,d3; u2 active d1 only; d5 has u3
    val rows = Seq((1L, ts(1)), (1L, ts(2)), (1L, ts(3)), (1L, ts(3)),
      (2L, ts(1)), (3L, ts(5))).toDF("user_id", "ts")
    val got = Events.stickiness(rows, "user_id", "ts", windowDays = 3)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val day = (d: Int) => java.time.LocalDate.of(2024, 1, d).toEpochDay
    assert(got(day(1)) == ((2L, 2L, 1000000L)), got)     // u1,u2
    assert(got(day(2)) == ((1L, 2L, 500000L)), got)      // mau {u1,u2}
    assert(got(day(3)) == ((1L, 2L, 500000L)), got)      // u2 in window
    assert(got(day(5)) == ((1L, 2L, 500000L)), got)      // {u1@d3, u3}
    assert(!got.contains(day(4)), "dark day must be absent")
  }

  test("silhouetteCard: a point on its centroid scores 1e6, an " +
    "equidistant point scores 0 (never NaN), per-cell means floor " +
    "sign-symmetrically") {
    import graft.ops.Similarity
    val emb = Seq(
      (1L, Array(0.0, 0.0)), (2L, Array(10.0, 0.0)), // seeded centroids
      (3L, Array(1.0, 0.0)), (4L, Array(5.0, 0.0))   // member, midpoint
    ).toDF("vec_id", "embedding")
    val got = Similarity.silhouetteCard(emb, "vec_id", "embedding",
        nCentroids = 2, dim = 2)
      .as[(Long, Long, Long, Long)].collect().toSet
    // cell 1: s = {1e6 (on centroid), 987654 (near), 0 (midpoint tie)}
    assert(got == Set((1L, 3L, 662551L, 8666666L),
      (2L, 1L, 1000000L, 0L)), got)
  }

  test("hardNegatives: the NEAREST same-label vector never appears — " +
    "the top negative is the closest DIFFERENT-label one; anchors are " +
    "the strided ids only") {
    import graft.ops.Similarity
    // anchor 0 (label A, (1,0)); 1=(0.99,0.1) label A (nearest overall,
    // excluded); 2=(0.9,0.3) label B (top negative); 3=(0,1) label B
    val emb = Seq(
      (0L, Array(1.0, 0.0)), (1L, Array(0.99, 0.1)),
      (2L, Array(0.9, 0.3)), (3L, Array(0.0, 1.0))
    ).toDF("vec_id", "embedding")
    val labels = Seq((0L, "A"), (1L, "A"), (2L, "B"), (3L, "B"))
      .toDF("doc_id", "lang")
    val got = Similarity.hardNegatives(emb, labels, "vec_id",
        "embedding", stride = 10L, k = 2)
      .select("query_id", "cand_id")
      .as[(Long, Long)].collect().toSeq.sorted
    assert(got == Seq((0L, 2L), (0L, 3L)), got)
  }

  test("burstiness: a metronome scores -1 exactly... up to the zero-" +
    "variance NULL guard; equal-gap users score below a bursty user; " +
    "too-few-events users drop") {
    import graft.ops.Events
    def ts(sec: Long) =
      new java.sql.Timestamp(1704067200000L + sec * 1000L)
    val rows =
      // metronome: gaps 10,10,10,10 -> variance 0 -> B = -1.0
      (0 to 4).map(i => (1L, i.toLong, ts(i * 10L))) ++
      // bursty: gaps 1,1,1,97 -> B well above the metronome
      Seq((2L, 10L, ts(0)), (2L, 11L, ts(1)), (2L, 12L, ts(2)),
        (2L, 13L, ts(3)), (2L, 14L, ts(100))) ++
      // only 3 events (2 gaps) -> dropped at minEvents = 5
      Seq((3L, 20L, ts(0)), (3L, 21L, ts(5)), (3L, 22L, ts(9)))
    val got = Events.burstiness(
        rows.toDF("user_id", "event_id", "ts"), "user_id", "ts")
      .as[(Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r._3).toMap
    assert(got(1L).contains(-1.0), got.get(1L))
    assert(got(2L).exists(b => b > -1.0 && b < 1.0), got.get(2L))
    assert(!got.contains(3L), got.keys)
  }

  test("intervalConcurrency: sweep peaks where three windows overlap, " +
    "an exclusive end never overlaps a same-instant start, and " +
    "peak_at is the FIRST peak instant") {
    import graft.ops.Events
    def ts(s: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $s")
    // dur 60s: events at :00, :30, :50 -> 3 concurrent at :50..:59;
    // an event exactly at :00+60 (:01:00) starts as the first ENDS ->
    // never 4. Group "b": two disjoint events -> peak 1 at the first.
    val rows = Seq(
      ("a", ts("00:00:00")), ("a", ts("00:00:30")), ("a", ts("00:00:50")),
      ("a", ts("00:01:00")),
      ("b", ts("00:00:00")), ("b", ts("00:10:00")))
      .toDF("event_type", "ts")
    val got = Events.intervalConcurrency(rows, "event_type", "ts",
        durationSeconds = 60L)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val epoch = (s: String) =>
      ts(s).toInstant.getEpochSecond
    assert(got("a") == ((3L, epoch("00:00:50"))), got("a"))
    assert(got("b") == ((1L, epoch("00:00:00"))), got("b"))
  }

  test("forecastBacktest: hand series — naive scores every day with a " +
    "predecessor, seasonal-naive only past day 7, MAE/MAPE are exact " +
    "floor-micros") {
    import graft.ops.Events
    // 9 days of counts: 2,4,2,4,2,4,2,4,3
    val counts = Seq(2, 4, 2, 4, 2, 4, 2, 4, 3)
    val rows = counts.zipWithIndex.flatMap { case (c, i) =>
      Seq.fill(c)(("g",
        java.sql.Timestamp.valueOf(f"2024-01-${i + 1}%02d 00:00:00")))
    }
    val got = Events.forecastBacktest(rows.toDF("event_type", "ts"),
        "event_type", "ts")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    // naive: 8 scored days, |diff| = 2,2,2,2,2,2,2,1 -> mae = 15e6//8
    // mape per day: (1e6*2)//4=5e5 x4 (y=4 days), (1e6*2)//2=1e6 x3
    //   (y=2 days), (1e6*1)//3=333333 -> sum 5333333 // 8 = 666666
    // snaive: days 8,9 vs 1,2: |4-2|=2 (y=4), |3-4|=1 (y=3)
    //   mae = (1e6*3)//2 = 1.5e6; mape = (5e5 + 333333)//2 = 416666
    assert(got == Seq(("g", 8L, 1875000L, 666666L, 2L, 1500000L,
      416666L)), got)
  }

  test("twoProportionCard: Wilson bounds match an independent scalar " +
    "re-derivation, the Newcombe diff interval brackets the lift, and " +
    "a one-armed group reports NULL bounds not a fake lift") {
    import graft.ops.Events
    val ts = java.sql.Timestamp.valueOf("2024-01-10 00:00:00")
    // grp a: treated (odd users) 4 rounds 3 conv; control 4 rounds 1 conv
    val rows = Seq(
      ("a", 1L, 150.0), ("a", 1L, 150.0), ("a", 3L, 150.0), ("a", 3L, 50.0),
      ("a", 2L, 150.0), ("a", 2L, 50.0), ("a", 4L, 50.0), ("a", 4L, 50.0),
      ("b", 1L, 150.0), ("b", 3L, 50.0) // no control arm
    ).map { case (g, u, v) => (g, u, v, ts) }
      .toDF("event_type", "user_id", "value", "ts")
    val got = Events.twoProportionCard(rows, "event_type", "user_id",
        col("value") >= 100.0)
      .collect().map(r => r.getString(0) -> r).toMap
    def wilson(x: Long, n: Long, s: Double): Double = {
      val p = x.toDouble / n.toDouble; val z2 = 1.96 * 1.96; val nd = n.toDouble
      (p + z2 / (2.0 * nd) + (s * 1.96) *
        math.sqrt(p * (1.0 - p) / nd + z2 / (4.0 * nd * nd))) /
        (1.0 + z2 / nd)
    }
    def r6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble + 0.0
    val a = got("a")
    assert(a.getLong(1) == 4L && a.getLong(2) == 3L &&
      a.getLong(3) == 4L && a.getLong(4) == 1L)
    assert(a.getDouble(8) == r6(wilson(3, 4, -1.0)), "lo_t")
    assert(a.getDouble(9) == r6(wilson(3, 4, 1.0)), "hi_t")
    val d = 0.75 - 0.25
    val dlo = d - math.sqrt(math.pow(0.75 - wilson(3, 4, -1), 2) +
      math.pow(wilson(1, 4, 1) - 0.25, 2))
    assert(a.getDouble(12) == r6(dlo), "diff_lo")
    assert(a.getDouble(12) < d && d < a.getDouble(13), "bracket")
    val b = got("b")
    assert(!b.isNullAt(1) && b.isNullAt(3) && b.isNullAt(12),
      "one-armed group must have NULL diff bounds")
  }

  test("binsegChangepoint: a clean level shift splits exactly at the " +
    "boundary with the ANOVA gain; a flat series gains 0 and ties to " +
    "the earliest day") {
    import graft.ops.Events
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")
    val rows =
      (Seq.fill(2)(ts(1)) ++ Seq.fill(2)(ts(2)) ++
        Seq.fill(8)(ts(3)) ++ Seq.fill(8)(ts(4))).map(("g", _)) ++
      (1 to 3).map(d => ("flat", ts(d)))
    val got = Events.binsegChangepoint(rows.toDF("event_type", "ts"),
        "event_type", "ts")
      .as[(String, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    val day = (d: Int) => java.time.LocalDate.of(2024, 1, d).toEpochDay
    // g: [2,2,8,8] -> split after day 2: 8e6+128e6-100e6 = 36e6
    assert(got("g") == (("g", day(2), 2L, 2L, 2000000L, 8000000L,
      36000000L)), got("g"))
    // flat [1,1,1]: every split gains 0 (up to floor), earliest day wins
    assert(got("flat")._2 == day(1) && got("flat")._7 <= 0L, got("flat"))
  }

  test("replayEval: greedy policy from the train split, unbiased " +
    "matched-rounds mean on eval, equal-mean arms tie to the " +
    "lexicographically smaller arm, match rate reported exactly") {
    import graft.ops.Events
    def slot(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16) % 2
    }
    val ids = (1L to 400L)
    val tr = ids.filter(slot(_) == 0L).take(6)
    val ev = ids.filter(slot(_) == 1L).take(4)
    val ts = java.sql.Timestamp.valueOf("2024-01-10 00:00:00")
    val rows = Seq(
      // ctx 0 train: arm a mean 300c, arm b mean 100c -> policy a
      ("a", 2L, tr(0), 3.0), ("a", 2L, tr(1), 3.0), ("b", 2L, tr(2), 1.0),
      // ctx 1 train: arms b and c tie at 500c -> policy b (min arm)
      ("b", 3L, tr(3), 5.0), ("c", 3L, tr(4), 5.0),
      // ctx 0 eval: two matched a-rounds (200c, 400c) + one unmatched b
      ("a", 2L, ev(0), 2.0), ("a", 2L, ev(1), 4.0), ("b", 2L, ev(2), 9.0),
      // ctx 1 eval: one matched b-round
      ("b", 3L, ev(3), 7.0)
    ).map { case (arm, u, id, v) => (arm, u, id, v, ts) }
      .toDF("event_type", "user_id", "event_id", "value", "ts")
    val got = Events.replayEval(rows, "event_type", "user_id",
        "event_id", "value", nContexts = 2)
      .as[(Long, String, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (0L, "a", 3L, 2L, 300000000L, 666666L),
      (1L, "b", 1L, 1L, 700000000L, 1000000L)), got)
  }

  test("textRank: co-occurrence edges respect minLen and lowercase; " +
    "symmetric two-word components hold the exact 1e6 fixpoint " +
    "whatever their edge weight; self-adjacency never makes an edge") {
    import graft.ops.TextAnalysis
    val docs = Seq(
      (1L, "Alpha beta alpha ab"), // 'ab' filtered; (alpha,beta) w=2
      (2L, "gamma gamma delta")    // self-pair dropped; (gamma,delta) w=1
    ).toDF("doc_id", "text")
    val got = TextAnalysis.textRank(docs, "doc_id", "text",
        minLen = 3, iters = 3)
      .as[(String, Long)].collect().toMap
    // each component is a symmetric pair: full rank flows across every
    // iteration, so r = teleport + 0.85e6 = 1e6 exactly, independent of w
    assert(got == Map("alpha" -> 1000000L, "beta" -> 1000000L,
      "gamma" -> 1000000L, "delta" -> 1000000L), got)
  }

  test("kCenterSelect: greedy farthest-point on a line — seed is min " +
    "id, radii are exact squared-L2 micros and nonincreasing, distance " +
    "ties break id-asc") {
    import graft.ops.Similarity
    // positions 0, 10, 4, 6: seed id1(0); pick2 = id2(10, d=100);
    // pick3: id3 min(16,36)=16 vs id4 min(36,16)=16 -> tie -> id3;
    // pick4: id4 min(36,16,4)=4
    val emb = Seq(
      (1L, Array(0.0, 0.0)), (2L, Array(10.0, 0.0)),
      (3L, Array(4.0, 0.0)), (4L, Array(6.0, 0.0))
    ).toDF("vec_id", "embedding")
    val got = Similarity.kCenterSelect(emb, "vec_id", "embedding",
        k = 4, dim = 2)
      .as[(Long, Long, Option[Long])].collect().toSet
    assert(got == Set((1L, 1L, None), (2L, 2L, Some(100000000L)),
      (3L, 3L, Some(16000000L)), (4L, 4L, Some(4000000L))), got)
  }

  test("marginMining: hand ratio margins — identical pair wins at " +
    "ratio > 1, a negative denominator pair drops to NULL not a bogus " +
    "sign flip, and the threshold gates the output") {
    import graft.ops.Similarity
    // sources (even): 0=(1,0), 2=(0,1); targets (odd): 1=(1,0),
    // 3=(0.6,0.8), 5=(-1,0). k=2 shift-idiom means give a_src(0)=8e5,
    // a_src(2)=4e5, a_dst(1)=5e5, a_dst(3)=7e5, a_dst(5)=-5e5; so
    // (0,1): (2e6*1e6)//13e5 = 1538461; (2,3): (2e6*8e5)//11e5 =
    // 1454545; (2,5) has denominator -1e5 -> NULL (filtered, never a
    // flipped sign)
    val emb = Seq(
      (0L, Array(1.0, 0.0)), (2L, Array(0.0, 1.0)),
      (1L, Array(1.0, 0.0)), (3L, Array(0.6, 0.8)),
      (5L, Array(-1.0, 0.0))
    ).toDF("vec_id", "embedding")
    val got = Similarity.marginMining(emb, "vec_id", "embedding", k = 2)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((0L, 1L, 1000000L, 1538461L),
      (2L, 3L, 800000L, 1454545L)), got)
    val strict = Similarity.marginMining(emb, "vec_id", "embedding",
        k = 2, marginThresholdMicros = 1500000L)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(strict == Set((0L, 1L, 1000000L, 1538461L)), strict)
  }

  test("mmrRerank: diversity beats relevance at pick 2 — the runner-up " +
    "by cosine is nearly parallel to pick 1, so the more distant " +
    "third candidate wins the MMR step") {
    import graft.ops.Similarity
    // query (1,0,0); c1=(3,1,0) top by rel; c2=(3,1.1,0) second by rel
    // but sim(c2,c1)=0.9996 -> mmr -0.0607; c3=(3,0,1.2) has rel 0.9285
    // and sim(c3,c1)=0.8809 -> mmr 0.0476 -> c3 is pick 2
    val emb = Seq(
      (0L, Array(1.0, 0.0, 0.0)),
      (1L, Array(3.0, 1.0, 0.0)),
      (2L, Array(3.0, 1.1, 0.0)),
      (3L, Array(3.0, 0.0, 1.2))
    ).toDF("vec_id", "embedding")
    val got = Similarity.mmrRerank(emb, "vec_id", "embedding",
        candK = 3, k = 3, stride = 100)
      .select("query_id", "pick", "cand_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((0L, 1L, 1L), (0L, 2L, 3L), (0L, 3L, 2L)), got)
  }

  test("mmrRerank == naive greedy MMR on random non-negative vectors") {
    import graft.ops.Similarity
    val rnd = new scala.util.Random(23)
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum))
    }
    (1 to 2).foreach { trial =>
      val vecs = (0L to 10L).map(i =>
        i -> Array.fill(4)(rnd.nextDouble() + 0.05))
      val emb = vecs.toDF("vec_id", "embedding")
      val q = vecs.head._2
      val rel = vecs.tail.map { case (i, v) => i -> r4(cos(q, v)) }.toMap
      val pool = rel.toSeq.sortBy { case (i, r) => (-r, i) }.take(6)
        .map(_._1)
      var sel = Vector(pool.minBy(i => (-rel(i), i)))
      while (sel.size < 4) {
        val remIds = pool.filterNot(sel.contains)
        val next = remIds.minBy { d =>
          val ms = sel.map(s =>
            r4(cos(vecs(d.toInt)._2, vecs(s.toInt)._2))).max
          (-(rel(d) - ms), d)
        }
        sel :+= next
      }
      val got = Similarity.mmrRerank(emb, "vec_id", "embedding",
          candK = 6, k = 4, stride = 100)
        .orderBy("pick").select("cand_id")
        .as[Long].collect().toVector
      assert(got == sel, s"trial $trial: got $got want $sel")
    }
  }

  test("retrievalEval: hand MRR/NDCG — perfect run scores 1.0, " +
    "relevant-at-rank-2 only gives rr 500000 and the weight ratio, " +
    "truth queries missing from the run score zeros") {
    import graft.ops.Similarity
    val run = Seq(
      // q1: relevant at ranks 1,2 of 2 -> perfect
      (1L, 10L, 1), (1L, 11L, 2),
      // q2: relevant only at rank 2
      (2L, 20L, 1), (2L, 21L, 2),
    ).toDF("query_id", "cand_id", "rank")
    val truth = Seq((1L, 10L), (1L, 11L), (2L, 21L), (2L, 99L),
      (3L, 30L)).toDF("query_id", "cand_id")
    val got = Similarity.retrievalEval(run, truth, k = 2)
      .select("query_id", "hits_at_k", "rr_micros", "ndcg")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val w = Similarity.ndcgWeightMicros
    assert(got(1L) == ((2L, 1000000L, 1.0)))
    // q2: n_rel=2 -> idcg = w1+w2; dcg = w2 (hit at rank 2)
    val exp2 = BigDecimal(w(1).toDouble / (w(0) + w(1)).toDouble)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(2L) == ((1L, 500000L, exp2)))
    assert(got(3L) == ((0L, 0L, 0.0)))
  }

  test("curriculumInterleave: round-robin of quality-sorted streams, " +
    "skipping exhausted sources; pos is the exact permutation a global " +
    "(round, source) sort would give — without the global sort") {
    val docs = Seq(
      (1L, "a", 30L), (2L, "a", 20L), (3L, "a", 10L), // ranks 1,2,3
      (4L, "b", 99L), (5L, "b", 1L),                  // ranks 1,2
      (6L, "c", 50L),                                 // rank 1
    ).toDF("doc_id", "source", "q")
    val got = graft.ops.Sampling.curriculumInterleave(docs, "doc_id",
        "source", "q")
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    // rounds: (a1,b1,c1), (a2,b2 — c exhausted), (a3)
    assert(got == Map(1L -> 1L, 4L -> 2L, 6L -> 3L,
      2L -> 4L, 5L -> 5L, 3L -> 6L))
    assert(got.values.toSet == (1L to 6L).toSet, "pos is a permutation")
  }

  test("quantileNormalize: identity at grid resolution on one group, " +
    "and equal within-group ranks get EQUAL pooled values across " +
    "groups (the calibration property)") {
    import graft.ops.DataQuality
    // one group, distinct values, gridSize == n -> exact identity
    val one = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L),
      (4L, "a", 40L)).toDF("id", "g", "v")
    val idGot = DataQuality.quantileNormalize(one, "id", "g", "v",
        gridSize = 4)
      .select("v", "norm").as[(Long, Long)].collect().toMap
    assert(idGot == Map(10L -> 10L, 20L -> 20L, 30L -> 30L, 40L -> 40L))
    // two groups on disjoint scales: after normalization, rank k in A
    // and rank k in B land on the SAME pooled value
    val two = Seq((1L, "a", 1L), (2L, "a", 2L), (3L, "a", 3L),
      (11L, "b", 101L), (12L, "b", 102L), (13L, "b", 103L))
      .toDF("id", "g", "v")
    val norm = DataQuality.quantileNormalize(two, "id", "g", "v",
        gridSize = 2)
      .select("id", "norm").as[(Long, Long)].collect().toMap
    for (k <- 1 to 3)
      assert(norm(k.toLong) == norm(10L + k),
        s"rank $k: ${norm(k.toLong)} vs ${norm(10L + k)}")
    // monotone within a group
    assert(norm(1L) <= norm(2L) && norm(2L) <= norm(3L))
  }

  test("rankSumAuc: perfect separation = 1, reversal = 0, all-tied = 0.5, " +
    "interleaved ties take average ranks, one-class groups emit NULL") {
    import graft.ops.DataQuality
    val rows = Seq(
      // g1: positives {3,4} above negatives {1,2} -> AUC 1
      ("g1", 1L, false), ("g1", 2L, false), ("g1", 3L, true), ("g1", 4L, true),
      // g2: positives {1,2} below negatives {3,4} -> AUC 0
      ("g2", 1L, true), ("g2", 2L, true), ("g2", 3L, false), ("g2", 4L, false),
      // g3: every score tied -> AUC 0.5 exactly (average ranks)
      ("g3", 7L, true), ("g3", 7L, false), ("g3", 7L, true), ("g3", 7L, false),
      // g4: pos at {1,3}, neg at {2,3}: pairs (1,2)=0 (1,3)=0 (3,2)=1
      // (3,3)=0.5 -> U = 1.5, AUC = 1.5/4 = 0.375
      ("g4", 1L, true), ("g4", 3L, true), ("g4", 2L, false), ("g4", 3L, false),
      // g5: one class only -> NULL
      ("g5", 1L, true), ("g5", 2L, true),
    ).toDF("g", "score", "is_pos")
    val got = DataQuality.rankSumAuc(rows, "g", "score", col("is_pos"))
      .select("g", "auc").as[(String, Option[Double])].collect().toMap
    assert(got == Map("g1" -> Some(1.0), "g2" -> Some(0.0),
      "g3" -> Some(0.5), "g4" -> Some(0.375), "g5" -> None))
  }

  test("opqRotate is orthonormal: pairwise L2 distances are preserved " +
    "(to float rounding) and the map is not the identity") {
    val vecs = Seq(
      (1L, Array(1.0, 2.0, -3.0, 0.5)),
      (2L, Array(-2.0, 0.0, 1.0, 4.0)),
      (3L, Array(0.0, 0.0, 0.0, 1.0)),
    ).toDF("vec_id", "embedding")
    val rot = graft.ops.Similarity.opqRotate(vecs, "embedding",
        reflections = 3, dim = 4)
      .as[(Long, Array[Double])].collect().toMap
    val orig = vecs.as[(Long, Array[Double])].collect().toMap
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    for (i <- orig.keys; j <- orig.keys if i < j)
      assert(math.abs(d2(orig(i), orig(j)) - d2(rot(i), rot(j))) < 1e-9,
        s"distance ($i,$j) not preserved")
    assert(orig.keys.exists(i => d2(orig(i), rot(i)) > 1e-6),
      "rotation must not be the identity")
  }

  test("survivorship strategies pick the golden record per rule: " +
    "most-complete (length, id tie), most-recent (version), " +
    "source-priority (ladder order, unlisted sources lose)") {
    import graft.ops.Dedup.Survivorship
    // one entity of three records + a singleton
    val recs = Seq(
      (10L, 10L, "aaaa x", 3L, "crm"),
      (10L, 11L, "aaaa",   9L, "unknown"),
      (10L, 12L, "aaaa y", 9L, "erp"),
      (20L, 20L, "zzzz",   1L, "unknown"),
    ).toDF("entity_id", "id", "s", "ver", "src")
    def pick(st: Survivorship.Strategy): Map[Long, Long] =
      Dedup.survivors(recs, "entity_id", "id", st)
        .select("entity_id", "id").as[(Long, Long)].collect().toMap
    // longest s: ids 10/12 tie at length 6 -> min id 10
    assert(pick(Survivorship.MostComplete("s")) ==
      Map(10L -> 10L, 20L -> 20L))
    // largest ver: ids 11/12 tie at 9 -> min id 11
    assert(pick(Survivorship.MostRecent("ver")) ==
      Map(10L -> 11L, 20L -> 20L))
    // erp outranks crm; "unknown" (unlisted) loses to both; the
    // singleton's unlisted source still survives (it is alone)
    assert(pick(Survivorship.SourcePriority("src", Seq("erp", "crm"))) ==
      Map(10L -> 12L, 20L -> 20L))
    // one-call face: resolution + survivorship compose (dist-1 chain
    // collapses to one entity; survivor = most recent)
    val one = Dedup.resolveEntitiesSurvivors(
        Seq((1L, "aaaa", 5L), (2L, "aaab", 7L), (3L, "zzzz", 1L))
          .toDF("id", "s", "ver"),
        "id", "s", maxDist = 1, Survivorship.MostRecent("ver"))
      .select("entity_id", "id").as[(Long, Long)].collect().toMap
    assert(one == Map(1L -> 2L, 3L -> 3L))
  }

  test("averagePrecision: hand AP — front-loaded run outranks a buried " +
    "one on identical hit sets; perfect run scores 1e6; truth queries " +
    "missing from the run score zeros") {
    import graft.ops.Similarity
    val run = Seq(
      // q1: hits at ranks 1,2 of 3 (front-loaded)
      (1L, 10L, 1), (1L, 90L, 2), (1L, 11L, 3),
      // q2: the same 2-hit set buried at ranks 2,3
      (2L, 91L, 1), (2L, 20L, 2), (2L, 21L, 3),
      // q3: all 2 hits at ranks 1,2 with n_rel=2 -> perfect
      (3L, 30L, 1), (3L, 31L, 2),
    ).toDF("query_id", "cand_id", "rank")
    val truth = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L),
      (3L, 30L), (3L, 31L), (4L, 40L)).toDF("query_id", "cand_id")
    val got = Similarity.averagePrecision(run, truth, k = 3)
      .select("query_id", "n_hits", "ap_micros")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // q1: hit@1 tp=1 -> 1e6; wait rank2 miss; hit@3 tp=2 -> 666666
    //   ap = (1000000 + 666666) div min(3, 2) = 833333
    assert(got(1L) == ((2L, 833333L)))
    // q2: hit@2 tp=1 -> 500000; hit@3 tp=2 -> 666666 -> ap = 583333
    assert(got(2L) == ((2L, 583333L)))
    assert(got(1L)._2 > got(2L)._2, "front-loading must win")
    // q3: (1000000 + 1000000) div 2 = 1000000 — the perfect score
    assert(got(3L) == ((2L, 1000000L)))
    assert(got(4L) == ((0L, 0L)), "missing-run query scores zeros")
  }

  test("didEstimator: hand 2x2 — control delta nets out of the treated " +
    "delta; missing cell yields NULL not a biased estimate") {
    import graft.ops.Events
    val ts0 = java.sql.Timestamp.valueOf("2024-01-10 00:00:00")
    val ts1 = java.sql.Timestamp.valueOf("2024-01-20 00:00:00")
    // treated (odd users): pre mean 100c, post mean 350c
    // control (even users): pre mean 100c, post mean 200c
    // did = (350 - 100) - (200 - 100) = 150 cents = 150e6 micro-cents
    val ev = Seq(
      ("a", 1L, ts0, 1.0), ("a", 3L, ts0, 1.0),
      ("a", 1L, ts1, 3.0), ("a", 3L, ts1, 4.0),
      ("a", 2L, ts0, 1.0), ("a", 4L, ts0, 1.0),
      ("a", 2L, ts1, 2.0), ("a", 4L, ts1, 2.0),
      // segment "b": no treated-post cell -> NULL did
      ("b", 2L, ts0, 5.0), ("b", 1L, ts0, 5.0), ("b", 2L, ts1, 5.0),
    ).toDF("event_type", "user_id", "ts", "value")
    val got = Events.didEstimator(ev, "event_type", "user_id", "ts",
        "value", cutoff = "2024-01-15 00:00:00")
      .select("event_type", "did_micros")
      .as[(String, Option[Long])].collect().toMap
    assert(got("a").contains(150000000L))
    assert(got("b").isEmpty, "incomplete 2x2 must be NULL")
  }

  test("stratifiedAte: weighted per-stratum contrasts — a single-arm " +
    "stratum reports NULL and stays out of the total; a negative ATE " +
    "divides sign-symmetrically") {
    import graft.ops.Events
    val ts = java.sql.Timestamp.valueOf("2024-01-10 00:00:00")
    // stratum a (n=4): treated mean 300c, control mean 100c -> +200c
    // stratum b (n=2): treated mean 100c, control mean 600c -> -500c
    // ATE = (4*200e6 + 2*(-500e6)) / 6 = -200e6/6 = -33333333.33 ->
    // sign-symmetric truncation = -33333333
    val ev = Seq(
      ("a", 1L, ts, 3.0), ("a", 3L, ts, 3.0),
      ("a", 2L, ts, 1.0), ("a", 4L, ts, 1.0),
      ("b", 1L, ts, 1.0), ("b", 2L, ts, 6.0),
      // stratum c: only control -> NULL effect, excluded from total
      ("c", 2L, ts, 9.0), ("c", 4L, ts, 9.0),
    ).toDF("event_type", "user_id", "ts", "value")
    val got = Events.stratifiedAte(ev, "event_type", "user_id", "value")
      .select("stratum", "n", "effect_micros")
      .as[(Option[String], Long, Option[Long])].collect()
      .map(r => (r._1.getOrElse("TOTAL"), (r._2, r._3))).toMap
    assert(got("a") == ((4L, Some(200000000L))), got)
    assert(got("b") == ((2L, Some(-500000000L))), got)
    assert(got("c") == ((2L, None)), got)
    assert(got("TOTAL") == ((6L, Some(-33333333L))), got)
  }

  test("linkPrediction: 4-cycle scores both diagonals at Jaccard 1.0; " +
    "existing edges are never predicted; the center-degree cap removes " +
    "hub-mediated candidates") {
    import graft.ops.Graph
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
      .toDF("src", "dst")
    val got = Graph.linkPrediction(cycle, minCommon = 2L,
        maxCenterDeg = 64L)
      .select("u", "v", "cn", "jaccard_micros")
      .as[(Long, Long, Long, Long)].collect().toSet
    // diagonals (1,3) via {2,4} and (2,4) via {1,3}; deg all 2 ->
    // jaccard = 2e6 / (2 + 2 - 2) = 1e6; edges themselves never appear
    assert(got == Set((1L, 3L, 2L, 1000000L), (2L, 4L, 2L, 1000000L)))
    // star 10-{1,2,3,4} + edge (1,2): every candidate pair is mediated
    // by the hub; capping centers at deg 3 removes them all
    val star = Seq((10L, 1L), (10L, 2L), (10L, 3L), (10L, 4L), (1L, 2L))
      .toDF("src", "dst")
    val withHub = Graph.linkPrediction(star, minCommon = 1L,
      maxCenterDeg = 4L).count()
    val capped = Graph.linkPrediction(star, minCommon = 1L,
      maxCenterDeg = 3L).count()
    assert(withHub > 0L && capped == 0L)
  }

  test("degreeAssortativity: path graph is perfectly disassortative " +
    "(-1.0); a clique has zero degree variance -> NULL") {
    import graft.ops.Graph
    val path = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val r = Graph.degreeAssortativity(path)
      .select("m", "assortativity")
      .as[(Long, Option[Double])].collect().head
    assert(r == ((4L, Some(-1.0))))
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val r2 = Graph.degreeAssortativity(tri)
      .select("assortativity").as[Option[Double]].collect().head
    assert(r2.isEmpty, "degree-regular graph must be NULL, not NaN")
  }

  test("calibrationCard: hand cells — overconfident cell lands in bin 9 " +
    "with its gap, perfect cell gaps zero, unseen eval cell goes to " +
    "bin -1 with NULL prediction") {
    import graft.ops.DataQuality
    val rows = Seq(
      // cell A: train (even ids) all positive -> pred 1e6
      (0L, "A", true), (2L, "A", true),
      // cell A eval (odd ids): half positive -> obs 500000 in bin 9
      (1L, "A", true), (3L, "A", false),
      // cell B: train all negative, eval all negative -> bin 0, gap 0
      (4L, "B", false), (5L, "B", false),
      // cell C: eval only -> unseen, bin -1
      (7L, "C", true),
    ).toDF("id", "f", "y")
    val got = DataQuality.calibrationCard(rows, "id", Seq(col("f")),
        col("y"), bins = 10)
      .select("bin", "n", "mean_pred_micros", "obs_rate_micros",
        "gap_micros", "ece_num")
      .as[(Long, Long, Option[Long], Long, Option[Long], Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    assert(got(9L) == ((9L, 2L, Some(1000000L), 500000L, Some(500000L),
      Some(1000000L))))
    assert(got(0L) == ((0L, 1L, Some(0L), 0L, Some(0L), Some(0L))))
    assert(got(-1L) == ((-1L, 1L, None, 1000000L, None, None)))
  }

  test("readability: hand counts — vowel-less words still carry one " +
    "syllable, sentence floor is 1, and the micro formula is exact") {
    import graft.ops.TextAnalysis
    val docs = Seq(
      (1L, "the cat sat. it spat!"),  // 5 words, 2 sentences, 5 syl
      (2L, "xkcd 42 rhythm"),          // 3 vowel-less-ish words
    ).toDF("doc_id", "text")
    val got = TextAnalysis.readability(docs, "doc_id", "text")
      .select("doc_id", "n_words", "n_sentences", "n_syllables",
        "flesch_micros")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // doc1: words=5 ("sat." and "spat!" are tokens), sentences=2,
    // vowel groups: e,a,a,i,a = 5, no vowel-less words
    val f1 = 206835000L - (1015000L * 5) / 2 - (84600000L * 5) / 5
    assert(got(1L) == ((1L, 5L, 2L, 5L, f1)))
    // doc2: words=3, sentences=1 (floor), vowel groups: none in xkcd,
    // none in 42, "rhythm" has y -> 1 group; vowel-less words: 2
    val f2 = 206835000L - (1015000L * 3) / 1 - (84600000L * 3) / 3
    assert(got(2L) == ((2L, 3L, 1L, 3L, f2)))
  }

  test("groupChecksum: permutation-invariant, duplicate-row-sensitive " +
    "(the sum_sig catches what xor cancels), content-sensitive") {
    import graft.ops.DataQuality
    val a = Seq(("g", 1L, "x"), ("g", 2L, "y"), ("h", 3L, "z"))
      .toDF("grp", "k", "v")
    val b = Seq(("h", 3L, "z"), ("g", 2L, "y"), ("g", 1L, "x"))
      .toDF("grp", "k", "v")  // same rows, different order
    def sig(df: org.apache.spark.sql.DataFrame) =
      DataQuality.groupChecksum(df, "grp", Seq("k", "v"))
        .select("grp", "n_rows", "xor_sig", "sum_sig")
        .as[(String, Long, Long, Long)].collect().toSet
    assert(sig(a) == sig(b), "order must not matter")
    // duplicating a row twice: xor of the pair cancels, sum must not
    val dup = Seq(("g", 1L, "x"), ("g", 1L, "x"), ("g", 2L, "y"))
      .toDF("grp", "k", "v")
    val base = sig(a).find(_._1 == "g").get
    val d = sig(dup).find(_._1 == "g").get
    assert(d._2 == 3L && d._4 != base._4,
      "sum_sig must catch the duplicated row")
    // content change flips the xor
    val c = Seq(("g", 1L, "X"), ("g", 2L, "y"), ("h", 3L, "z"))
      .toDF("grp", "k", "v")
    assert(sig(c).find(_._1 == "g").get._3 != base._3)
    // null vs empty-string must hash differently (sentinel contract)
    val n1 = Seq(("g", Option.empty[String])).toDF("grp", "v")
    val n2 = Seq(("g", Option(""))).toDF("grp", "v")
    assert(DataQuality.groupChecksum(n1, "grp", Seq("v"))
      .select("xor_sig").as[Long].head() !=
      DataQuality.groupChecksum(n2, "grp", Seq("v"))
        .select("xor_sig").as[Long].head())
  }

  test("paretoFrontier == naive dominance filter on random 2-D data, " +
    "duplicates of a frontier point all survive") {
    forAllSeeded(Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0L, 20L), Gen.choose(0L, 20L))), n = 6) { pts =>
      val rows = pts.zipWithIndex.map { case ((x, y), i) =>
        (i.toLong, "g", x, y)
      }
      val df = rows.toDF("id", "g", "x", "y")
      val got = graft.ops.Windows.paretoFrontier(df, Seq(col("g")),
        "x", "y").select("id").as[Long].collect().toSet
      val naive = rows.filter { case (_, _, x, y) =>
        !rows.exists { case (_, _, x2, y2) =>
          (x2 <= x && y2 >= y) && (x2 < x || y2 > y)
        }
      }.map(_._1).toSet
      assert(got == naive, s"pts=$pts")
    }
  }

  test("seasonalDecompose: constant series + one spike — trend NULL at " +
    "edges, spike splits between seasonal (its dow) and residual") {
    import graft.ops.Events
    // 21 days of 1 event/day, except day 10 has 8 events
    val evs = (0 until 21).flatMap { d =>
      val n = if (d == 10) 8 else 1
      (0 until n).map(i => ("g",
        java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:00"),
        d.toLong * 100 + i))
    }.toDF("event_type", "ts", "event_id")
    val got = Events.seasonalDecompose(evs, "event_type", "ts")
      .select("day", "y", "trend_micros", "seasonal_micros",
        "resid_micros")
      .as[(Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    val d0 = got.keys.min
    // edges (first/last 3 days) have no full window -> trend NULL
    assert(got(d0)._3.isEmpty && got(d0 + 20)._3.isEmpty)
    assert(got(d0 + 2)._3.isEmpty && got(d0 + 18)._3.isEmpty)
    // interior far from the spike: trend = 1e6, detr = 0
    assert(got(d0 + 4)._3.contains(1000000L))
    // spike day: y=8, its 7-window sum = 14 -> trend = 2e6,
    // detr = 8e6 - 2e6 = 6e6; its dow cell averages 6e6 over 2 non-edge
    // obs (days 3..17 interior; dow=(10 mod 7)=3 also day 17) ->
    // seasonal = (6e6 + (1e6 - trend(17)·1)) ... just assert identity:
    // resid = detr - seasonal for every non-edge day
    got.values.filter(_._3.isDefined).foreach { r =>
      val detr = 1000000L * r._2 - r._3.get
      assert(r._5.contains(detr - r._4.get))
    }
    // and the spike's residual is large (the decomposition localizes it)
    // dow-mates of the spike (days d0+3, d0+17) have detr 0, so
    // seasonal(spike dow) = 6e6/3 = 2e6 and resid(spike) = 4e6 exactly
    assert(got(d0 + 10)._5.contains(4000000L))
  }

  test("decayedEngagement: weight table matches pow(0.9, lag) micros, " +
    "newest activity outweighs old, >29-day-old events score zero") {
    import graft.ops.Events
    assert(Events.decayWeightMicros(0) == 1000000L)
    assert(Events.decayWeightMicros(1) == 900000L)
    assert(Events.decayWeightMicros(29) ==
      math.round(1000000.0 * math.pow(0.9, 29)))
    def day(d: Int) =
      java.sql.Timestamp.valueOf(f"2024-03-${d}%02d 09:00:00")
    val evs = Seq(
      (1L, day(30)), (1L, day(30)),       // user 1: 2 events at ref
      (2L, day(1)), (2L, day(1)), (2L, day(1)), // user 2: 3 at lag 29
      (3L, day(30)),                      // sets ref = Mar 30
    ).toDF("user_id", "ts")
      .withColumn("event_id", monotonically_increasing_id())
    val got = Events.decayedEngagement(evs, "user_id", "ts")
      .select("user_id", "n_events", "score_micros")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 2L, 2000000L)))
    assert(got(2L) == ((2L, 3L, 3 * Events.decayWeightMicros(29))))
    assert(got(1L)._3 > got(2L)._3, "recency must dominate")
  }
}
