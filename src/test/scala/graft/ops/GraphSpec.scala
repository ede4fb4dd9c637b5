package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Hand-computed fixpoints + exactness invariants for the link-graph
  * layer. PageRank here is scaled-integer arithmetic, so tests assert
  * EXACT micros — any deviation is a real semantics change, not float
  * noise. */
class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def edges(rows: (Long, Long, Long)*) =
    rows.toDF("src", "dst", "w")

  test("transitionEdges: per-user lag under the total order; nulls drop " +
    "BEFORE the lag so a null never breaks the chain") {
    val ev = Seq(
      (1L, 1L, Option(10L)), (1L, 2L, Option.empty[Long]),
      (1L, 3L, Option(20L)), (1L, 4L, Option(10L)),
      (2L, 5L, Option(20L)), (2L, 6L, Option(20L))
    ).toDF("user_id", "event_id", "k")
    val e = Graph.transitionEdges(ev, "user_id", "event_id", col("k"))
      .as[(Long, Long, Long)].collect().toSet
    // user 1: 10 -> 20 -> 10 (the null event vanishes, chain intact);
    // user 2: one 20 -> 20 self-transition
    assert(e == Set((10L, 20L, 1L), (20L, 10L, 1L), (20L, 20L, 1L)))
  }

  test("pageRank: the symmetric 2-cycle holds the uniform fixpoint " +
    "exactly (teleport + damped full rank = initial rank)") {
    val r = Graph.pageRank(edges((1L, 2L, 1L), (2L, 1L, 1L)), iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 1000000L, 2L -> 1000000L))
  }

  test("pageRank: a sink absorbs mass; hand-computed micros at fixpoint") {
    // a -> b only. a gets teleport-only from iter 1; b's fixpoint is
    // teleport + 85% of a's teleport rank.
    val r = Graph.pageRank(edges((1L, 2L, 1L)), iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 150000L, 2L -> 277500L))
  }

  test("pageRank: weighted out-edges split contribution w/out_w " +
    "(one iteration, hand-checked)") {
    val r = Graph.pageRank(
      edges((1L, 2L, 3L), (1L, 3L, 1L), (2L, 1L, 1L), (3L, 1L, 1L)),
      iters = 1).as[(Long, Long)].collect().toMap
    // out_w(1) = 4: contrib 1->2 = 750000, 1->3 = 250000; nodes 2 and 3
    // send their full initial rank to 1.
    assert(r(2L) == 150000L + 85L * 750000L / 100L)
    assert(r(3L) == 150000L + 85L * 250000L / 100L)
    assert(r(1L) == 150000L + 85L * 2000000L / 100L)
  }

  test("personalizedPageRank: teleport lands only on seeds; downstream " +
    "nodes earn rank through in-links (hand-computed chain fixpoint)") {
    // chain 0 -> 1 -> 2 with seed {0}: 1 gets 85% of 0's teleport rank,
    // 2 gets 85% of 1's — the geometric proximity-to-seed decay
    val r = Graph.personalizedPageRank(
      edges((0L, 1L, 1L), (1L, 2L, 1L)),
      seed = col("node") % 10 === 0, iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(r == Map(0L -> 150000L,
      1L -> 85L * 150000L / 100L,
      2L -> 85L * (85L * 150000L / 100L) / 100L))
  }

  test("personalizedPageRank with an all-true seed == uniform pageRank") {
    val e = (1L to 40L).map(i => (i % 10, (i * 7) % 10, 1L + i % 3))
      .toDF("src", "dst", "w")
      .groupBy("src", "dst").agg(sum("w").as("w"))
    val uni = Graph.pageRank(e, iters = 3).as[(Long, Long)].collect().toMap
    val per = Graph.personalizedPageRank(e, seed = lit(true), iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(uni == per)
  }

  test("triangleCounts: hand graph — one triangle plus a pendant; " +
    "reversed duplicates and self-loops vanish in the simple-graph dedup") {
    val e = edges((1L, 2L, 1L), (2L, 1L, 3L), (2L, 3L, 1L), (1L, 3L, 1L),
      (3L, 4L, 1L), (4L, 4L, 9L))
    val got = Graph.triangleCounts(e)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map(
      1L -> ((2L, 1L, 1L)), 2L -> ((2L, 1L, 1L)),
      3L -> ((3L, 3L, 1L)), 4L -> ((1L, 0L, 0L))), got)
  }

  test("triangleCounts: K5 — every node sees C(4,2)=6 triangles " +
    "(each of the 10 global triangles counted once per member)") {
    val k5 = for (a <- 1L to 5L; b <- 1L to 5L if a < b) yield (a, b, 1L)
    val got = Graph.triangleCounts(k5.toDF("src", "dst", "w"))
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length == 5)
    got.foreach { case (n, deg, wedges, tri) =>
      assert(deg == 4L && wedges == 6L && tri == 6L, s"node $n")
    }
  }

  test("triangleCounts: a 2000-spoke star — the skew case the " +
    "orientation exists for — runs with ZERO wedge candidates") {
    // every spoke has deg 1 < the hub's 2000, so all edges orient
    // spoke -> hub: out-degree 1 everywhere, wedge mass Σ C(outdeg,2)=0.
    // Unoriented, the hub would fan out C(2000,2) ≈ 2M wedges; oriented,
    // the wedge self-join input is empty — the O(√E) out-degree bound
    // doing its job on the worst-case skew shape.
    val star = (1L to 2000L).map(i => (0L, i, 1L)).toDF("src", "dst", "w")
    val got = Graph.triangleCounts(star)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length == 2001)
    assert(got.forall(_._4 == 0L), "a star has no triangles")
    val hub = got.find(_._1 == 0L).get
    assert(hub._2 == 2000L && hub._3 == 2000L * 1999L / 2)
  }

  test("coreness: 4-clique with a pendant 2-chain — clique nodes sit in " +
    "the 3-core, the chain peels to coreness 1 (node 5 has degree 2 but " +
    "core number 1: the 2-core drops it once the leaf goes)") {
    val e = edges((1L, 2L, 1L), (1L, 3L, 1L), (1L, 4L, 1L), (2L, 3L, 1L),
      (2L, 4L, 1L), (3L, 4L, 1L), (4L, 5L, 1L), (5L, 6L, 1L))
    val got = Graph.coreness(e, iters = 8)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L,
      5L -> 1L, 6L -> 1L), got)
  }

  test("coreness: any tree peels to 1 everywhere once the h-iteration " +
    "has propagated the leaves inward (path of 9 needs 4 rounds)") {
    val path = (1L to 8L).map(i => (i, i + 1, 1L))
    val got = Graph.coreness(path.toDF("src", "dst", "w"), iters = 8)
      .as[(Long, Long)].collect().toMap
    assert(got.values.forall(_ == 1L), got)
    // too few iterations: the middle of the path has not peeled yet —
    // the fixed-iters contract is a PREFIX of the monotone sequence
    val early = Graph.coreness(path.toDF("src", "dst", "w"), iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(early(5L) == 2L && early(1L) == 1L, early)
  }

  test("coreness == naive peeling on random graphs; always <= degree") {
    val rnd = new scala.util.Random(11)
    (1 to 3).foreach { trial =>
      val es = (1 to 100).map(_ => (rnd.nextInt(14).toLong,
        rnd.nextInt(14).toLong, 1L)).toDF("src", "dst", "w")
      val und = es.as[(Long, Long, Long)].collect()
        .map { case (a, b, _) => (math.min(a, b), math.max(a, b)) }
        .filter { case (a, b) => a != b }.toSet
      val nodes = und.flatMap { case (a, b) => Seq(a, b) }
      // naive peeling: for k = 1, 2, ... remove nodes of degree < k to a
      // fixpoint; a node's core number is the last k it survived
      val core = scala.collection.mutable.Map[Long, Long]()
      var alive = nodes
      var k = 1L
      while (alive.nonEmpty) {
        var changed = true
        while (changed) {
          val deg = alive.map(n => n -> und.count { case (a, b) =>
            (a == n && alive(b)) || (b == n && alive(a)) }).toMap
          val drop = alive.filter(deg(_) < k)
          changed = drop.nonEmpty
          alive = alive -- drop
        }
        alive.foreach(core(_) = k)
        k += 1
      }
      val deg = nodes.map(n => n -> und.count { case (a, b) =>
        a == n || b == n }.toLong).toMap
      val got = Graph.coreness(es, iters = 20)
        .as[(Long, Long)].collect().toMap
      assert(got == core.toMap, s"trial $trial")
      got.foreach { case (n, c) => assert(c <= deg(n), s"node $n") }
    }
  }

  test("triangleCounts == naive all-triples count on random graphs") {
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { trial =>
      val es = (1 to 120).map(_ => (rnd.nextInt(12).toLong,
        rnd.nextInt(12).toLong, 1L)).toDF("src", "dst", "w")
      val und = es.as[(Long, Long, Long)].collect()
        .map { case (a, b, _) => (math.min(a, b), math.max(a, b)) }
        .filter { case (a, b) => a != b }.toSet
      val nodes = und.flatMap { case (a, b) => Seq(a, b) }
      def adj(x: Long, y: Long) = und((math.min(x, y), math.max(x, y)))
      val expected = nodes.map { n =>
        val nbrs = nodes.filter(m => m != n && adj(n, m)).toSeq
        val tris = nbrs.combinations(2).count { case Seq(x, y) => adj(x, y) }
        n -> ((nbrs.size.toLong,
          nbrs.size.toLong * (nbrs.size - 1) / 2, tris.toLong))
      }.toMap
      val got = Graph.triangleCounts(es)
        .as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(got == expected, s"trial $trial")
    }
  }

  test("hits: star fixpoint — the hub holds hub mass, spokes hold " +
    "authority; weighted split rescales to micros-of-max exactly") {
    val star = Graph.hits(edges((0L, 1L, 1L), (0L, 2L, 1L), (0L, 3L, 1L)),
      iters = 2).as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(star(0L) == ((1000000L, 0L)))
    Seq(1L, 2L, 3L).foreach(n => assert(star(n) == ((0L, 1000000L)), n))
    // weighted: u -> v (w=3), u -> z (w=1): auth rescales to max, so
    // v = 1e6 and z = (1e6*1e6) div 3e6 = 333333 micros
    val wtd = Graph.hits(edges((0L, 1L, 3L), (0L, 2L, 1L)), iters = 1)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(wtd(1L) == 1000000L && wtd(2L) == 333333L, wtd)
    // partitioning invariance (exact integers end to end)
    val e = (1L to 40L).map(i => (i % 10, (i * 7) % 10, 1L + i % 3))
      .toDF("src", "dst", "w").groupBy("src", "dst").agg(sum("w").as("w"))
    val p1 = Graph.hits(e.repartition(1), iters = 2)
      .as[(Long, Long, Long)].collect().toSet
    val p2 = Graph.hits(e.repartition(11), iters = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(p1 == p2)
  }

  private def md5Draw(walkId: Long, step: Int, ow: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$walkId#$step".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(8), 16) % ow
  }

  test("randomWalks == pure-JVM md5 inverse-CDF replay; sinks terminate " +
    "walks early; partitioning-invariant") {
    // 1 -> {2 (w=3), 3 (w=1)}, 2 -> {1 (w=1)}, 3 is a sink
    val e = edges((1L, 2L, 3L), (1L, 3L, 1L), (2L, 1L, 1L))
    val adj = Map( // src -> ordered (dst, lo, hi), ow
      1L -> ((Seq((2L, 0L, 3L), (3L, 3L, 4L)), 4L)),
      2L -> ((Seq((1L, 0L, 1L)), 1L)))
    def replay(seed: Long, steps: Int): Seq[(Long, Long, Long)] = {
      val buf = scala.collection.mutable.ArrayBuffer((seed, 0L, seed))
      var node = seed
      var i = 1
      var live = true
      while (live && i <= steps) {
        adj.get(node) match {
          case None => live = false
          case Some((cand, ow)) =>
            val d = md5Draw(seed, i, ow)
            node = cand.find(c => d >= c._2 && d < c._3).get._1
            buf += ((seed, i.toLong, node))
            i += 1
        }
      }
      buf.toSeq
    }
    val expected = Seq(1L, 2L, 3L).flatMap(replay(_, 3)).toSet
    val a = Graph.randomWalks(e, steps = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(a == expected, s"missing=${expected -- a} extra=${a -- expected}")
    // walk 3 is seeded at a sink: exactly its step-0 row exists
    assert(a.count(_._1 == 3L) == 1)
    val b = Graph.randomWalks(e.repartition(7), steps = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(a == b)
  }

  test("pageRank is partitioning-invariant and bounded below by teleport " +
    "(exact integer arithmetic end to end)") {
    val e = (1L to 40L).map(i => (i % 10, (i * 7) % 10, 1L + i % 3))
      .toDF("src", "dst", "w")
      .groupBy("src", "dst").agg(sum("w").as("w"))
    val a = Graph.pageRank(e.repartition(1), iters = 4)
      .as[(Long, Long)].collect().toMap
    val b = Graph.pageRank(e.repartition(13), iters = 4)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
    assert(a.values.forall(_ >= 150000L))
    // truncating division only LOSES mass: total never exceeds N * scale
    assert(a.values.sum <= a.size * 1000000L)
  }

  test("pageRank danglingRedistribute: hand-computed 2-node micros — the " +
    "sink's mass returns as D div N each iteration") {
    // a -> b only; b is dangling. Iter 1: D = 1e6, D div 2 = 500000;
    // r(a) = 150000 + 85% * 500000 = 575000,
    // r(b) = 150000 + 85% * (1000000 + 500000) = 1425000.
    // Iter 2: D = 1425000, D div 2 = 712500;
    // r(a) = 150000 + 85% * 712500 = 755625,
    // r(b) = 150000 + 85% * (575000 + 712500) = 1244375.
    val r = Graph.pageRank(edges((1L, 2L, 1L)), iters = 2,
      danglingRedistribute = true).as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 755625L, 2L -> 1244375L))
    // these particular divisions are exact: mass conserves to the micro
    assert(r.values.sum == 2000000L)
  }

  test("pageRank danglingRedistribute conserves total mass within the " +
    "truncation envelope (< |E| + 2|V| micros lost per iteration)") {
    // drop all out-edges of nodes ≡ 0 (mod 3); dst = 7i+1 lands on the
    // dropped class for i ≡ 2 (mod 3), so REAL dangling nodes exist
    // (plain 7i would keep multiples of 3 unreachable and dangling-free)
    val e = (1L to 60L).map(i => (i % 12, (i * 7 + 1) % 12, 1L + i % 4))
      .toDF("src", "dst", "w")
      .filter(col("src") % 3 =!= 0)
      .groupBy("src", "dst").agg(sum("w").as("w"))
    val iters = 4
    val r = Graph.pageRank(e, iters = iters, danglingRedistribute = true)
      .as[(Long, Long)].collect().toMap
    val nV = r.size.toLong
    val nE = e.count()
    val total = r.values.sum
    assert(total <= nV * 1000000L,
      s"mass grew: $total > ${nV * 1000000L}")
    assert(total >= nV * 1000000L - iters * (nE + 2 * nV),
      s"lost more than the envelope: $total vs ${nV * 1000000L}")
    // and it conserves STRICTLY more mass than the absorbing default
    val abs = Graph.pageRank(e, iters = iters)
      .as[(Long, Long)].collect().toMap
    assert(abs.values.sum < total)
    // partitioning-invariant, like the default path
    val r13 = Graph.pageRank(e.repartition(13), iters = iters,
      danglingRedistribute = true).as[(Long, Long)].collect().toMap
    assert(r13 == r)
  }

  test("labelPropagation: seeds clamp, a chain saturates to its seed, " +
    "and a contested node takes the weighted in-neighbor mean") {
    // 0 (good, 1e6) -> 1 <- 3 (spam, 0) with weights 1 and 3: node 1 =
    // (1e6*1 + 0*3) div 4 = 250000 at the fixpoint; 1 -> 2 saturates 2
    // to node 1's score one iteration later
    val e = edges((0L, 1L, 1L), (3L, 1L, 3L), (1L, 2L, 1L))
    val seeds = Seq((0L, 1000000L), (3L, 0L)).toDF("node", "label")
    val r = Graph.labelPropagation(e, seeds, iters = 5)
      .select("node", "score_micros").as[(Long, Long)].collect().toMap
    assert(r == Map(0L -> 1000000L, 3L -> 0L, 1L -> 250000L,
      2L -> 250000L))
  }

  test("labelPropagation: a seed with in-edges still clamps; an " +
    "in-edge-free unlabeled node keeps the prior; scores stay in " +
    "[0, 1e6]; partitioning-invariant") {
    // 1 -> 0 pushes spamward mass INTO the good seed: 0 must stay 1e6.
    // node 4 -> 5: 4 has no in-edges and no label -> holds prior 500000.
    val e = edges((1L, 0L, 1L), (0L, 1L, 1L), (4L, 5L, 1L))
    val seeds = Seq((0L, 1000000L)).toDF("node", "label")
    val r = Graph.labelPropagation(e, seeds, iters = 6)
      .select("node", "score_micros").as[(Long, Long)].collect().toMap
    assert(r(0L) == 1000000L)
    assert(r(1L) == 1000000L) // only in-neighbor is the good seed
    assert(r(4L) == 500000L)
    assert(r(5L) == 500000L)
    assert(r.values.forall(v => v >= 0L && v <= 1000000L))
    val r13 = Graph.labelPropagation(e.repartition(13), seeds, iters = 6)
      .select("node", "score_micros").as[(Long, Long)].collect().toMap
    assert(r13 == r)
  }

  test("pageRank danglingRedistribute: no dangling nodes ⇒ identical to " +
    "the default path (D = 0 every iteration)") {
    val e = edges((1L, 2L, 1L), (2L, 3L, 2L), (3L, 1L, 1L))
    val a = Graph.pageRank(e, iters = 3).as[(Long, Long)].collect().toMap
    val b = Graph.pageRank(e, iters = 3, danglingRedistribute = true)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("neighborhoodFunction: path graph counts cumulative h-hop pairs " +
    "exactly and saturates at the diameter; self-loops and duplicate " +
    "edges never inflate the card") {
    val e = edges((1L, 2L, 1L), (1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L),
      (1L, 1L, 1L))
    val got = Graph.neighborhoodFunction(e, maxHops = 4)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 4L, 1L -> 7L, 2L -> 9L, 3L -> 10L,
      4L -> 10L), got)
  }

  test("scc: two 2-cycles joined one-way stay separate components, a " +
    "DAG tail is all singletons, and self-loops don't mint components") {
    // 1<->2, 3<->4 with 2->3 (one-way bridge: NOT merged);
    // chain 10->11->12 all singleton; 7->7 self-loop drops out entirely
    val e = edges((1L, 2L, 1L), (2L, 1L, 1L), (3L, 4L, 1L), (4L, 3L, 1L),
      (2L, 3L, 1L), (10L, 11L, 1L), (11L, 12L, 1L), (7L, 7L, 1L))
    val got = Graph.scc(e).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L,
      10L -> 10L, 11L -> 11L, 12L -> 12L), got)
  }

  test("scc: multi-round resolution — a component whose backward reach " +
    "passes through an earlier-resolved singleton still gets ITS OWN " +
    "min id, never the removed node's") {
    // 0 -> 4 -> 5<->6: round 1 resolves only 0 (f=b=0); 4 resolves in
    // round 2, the 5<->6 cycle in round 3 — and 5's component id is 5,
    // not 0 or 4 (removal soundness, the Fleischer partition argument)
    val e = edges((0L, 4L, 1L), (4L, 5L, 1L), (5L, 6L, 1L), (6L, 5L, 1L))
    val got = Graph.scc(e).as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 0L, 4L -> 4L, 5L -> 5L, 6L -> 5L), got)
  }

  test("hyperAnf error band vs the exact neighborhood function on the " +
    "sf0.001 transition graph: every hop within 20% relative error " +
    "(HLL m=32 sigma is ~18%; measured max 11% on this realization), " +
    "estimates monotone-adjacent to the exact curve's shape") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val edgesDf = Graph.transitionEdges(ev, "user_id", "event_id",
      graft.ops.Events.jsonField(col("props"), "$.k"))
    val exact = Graph.neighborhoodFunction(edgesDf, 4)
      .as[(Long, Long)].collect().toMap
    val est = Graph.hyperAnf(edgesDf, 4)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(est.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    est.foreach { case (h, _, em) =>
      val rel = math.abs(em / 1e6 - exact(h)) / exact(h)
      assert(rel <= 0.20, f"hop $h: est=${em / 1e6}%.1f " +
        f"exact=${exact(h)} relerr=$rel%.3f")
    }
    // h=0 is the reflexive count: the HLL estimate of {self} per node
    // sums to ~n_nodes (small-range linear counting regime)
    val n = est.head._2
    assert(math.abs(est.head._3 / 1e6 - n) / n <= 0.05)
  }

  test("kTruss: a K5 with a pendant triangle peels to exactly the K5 at " +
    "k = 4 (every surviving edge supported by 3 triangles), and the " +
    "truss nodes sit inside the (k-1)-core (containment theorem)") {
    // K5 on 0..4; pendant triangle 4-5-6 shares only vertex 4
    val k5 = for (i <- 0L to 4L; j <- (i + 1) to 4L) yield (i, j, 1L)
    val pend = Seq((4L, 5L, 1L), (4L, 6L, 1L), (5L, 6L, 1L))
    val e = edges((k5 ++ pend): _*)
    val got = Graph.kTruss(e, k = 4, rounds = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == k5.map { case (a, b, _) => (a, b, 3L) }.toSet, got)
    // containment: every truss node has coreness >= k-1 = 3
    val core = Graph.coreness(e, iters = 8)
      .as[(Long, Long)].collect().toMap
    got.flatMap(t => Seq(t._1, t._2)).foreach { n =>
      assert(core(n) >= 3L, s"node $n coreness ${core(n)}")
    }
  }

  test("kTruss peeling actually CASCADES: an edge whose support is " +
    "sufficient on the raw graph but collapses after round 1's " +
    "removals falls in round 2") {
    // K4 on 0..3; 4 joined to 2,3; 5 joined to 3,4. At k=4 (support
    // >= 2): (3,5),(4,5) have support 1 -> fall round 1; that drops
    // (3,4) from support 2 to 1 -> falls round 2; K4 remains.
    val e = edges((0L, 1L, 1L), (0L, 2L, 1L), (0L, 3L, 1L), (1L, 2L, 1L),
      (1L, 3L, 1L), (2L, 3L, 1L), (2L, 4L, 1L), (3L, 4L, 1L),
      (3L, 5L, 1L), (4L, 5L, 1L))
    val converged = Graph.kTruss(e, k = 4, rounds = 3)
      .as[(Long, Long, Long)].collect().toSet
    val k4 = Set((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L),
      (2L, 3L)).map { case (a, b) => (a, b, 2L) }
    assert(converged == k4, converged)
    // one round is NOT enough: (3,4) still present after round 1
    val oneRound = Graph.kTruss(e, k = 4, rounds = 1)
      .select(col("a"), col("b")).as[(Long, Long)].collect().toSet
    assert(oneRound.contains((3L, 4L)), oneRound)

    // convergence telemetry over the same cascade: rounds 1 and 2 end
    // on a wet round (the card says "raise rounds"), round 3 is dry —
    // and a dry round is a fixpoint, so converged pins the contract
    def conv(r: Int) = Graph.peelConvergence(e, k = 4, rounds = r)
      .as[(Long, Long, Long, Long, Long, Boolean)].collect().head
    assert(conv(1) == ((4L, 1L, 10L, 7L, 3L, false)), conv(1))
    assert(conv(2) == ((4L, 2L, 10L, 6L, 1L, false)), conv(2))
    assert(conv(3) == ((4L, 3L, 10L, 6L, 0L, true)), conv(3))
  }

  test("clusteringCard: a hub star with one closed wedge makes the two " +
    "measures diverge exactly as hand-computed (wedge-weighted " +
    "transitivity low, node-weighted mean local high)") {
    // star 0-{1..5} plus edge (1,2): one triangle (0,1,2).
    // node 0: deg 5, wedges 10, tri 1 -> c = 100000
    // nodes 1,2: deg 2, wedge 1, tri 1 -> c = 1e6; leaves: no wedge
    val e = edges((0L, 1L, 1L), (0L, 2L, 1L), (0L, 3L, 1L),
      (0L, 4L, 1L), (0L, 5L, 1L), (1L, 2L, 1L))
    val got = Graph.clusteringCard(e)
      .as[(Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect().head
    // transitivity = (1e6·3) div 12 = 250000;
    // mean local = (100000 + 1e6 + 1e6) div 3 = 700000
    assert(got == ((6L, 3L, 12L, 3L, Some(250000L), Some(700000L))),
      got)
  }

  test("trussCommunities: a bridge between a K5 and a K4 peels away, " +
    "leaving two community cores with min-id labels and exact sizes") {
    val k5 = for (i <- 0L to 4L; j <- (i + 1) to 4L) yield (i, j, 1L)
    val k4 = for (i <- 10L to 13L; j <- (i + 1) to 13L) yield (i, j, 1L)
    val bridge = Seq((4L, 10L, 1L)) // support 0: falls in round 1
    val got = Graph.trussCommunities(edges((k5 ++ k4 ++ bridge): _*),
        k = 4, rounds = 3)
      .as[(Long, Long, Long)].collect().toSet
    val want = (0L to 4L).map(n => (n, 0L, 5L)).toSet ++
      (10L to 13L).map(n => (n, 10L, 4L)).toSet
    assert(got == want, got)
  }

  test("trussHierarchy: K5 edges reach trussness 5, a pendant triangle " +
    "ranks 3, a dangling edge ranks 2 (the definitional floor)") {
    val k5 = for (i <- 0L to 4L; j <- (i + 1) to 4L) yield (i, j, 1L)
    val pend = Seq((4L, 5L, 1L), (4L, 6L, 1L), (5L, 6L, 1L))
    val dangle = Seq((6L, 7L, 1L))
    val got = Graph.trussHierarchy(edges((k5 ++ pend ++ dangle): _*),
        maxK = 5, rounds = 3)
      .as[(Long, Long, Long)].collect().toSet
    val want = k5.map { case (a, b, _) => (a, b, 5L) }.toSet ++
      pend.map { case (a, b, _) => (a, b, 3L) }.toSet +
      ((6L, 7L, 2L))
    assert(got == want, got)
  }

  test("hyperAnf on an empty edge relation returns zero-card hop rows " +
    "(sum over no nodes is coalesced, not an NPE)") {
    val e = spark.emptyDataset[(Long, Long, Long)]
      .toDF("src", "dst", "weight")
    val got = Graph.hyperAnf(e, 2).as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(got.toSeq == Seq((0L, 0L, 0L), (1L, 0L, 0L), (2L, 0L, 0L)),
      got.toSeq)
  }

  test("richClub: triangle hub with leaves — phi = 1.0 at every bar " +
    "that keeps >= 2 hubs, NULL once only one node survives " +
    "(hand-computed)") {
    // clique {1,2,3} plus leaves: deg 1:4, 2:3, 3:2, leaves 1
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (1L, 10L), (1L, 11L), (2L, 12L)).toDF("src", "dst")
    val got = Graph.richClub(e, ks = Seq(1L, 2L, 3L))
      .as[(Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 3L, 3L, Some(1000000L))), got(1L))
    assert(got(2L) == ((2L, 2L, 1L, Some(1000000L))), got(2L))
    assert(got(3L) == ((3L, 1L, 0L, None)), got(3L))
  }
}
