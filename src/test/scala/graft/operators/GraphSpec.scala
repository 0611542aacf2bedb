package graft.operators

import scala.util.Random

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side union-find ground truth (path compression). */
  private def bruteCC(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // one more pass so every root is the MIN of its component
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, ns) =>
      val m = ns.min; ns.map(_ -> m)
    }.toMap
  }

  private def run(edges: Seq[(Long, Long)], maxIter: Int = 25): Map[Long, Long] =
    Graph.connectedComponents(edges.toDF("src", "dst"), "src", "dst", maxIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("random graphs match driver-side union-find") {
    val rnd = new Random(42)
    for (trial <- 0 until 5) {
      val n = 40 + trial * 10
      val m = n * (trial + 1) / 2
      val edges = Seq.fill(m)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      assert(run(edges) === bruteCC(edges), s"trial $trial")
    }
  }

  test("seeded sweep over graph shapes: sparse/dense/stars/paths mixtures") {
    // the star-contraction fixpoint argument is the algorithmically
    // riskiest part of the engine — sweep many structures against the
    // union-find oracle (chains favor depth, cliques favor width,
    // sparse graphs leave many singleton-adjacent pairs)
    val rnd = new Random(20260812L)
    for (trial <- 0 until 8) {
      val n = 10 + rnd.nextInt(60)
      val density = (trial % 4) match {
        case 0 => 0.5   // sparse: forest-ish
        case 1 => 1.0   // near the connectivity threshold
        case 2 => 2.5   // several big components
        case _ => 0.2   // mostly isolated edges
      }
      val m = math.max(1, (n * density).toInt)
      val ids = Array.fill(n)(rnd.nextLong().abs % 1000000L)
      val edges = Seq.fill(m)(
        (ids(rnd.nextInt(n)), ids(rnd.nextInt(n))))
        .filter(e => e._1 != e._2)
      if (edges.nonEmpty)
        assert(run(edges) === bruteCC(edges),
          s"trial $trial n=$n m=$m")
    }
  }

  test("chain graph (worst case for naive propagation) converges in O(log n) rounds") {
    val edges = (0L until 63L).map(i => (i, i + 1))
    // naive min-propagation needs 63 rounds; star-contraction must do
    // it well inside 25 (paper bound ~ log2(64) + slack)
    val got = run(edges, maxIter = 25)
    assert(got === (0L to 63L).map(_ -> 0L).toMap)
  }

  test("two components with interleaved ids stay separate") {
    val a = Seq((0L, 2L), (2L, 4L), (4L, 6L))
    val b = Seq((1L, 3L), (3L, 5L))
    val got = run(a ++ b)
    assert(got === Map(0L -> 0L, 2L -> 0L, 4L -> 0L, 6L -> 0L,
      1L -> 1L, 3L -> 1L, 5L -> 1L))
  }

  test("self-loops and duplicate/reversed edges are ignored") {
    val edges = Seq((5L, 5L), (1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L))
    val got = run(edges)
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("empty edge list yields empty mapping") {
    assert(run(Seq.empty[(Long, Long)]) === Map.empty)
  }

  test("already-star input is a fixpoint") {
    val edges = Seq((0L, 7L), (0L, 8L), (0L, 9L))
    assert(run(edges, maxIter = 3) ===
      Map(0L -> 0L, 7L -> 0L, 8L -> 0L, 9L -> 0L))
  }

  private def ranks(edges: Seq[(Long, Long)], iters: Int = 5): Map[Long, Long] =
    Graph.pageRank(edges.toDF("s", "d"), "s", "d", iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("pageRank: the hub of a star outranks every leaf") {
    val r = ranks(Seq((1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L)))
    assert(Seq(10L, 11L, 12L, 13L).forall(l => r(1L) > r(l)))
    // leaves are symmetric → identical fixed-point ranks, exactly
    assert(Seq(11L, 12L, 13L).forall(l => r(l) === r(10L)))
  }

  test("pageRank: mass stays bounded by the seed scale and is deterministic") {
    val rnd = new Random(7)
    val edges = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2)
    val r1 = ranks(edges)
    val r2 = ranks(edges)
    assert(r1 === r2, "fixed-point ranks must be run-to-run identical")
    assert(r1.values.sum <= 1000000000000L)
    assert(r1.values.forall(_ > 0))
  }

  test("pageRank: a cycle is perfectly symmetric") {
    val cycle = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
    val r = ranks(cycle)
    assert(r.values.toSet.size === 1, s"cycle ranks diverged: $r")
  }

  test("pageRank: more in-links means more rank on a directed chain source") {
    // node 5 referenced by 3 others; node 6 by 1 — after symmetrization
    // degree still favors 5
    val r = ranks(Seq((1L, 5L), (2L, 5L), (3L, 5L), (4L, 6L)))
    assert(r(5L) > r(6L))
  }

  // ----- triangleStats ---------------------------------------------------

  private def triStats(edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Long)] =
    Graph.triangleStats(edges.toDF("src", "dst"), "src", "dst")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  /** Driver-side brute force: all C(n,3) corner checks. */
  private def bruteTriangles(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val e = edges.filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).distinct.toSet
    val nodes = e.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
    def adj(a: Long, b: Long) = e((math.min(a, b), math.max(a, b)))
    val tri = scala.collection.mutable.Map[Long, Long]()
      .withDefaultValue(0L)
    for {
      i <- nodes.indices; j <- i + 1 until nodes.size
      k <- j + 1 until nodes.size
      if adj(nodes(i), nodes(j)) && adj(nodes(j), nodes(k)) &&
        adj(nodes(i), nodes(k))
    } { tri(nodes(i)) += 1; tri(nodes(j)) += 1; tri(nodes(k)) += 1 }
    nodes.map(n => n -> tri(n)).toMap
  }

  test("triangleStats: K4 — every node in 3 triangles, lcc = 1") {
    val k4 = for (a <- 0L to 3L; b <- a + 1 to 3L) yield (a, b)
    val r = triStats(k4)
    (0L to 3L).foreach { n =>
      assert(r(n) === ((3L, 3L, 1000000L)), s"node $n: ${r(n)}")
    }
  }

  test("triangleStats: a path has no triangles, lcc 0") {
    val r = triStats(Seq((0L, 1L), (1L, 2L), (2L, 3L)))
    assert(r.values.forall(v => v._2 == 0L && v._3 == 0L))
    assert(r(1L)._1 === 2L)
  }

  test("triangleStats: random graphs match driver-side brute force") {
    val rnd = new Random(11)
    for (trial <- 0 until 4) {
      val n = 15 + 5 * trial
      val edges = Seq.fill(n * 3)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val want = bruteTriangles(edges)
      val got = triStats(edges)
      assert(got.keySet === want.keySet)
      want.foreach { case (node, tri) =>
        assert(got(node)._2 === tri, s"trial $trial node $node")
      }
      // duplicate / reversed edges must not change anything
      val noisy = edges ++ edges.map(_.swap)
      assert(triStats(noisy) === got, s"trial $trial: not canonicalized")
    }
  }

  // ----- labelPropagation ------------------------------------------------

  private def lpa(edges: Seq[(Long, Long)], rounds: Int = 4): Map[Long, Long] =
    Graph.labelPropagation(edges.toDF("src", "dst"), "src", "dst", rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Driver-side replay of the exact synchronous self-vote dynamics. */
  private def bruteLpa(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val sym = edges.filter(p => p._1 != p._2)
      .flatMap(p => Seq(p, p.swap)).distinct
    val nbrs = sym.groupBy(_._1).map { case (u, es) => u -> es.map(_._2) }
    var lab = nbrs.keys.map(n => n -> n).toMap
    for (_ <- 0 until rounds) {
      lab = lab.map { case (n, l) =>
        val votes = (l +: nbrs(n).map(lab)).groupBy(identity)
          .map { case (cand, vs) => (cand, vs.size) }
        val best = votes.toSeq.minBy { case (cand, c) => (-c, cand) }._1
        n -> best
      }
    }
    lab
  }

  test("labelPropagation: chains converge to the component minimum") {
    // two 3-chains + a 2-chain, exactly the planted dup graph's shapes
    val edges = Seq((10L, 20L), (20L, 30L), (40L, 50L), (50L, 60L),
      (70L, 80L))
    val r = lpa(edges)
    assert(r === Map(10L -> 10L, 20L -> 10L, 30L -> 10L,
      40L -> 40L, 50L -> 40L, 60L -> 40L, 70L -> 70L, 80L -> 70L))
  }

  test("labelPropagation: random graphs replay the driver-side dynamics") {
    val rnd = new Random(23)
    for (trial <- 0 until 4) {
      val n = 20 + 10 * trial
      val edges = Seq.fill(n)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(p => p._1 != p._2)
      val rounds = 3 + trial
      assert(lpa(edges, rounds) === bruteLpa(edges, rounds),
        s"trial $trial diverged from the synchronous reference")
    }
  }

  // ----- incrementalCC ---------------------------------------------------

  private def incr(oldEdges: Seq[(Long, Long)], batch: Seq[(Long, Long)],
      extraNodes: Seq[Long] = Nil): Map[Long, Long] = {
    val full = run(oldEdges)
    val nodes = (oldEdges.flatMap(e => Seq(e._1, e._2)) ++ extraNodes).distinct
    val snapshot = nodes.map(n => (n, full.getOrElse(n, n)))
      .toDF("node", "component")
    Graph.incrementalCC(snapshot, "node", "component",
        batch.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("incrementalCC: batch merge equals full recompute on random splits") {
    val rnd = new Random(41)
    for (trial <- 0 until 5) {
      val n = 50 + 10 * trial
      val all = Seq.fill(n)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      val (old, batch) = all.partition(_ => rnd.nextBoolean())
      val got = incr(old, batch)
      val want = bruteCC(all)
      // every node of the full graph must carry the full-recompute label
      want.foreach { case (node, comp) =>
        assert(got(node) === comp, s"trial $trial node $node")
      }
      // old-only nodes untouched by the batch must keep their snapshot label
      val oldLabels = run(old)
      oldLabels.keys.foreach { node =>
        assert(got.contains(node), s"trial $trial lost node $node")
      }
    }
  }

  test("incrementalCC: untouched components keep their labels verbatim") {
    val old = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    val batch = Seq((20L, 21L)) // brand-new component, touches nothing
    val got = incr(old, batch)
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L,
      11L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("incrementalCC: a batch edge can merge two snapshot components") {
    val old = Seq((1L, 2L), (10L, 11L))
    val got = incr(old, Seq((2L, 11L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 10L -> 1L, 11L -> 1L))
  }

  test("incrementalCC: singleton snapshot nodes join batch components") {
    val got = incr(Seq((1L, 2L)), Seq((3L, 4L)), extraNodes = Seq(3L, 5L))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L, 5L -> 5L))
  }

  test("labelPropagation: deterministic across runs") {
    val rnd = new Random(31)
    val edges = Seq.fill(120)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(p => p._1 != p._2)
    assert(lpa(edges) === lpa(edges))
  }

  private def kcore(edges: Seq[(Long, Long)], k: Int,
      rounds: Int): Map[Long, Long] =
    Graph.kCorePeel(edges.toDF("u", "v"), "u", "v", k, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("kCorePeel: K4 is its own 3-core; plus-a-tail loses only the tail") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(kcore(k4, 3, 10) === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    val tailed = k4 :+ ((4L, 5L))
    assert(kcore(tailed, 3, 10) ===
      Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(kcore(tailed, 2, 10) ===
      Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), "2-core also drops the tail")
  }

  test("kCorePeel: round budget is honored on a cascading path") {
    // path 1-2-3-4-5-6, k=2: round 1 peels the ends {1,6}, round 2
    // peels {2,5}, round 3 empties it — the cascade the FIXED round
    // count must reproduce exactly (the oracle unrolls the same rounds)
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    assert(kcore(path, 2, 1) ===
      Map(2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L))
    assert(kcore(path, 2, 2) === Map(3L -> 1L, 4L -> 1L))
    assert(kcore(path, 2, 3) === Map.empty)
    assert(kcore(path, 2, 10) === Map.empty,
      "early-stop after the empty fixpoint changes nothing")
  }

  test("kCorePeel: canonicalizes duplicates, reversals and self-loops") {
    val messy = Seq((2L, 1L), (1L, 2L), (2L, 3L), (3L, 2L), (1L, 3L),
      (3L, 3L))
    assert(kcore(messy, 2, 10) === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kCorePeel: deterministic and type-generic (string nodes)") {
    val e = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"))
    val out = Graph.kCorePeel(e.toDF("u", "v"), "u", "v", 2, 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("a" -> 2L, "b" -> 2L, "c" -> 2L))
  }
}
