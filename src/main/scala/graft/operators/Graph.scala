package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph operators for dedup-cluster resolution.
  *
  * Near-dup detection (MinHash/SimHash/cosine LSH) emits PAIRS; a
  * training-data pipeline then needs each document's CLUSTER so it can
  * keep one canonical doc per group. Pair→cluster is connected
  * components, and at 100 TB the graph (billions of nodes, skewed
  * degree) rules out driver-side union-find — the standard distributed
  * answer is the alternating large-star / small-star algorithm
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC 2014), which converges in O(log n) rounds of pure
  * groupBy+join relational steps.
  *
  * Reference scope note: the reference pipeline
  * (daily_weather_etl_kenya.py) has no graph stage — this operator
  * serves the LLM-data-pipeline surface (SURVEY §2.6) where near-dup
  * pairs must be resolved to canonical representatives.
  */
object Graph {

  /** Canonical undirected edge form: (u, v) with u < v, no self-loops,
    * no duplicates. Node ids must be a numeric orderable type; the
    * component label each node receives is the MINIMUM id in its
    * component (so labels are stable, meaningful and reproducible).
    */
  private def canon(e: DataFrame): DataFrame =
    e.select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()

  /** (edge count, order-independent content checksum) — one cheap pass
    * used as the convergence test between rounds. XOR of the 64-bit
    * edge hashes is order-independent and cannot overflow (a SUM would
    * throw under Spark 4's default ANSI mode); duplicate-cancellation
    * is moot because the input is post-`canon` distinct. Count + xor
    * collide with negligible probability.
    */
  private def signature(e: DataFrame): (Long, Long) = {
    val r = e.select(xxhash64(col("u"), col("v")).as("__h"))
      .agg(count(lit(1)), coalesce(expr("bit_xor(__h)"), lit(0L))).head()
    (r.getLong(0), r.getLong(1))
  }

  /** large-star(u): link every strictly LARGER neighbor of u to the
    * smallest member of u's closed neighborhood. Detaches tall
    * subtrees onto small labels; per the paper this halves component
    * heights geometrically.
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy(col("u")).agg(min(col("v")).as("__mn"))
      .select(col("u").as("__su"),
        least(col("__mn"), col("u")).as("__m"))
    sym.join(mins, col("u") === col("__su"))
      .where(col("v") > col("u"))
      .select(col("v").as("u"), col("__m").as("v"))
  }

  /** small-star(u): link every smaller-or-equal neighbor of u (and u
    * itself) to the smallest of them.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val oriented = e.select(greatest(col("u"), col("v")).as("u"),
      least(col("u"), col("v")).as("v"))
    val mins = oriented.groupBy(col("u")).agg(min(col("v")).as("__m"))
    val relinked = oriented
      .join(mins.select(col("u").as("__su"), col("__m")),
        col("u") === col("__su"))
      .select(col("v").as("u"), col("__m").as("v"))
    val selfLink = mins.select(col("u"), col("__m").as("v"))
    relinked.union(selfLink)
  }

  /** Connected components of the undirected graph given as an edge
    * list. Returns one row per node THAT APPEARS IN AN EDGE:
    * `(node, component)` where `component` is the minimum node id of
    * the node's component. Isolated nodes never enter the edge list —
    * callers union them back with `component = node` (see q55).
    *
    * Scale shape: every round is two groupBy(min)+equi-join passes
    * over the edge list — no driver-side state, no collect, partition
    * count follows `spark.sql.shuffle.partitions`. `localCheckpoint`
    * truncates the per-iteration lineage so the plan does not grow
    * exponentially across rounds (on a real cluster with an HDFS
    * checkpoint dir, `checkpoint()` would also survive executor loss;
    * local mode has no reliable storage, so the local variant is used).
    * Rounds needed: O(log n) with high probability; `maxIter` is a
    * guard against adversarial inputs, and hitting it raises rather
    * than returning a silently-unconverged labeling.
    */
  def connectedComponents(edges: DataFrame, srcCol: String,
      dstCol: String, maxIter: Int = 25): DataFrame = {
    var e = canon(edges.select(col(srcCol).as("u"), col(dstCol).as("v")))
      .localCheckpoint()
    var sig = signature(e)
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxIter) {
      val next = canon(smallStar(largeStar(e))).localCheckpoint()
      val nsig = signature(next)
      converged = nsig == sig
      sig = nsig
      e = next
      rounds += 1
    }
    require(converged,
      s"connectedComponents did not converge in $maxIter rounds")
    // The fixpoint is a star forest in canonical (min, child) form:
    // u = component root (minimum id), v = member.
    e.select(col("v").as("node"), col("u").as("component"))
      .union(e.select(col("u").as("node"), col("u").as("component"))
        .distinct())
  }

  /** Fixed-iteration PageRank over the UNDIRECTED (symmetrized) graph
    * given as an edge list — the standard importance measure over the
    * entity/link graphs a data pipeline accumulates (citation, co-click,
    * similarity). Iterative relational shape, the link-analysis
    * companion to [[connectedComponents]]: per round ONE equi-join of
    * the degree-annotated edge list against the rank vector and one
    * groupBy(dst) sum — no driver-side graph state; the edge list is
    * `localCheckpoint`ed once (it is consumed every round) and the rank
    * vector's lineage is truncated per round exactly as in CC.
    *
    * Determinism contract (the q58 pattern): rank mass is integer
    * micro-units (SCALE = 1e12 split evenly at start), and every
    * per-round step is either exact 64-bit integer arithmetic (sums) or
    * a correctly-rounded IEEE double op (`FLOOR(r/deg)`,
    * `FLOOR(d*m/100)`, operands all < 2^53) — so any engine replaying
    * the same ops reproduces every rank bit-for-bit, with no
    * order-dependent float accumulation. Symmetrization means no
    * dangling nodes (every node has degree >= 1), so no redistribution
    * term is needed; total mass decays slightly through the floors,
    * which is fine for a RANKING signal and keeps every step exact.
    *
    * Returns one row per node that appears in an edge:
    * `(node, rank_fp)` with `rank_fp` the micro-unit rank after
    * `iterations` rounds of damping `dampingPct`/100.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 5, dampingPct: Int = 85): DataFrame = {
    val e0 = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .where(col("u") =!= col("v"))
    val sym = e0.union(e0.select(col("v").as("u"), col("u").as("v")))
      .distinct()
    val deg = sym.groupBy(col("u")).agg(count(lit(1)).as("d"))
    // Degree-annotated edges and the node set, each materialized once:
    // both are consumed every round.
    val ewd = sym.join(deg, Seq("u")).localCheckpoint()
    val nodes = deg.select(col("u").as("id")).localCheckpoint()
    // Node count: a single-row aggregate (bounded driver scalar, same
    // class as the IVF centroid collects). The seed and teleport terms
    // replay the oracle's double-division-then-floor exactly.
    val n = nodes.count()
    require(n > 0, "pageRank needs at least one edge")
    val scale = 1000000000000L
    val base = math.floor(scale.toDouble / n).toLong
    val teleport =
      math.floor((100 - dampingPct).toDouble * base / 100).toLong
    var r = nodes.select(col("id"), lit(base).as("r"))
    for (i <- 0 until iterations) {
      val contrib = ewd
        .join(r, col("u") === col("id"))
        .select(col("v"),
          floor(col("r").cast("double") / col("d")).cast("long").as("__c"))
        .groupBy(col("v")).agg(sum(col("__c")).as("__m"))
      r = nodes
        .join(contrib, col("id") === col("v"), "left")
        .select(col("id"),
          (lit(teleport) +
            floor(lit(dampingPct).cast("double")
              * coalesce(col("__m"), lit(0L)) / 100).cast("long")).as("r"))
      // Each round references the previous rank vector exactly once, so
      // the LAZY chain executes every round's join+aggregate exactly
      // once in a single job — per-round eager checkpoints (the CC
      // pattern) cost `iterations` extra materializations and buy
      // nothing for a fixed small round count (a modest ~7% at sf0.1;
      // the principle matters more at cluster scale, where each extra
      // materialization is a full write+read of the rank vector).
      // Lineage is still truncated every 3 rounds so plan size stays
      // bounded if a caller asks for many iterations.
      if ((i + 1) % 3 == 0 && i + 1 < iterations) r = r.localCheckpoint()
    }
    r.select(col("id").as("node"), col("r").as("rank_fp"))
  }
}
