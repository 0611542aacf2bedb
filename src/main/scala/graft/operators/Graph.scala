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
    // LAZY localCheckpoint (r10): the signature aggregate is the
    // round's one action and MATERIALIZES the checkpoint as a side
    // effect — one Spark job per round instead of two (the eager
    // checkpoint ran a dedicated materialization job, then signature
    // re-read the cache; measured as half of q119's incremental-fold
    // job count). Lineage truncation is identical once materialized.
    var e = canon(edges.select(col(srcCol).as("u"), col(dstCol).as("v")))
      .localCheckpoint(eager = false)
    var sig = signature(e)
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxIter) {
      val next = canon(smallStar(largeStar(e)))
        .localCheckpoint(eager = false)
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
    // both are consumed every round. PRE-PARTITIONED on their join keys
    // before the checkpoint (LogicalRDD preserves the partitioning), so
    // every round's join shuffles ONLY the rank vector — the static
    // edge side never re-exchanges and never re-broadcasts (r8 stall
    // frames showed the driver re-running SizeEstimator on the degree
    // table each first-run round). The explicit shuffle_hash hint keeps
    // AQE from demoting to broadcast at small SFs: at 100 TB neither
    // side of edges ⋈ ranks is broadcastable, so the bench must
    // exercise the shuffled shape.
    // SERIALIZED checkpoint blocks: deserialized block storage walks
    // every cached object graph with SizeEstimator on the driver-side
    // accounting path — measured as the dominant first-run stall frames
    // at sf0.1. Serialized blocks have exact byte sizes for free.
    val ser = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
    val ewd = sym.join(deg, Seq("u"))
      .repartition(col("u")).localCheckpoint(true, ser)
    val nodes = deg.select(col("u").as("id"))
      .repartition(col("id")).localCheckpoint(true, ser)
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
      val contrib = ewd.hint("shuffle_hash")
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
      if ((i + 1) % 3 == 0 && i + 1 < iterations)
        r = r.localCheckpoint(true, ser)
    }
    r.select(col("id").as("node"), col("r").as("rank_fp"))
  }

  /** Per-node triangle participation + local clustering coefficient of
    * the undirected graph given as an edge list — the structural
    * cohesion signal over co-occurrence / similarity graphs (language
    * co-occurrence networks are the canonical instance: bounded
    * vocabulary, Zipf-skewed degrees).
    *
    * Scale shape — degree-ordered orientation (the standard distributed
    * formulation, e.g. Suri & Vassilvitskii, WWW 2011): every edge is
    * directed from its lower-(degree, id) endpoint to the higher one,
    * so a node's OUT-degree is bounded by O(sqrt(m)) regardless of its
    * raw degree, and the wedge self-join — the only super-linear step —
    * enumerates each triangle exactly once from its lowest-ranked
    * corner instead of fanning out on hubs. Everything is equi-joins
    * and hash aggregates; no cross product, no driver state.
    *
    * Returns one row per node that appears in an edge:
    * `(node, degree, triangles, lcc_fp)` where `lcc_fp` is the local
    * clustering coefficient `2*triangles / (degree*(degree-1))` in
    * fixed-point millionths — degree and triangle counts are exact
    * int64 and the coefficient is ONE correctly-rounded IEEE double
    * divide + floor, so any engine replaying the ops agrees bit-for-bit.
    */
  def triangleStats(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val e = canon(edges.select(col(srcCol).as("u"), col(dstCol).as("v")))
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val deg = sym.groupBy(col("u")).agg(count(lit(1)).as("d"))
    val du = deg.select(col("u").as("__ku"), col("d").as("__du"))
    val dv = deg.select(col("u").as("__kv"), col("d").as("__dv"))
    val ranked = e.join(du, col("u") === col("__ku"))
      .join(dv, col("v") === col("__kv"))
    // Orient low-(deg, id) → high-(deg, id); carry the head's rank so
    // the wedge join can order the two heads without re-joining degrees.
    val uLow = col("__du") < col("__dv") ||
      (col("__du") === col("__dv") && col("u") < col("v"))
    val oriented = ranked.select(
        when(uLow, col("u")).otherwise(col("v")).as("s"),
        when(uLow, col("v")).otherwise(col("u")).as("t"),
        when(uLow, col("__dv")).otherwise(col("__du")).as("dt"))
      .localCheckpoint() // consumed twice: wedge sides + closing probe
    val l = oriented.select(col("s").as("ls"), col("t").as("lt"),
      col("dt").as("ldt"))
    val r = oriented.select(col("s").as("rs"), col("t").as("rt"),
      col("dt").as("rdt"))
    val wedges = l.join(r, col("ls") === col("rs") &&
      (col("ldt") < col("rdt") ||
        (col("ldt") === col("rdt") && col("lt") < col("rt"))))
    val closing = oriented.select(col("s").as("cs"), col("t").as("ct"))
    val tris = wedges.join(closing,
      col("lt") === col("cs") && col("rt") === col("ct"))
    val corners = tris.select(explode(array(col("ls"), col("lt"),
      col("rt"))).as("u"))
      .groupBy(col("u")).agg(count(lit(1)).as("__tri"))
    deg.join(corners, Seq("u"), "left")
      .select(col("u").as("node"), col("d").as("degree"),
        coalesce(col("__tri"), lit(0L)).as("triangles"),
        when(col("d") >= 2,
          floor(lit(1000000.0) *
            (lit(2.0) * coalesce(col("__tri"), lit(0L)).cast("double")) /
            (col("d") * (col("d") - 1)).cast("double")).cast("long"))
          .otherwise(lit(0L)).as("lcc_fp"))
  }

  /** Incremental connected components: fold a batch of NEW edges into
    * an existing `(node, component)` labeling without re-reading the
    * historical pair stream — the update path of a persistent dedup
    * cluster store (q55 resolves a full pair set; a daily pipeline gets
    * a small batch of new near-dup pairs against billions of already-
    * labeled docs and must not rescan them).
    *
    * The insight that makes it cheap: a component labeling IS a
    * two-level star forest, so the stored state (node → component
    * edges) is an exact, maximally-flattened compression of all
    * history; new edges only perturb the components they touch. Steps,
    * all equi-joins/aggregates: (1) look up the touched components =
    * labels of the batch's endpoints (batch-sized probe of the label
    * store — bucketed storage makes it exchange-free on the stored
    * side); (2) pull ONLY those components' members (semi-join);
    * (3) run [[connectedComponents]] over affected star edges + batch
    * edges (input ~ |affected| + |batch|, converges in O(1) rounds on
    * star-plus-batch shapes); (4) splice the relabeled affected set
    * over the untouched labels (anti-join + union). Unaffected
    * components are never rewritten.
    *
    * Returns the updated full labeling `(node, component)`, including
    * brand-new nodes seen only in `newEdges`.
    */
  def incrementalCC(labels: DataFrame, nodeCol: String, compCol: String,
      newEdges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    incrementalCCDetailed(labels, nodeCol, compCol, newEdges, srcCol,
      dstCol).updated

  /** [[incrementalCC]] plus the intermediate views a label STORE needs
    * for a partial rewrite: `touched` = old component ids perturbed by
    * the batch, `delta` = the rows whose labels are new or changed
    * (relabeled affected members + brand-new isolated nodes).
    */
  final case class IncrementalCC(updated: DataFrame, touched: DataFrame,
    delta: DataFrame)

  def incrementalCCDetailed(labels: DataFrame, nodeCol: String,
      compCol: String, newEdges: DataFrame, srcCol: String,
      dstCol: String): IncrementalCC = {
    val lab = labels.select(col(nodeCol).as("node"), col(compCol).as("component"))
    val batch = newEdges.select(col(srcCol).as("u"), col(dstCol).as("v"))
    val endpoints = batch.select(col("u").as("node"))
      .union(batch.select(col("v").as("node"))).distinct()
    val touched = lab.join(endpoints, Seq("node"), "left_semi")
      .select(col("component")).distinct()
    val affected = lab.join(touched, Seq("component"), "left_semi")
    // star edges of the affected components + the batch; CC relabels
    // every member (component ids are component-min, so merged
    // components get the merged min — consistent with a full recompute)
    val starEdges = affected.where(col("node") =!= col("component"))
      .select(col("node").as("u"), col("component").as("v"))
    val relabeled = connectedComponents(starEdges.union(batch), "u", "v")
    // batch nodes that formed no edge after self-loop removal (u == v
    // rows only) keep/get their own label
    val isolated = endpoints
      .join(relabeled.select(col("node")), Seq("node"), "left_anti")
      .join(lab.select(col("node")), Seq("node"), "left_anti")
      .select(col("node"), col("node").as("component"))
    val untouched = lab.join(
      relabeled.select(col("node")), Seq("node"), "left_anti")
    val delta = relabeled.unionByName(isolated)
    IncrementalCC(untouched.unionByName(delta), touched, delta)
  }

  /** Persistent label store with PARTIAL rewrites: labels live as
    * parquet partitioned by `component % parts`, and folding a batch of
    * new edges rewrites ONLY the partitions holding an affected or new
    * component — under dynamic partition overwrite the other
    * partitions' files are never touched (LabelStoreSpec asserts the
    * file listing), which is what makes a daily label-store update at
    * billions of labels a delta-sized job rather than a full-table
    * rewrite. The partition key uses the component id directly (NOT a
    * hash) so any engine — including the DuckDB oracle — can recompute
    * partition membership.
    *
    * Store-side join shape per batch (r10): ONE full scan (the
    * node→component endpoint lookup — the only probe that cannot know
    * its partitions in advance) plus TWO partition-PRUNED scans (member
    * pull over the touched components' home partitions, co-resident
    * ride-along rows over the affected partitions), every probe driven
    * by a batch-derived broadcast — the store is never exchanged, and
    * rewrite cost is ∝ affected partitions, independent of history
    * size.
    */
  /** Manifest carrying the store's layout constants. `parts` decides
    * which `__pb` partition every component lands in — an updater
    * running with a DIFFERENT parts than the writer would scatter rows
    * into the wrong partitions (a silent split-brain the r9 fixed
    * `parts = 16` default made easy to hit). The value is therefore a
    * STORED property (VERDICT r9 item 9): written once by
    * [[writeLabelStore]], read back by every [[updateLabelStore]], and
    * validated against any explicitly passed value. Underscore-prefixed
    * so parquet readers ignore it (the `_SUCCESS` convention).
    */
  private val labelStoreManifest = "_graft_labelstore.json"

  private def writeManifest(spark: org.apache.spark.sql.SparkSession,
      storeDir: String, parts: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(storeDir, labelStoreManifest)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(s"""{"version":1,"parts":$parts}""".getBytes("UTF-8"))
    finally out.close()
  }

  private def readManifestParts(spark: org.apache.spark.sql.SparkSession,
      storeDir: String): Option[Int] = {
    val p = new org.apache.hadoop.fs.Path(storeDir, labelStoreManifest)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    """"parts"\s*:\s*(\d+)""".r.findFirstMatchIn(text).map(_.group(1).toInt)
  }

  /** Fold a batch of edges into the store using the PARTS THE STORE WAS
    * WRITTEN WITH (from the manifest) — the everyday entry point; no
    * layout constant to keep in sync at call sites.
    */
  def updateLabelStore(storeDir: String, newEdges: DataFrame,
      srcCol: String, dstCol: String): Unit = {
    val parts = readManifestParts(newEdges.sparkSession, storeDir)
      .getOrElse(sys.error(
        s"label store $storeDir has no $labelStoreManifest manifest - " +
          "pre-manifest stores must pass parts explicitly once to heal"))
    updateLabelStore(storeDir, newEdges, srcCol, dstCol, parts)
  }

  def updateLabelStore(storeDir: String, newEdges: DataFrame,
      srcCol: String, dstCol: String, parts: Int): Unit = {
    val spark = newEdges.sparkSession
    readManifestParts(spark, storeDir) match {
      case Some(stored) =>
        require(stored == parts,
          s"label store $storeDir was written with parts=$stored; " +
            s"updating with parts=$parts would scatter components into " +
            "wrong partitions")
        graft.StrategyLog.record("labelStore", "adopt",
          s"parts=$parts (manifest match)")
      case None =>
        graft.StrategyLog.record("labelStore", "heal-manifest",
          s"parts=$parts (pre-manifest store)")
        writeManifest(spark, storeDir, parts) // heal pre-r10 store
    }
    // r10 restructure (VERDICT r9 items 7+9): the r9 shape ran FOUR
    // full store scans per batch (endpoint lookup, affected-member
    // pull, old-partition listing, untouched anti-join over the whole
    // table) — rewrite cost grew with HISTORY size, not batch size.
    // The store's own partition key makes three of them prunable: a
    // component's home partition is pmod(component, parts), a pure
    // function of the VALUE, so once the touched components are known
    // (one full scan — the node→component lookup genuinely needs it),
    // every later read lists only affected `__pb=` directories via
    // partition pruning. Per batch: 1 full scan + 2 pruned scans, and
    // every intermediate is batch-neighborhood-sized and checkpointed
    // exactly once.
    val lab = spark.read.parquet(storeDir)
      .select(col("node"), col("component"),
        col("__pb").cast("long").as("__pb"))
    val batch = newEdges.select(col(srcCol).as("u"), col(dstCol).as("v"))
    val endpoints = batch.select(col("u").as("node"))
      .union(batch.select(col("v").as("node"))).distinct()
    // scan 1 (FULL, unavoidable): which stored components does the
    // batch touch, and where do they live. Batch-sized; materialized
    // once — every use below reads the checkpoint, not the store.
    // lazy checkpoints throughout (as in connectedComponents, r10):
    // each is materialized by its first action, so the batch pays one
    // job per intermediate instead of two
    val touched = lab.join(endpoints, Seq("node"), "left_semi")
      .select(col("component"), col("__pb")).distinct()
      .localCheckpoint(eager = false)
    val touchedPb: Set[Long] =
      touched.select(col("__pb")).distinct().collect()
        .map(_.getLong(0)).toSet
    // scan 2 (PRUNED to the touched components' home partitions):
    // pull every member of a touched component. Neighborhood-sized.
    val affectedMembers = lab
      .where(col("__pb").isin(touchedPb.toSeq: _*))
      .join(touched.select(col("component")), Seq("component"),
        "left_semi")
      .localCheckpoint(eager = false)
    // CONTRACTED incremental fold (r10): rewrite each batch endpoint to
    // its current LABEL (new nodes stay themselves) and run CC over the
    // contracted component graph — |touched components| + |batch| nodes
    // instead of every affected MEMBER. The member stars never enter
    // the iterative loop (they re-attach with one equi-join below), so
    // at 100 TB the O(log n) rounds run over a batch-sized graph, and
    // chains THROUGH members vanish (fewer rounds: the r9 shape ran
    // star edges through 3-4 rounds; contracted pairs converge in ~2).
    // Labels stay exact minima: a component id IS the min of its
    // members, so min over {component ids, new node ids} in a merged
    // group is the merged group's global min member id — identical to a
    // full recompute (LabelStoreSpec convergence case pins it).
    val memberLabel = affectedMembers.select(col("node"), col("component"))
    val contractedEdges = batch
      .join(memberLabel.select(col("node").as("u"),
        col("component").as("__lu")), Seq("u"), "left")
      .join(memberLabel.select(col("node").as("v"),
        col("component").as("__lv")), Seq("v"), "left")
      .select(coalesce(col("__lu"), col("u")).as("u"),
        coalesce(col("__lv"), col("v")).as("v"))
    val rootMap = // (old id → new root)
      connectedComponents(contractedEdges, "u", "v")
    // members re-attach through their old component id; components with
    // no surviving batch edge drop out of the inner join and ride along
    // as untouched rows below
    val relabeledMembers = affectedMembers
      .join(rootMap.select(col("node").as("component"),
        col("component").as("__nc")), Seq("component"))
      .select(col("node"), col("__nc").as("component"))
    // contracted nodes that are NOT old component ids are brand-new
    // batch nodes — their row is their own labeling
    val newNodes = rootMap
      .join(touched.select(col("component").as("node")), Seq("node"),
        "left_anti")
    // brand-new nodes with no surviving edge keep/get their own label.
    // "not in the store" needs no store scan: an endpoint IN the store
    // has its component touched, hence appears in affectedMembers.
    val isolated = endpoints
      .join(rootMap.select(col("node")), Seq("node"), "left_anti")
      .join(affectedMembers.select(col("node")), Seq("node"), "left_anti")
      .select(col("node"), col("node").as("component"))
    val delta = relabeledMembers.unionByName(newNodes)
      .unionByName(isolated)
      .select(col("node"), col("component"),
        pmod(col("component"), lit(parts.toLong)).as("__pb"))
      .localCheckpoint(eager = false)
    // the affected-partition list is bounded by `parts` — a bounded
    // driver scalar, not a data collect — and must be materialized
    // BEFORE the rewrite (its lazy plan reads the store's current files)
    val affected: Set[Long] = touchedPb ++
      delta.select(col("__pb")).distinct().collect().map(_.getLong(0))
    // scan 3 (PRUNED to the affected partitions): co-resident rows of
    // partitions being rewritten whose components the batch did NOT
    // touch — they must ride along unchanged. This is the rewrite's
    // read cost, and it is ∝ affected partitions, independent of how
    // large the rest of the store has grown.
    val untouchedSlice = lab
      .where(col("__pb").isin(affected.toSeq: _*))
      .join(delta.select(col("node")), Seq("node"), "left_anti")
    // materialize before writing: the write overwrites (some partitions
    // of) the very path the plan reads, which Spark's self-overwrite
    // check rejects on a live lineage — and a lazy plan would re-read
    // half-rewritten input anyway. repartition on the partition key so
    // each `__pb=` directory receives ONE file per rewrite, not one per
    // upstream shuffle partition (small-file creep made every later
    // scan's listing+footer walk the dominant store cost).
    val mat = untouchedSlice.unionByName(delta)
      .select(col("node"), col("component"), col("__pb"))
      .repartition(col("__pb"))
      .localCheckpoint(eager = false)
    // the present-partition collect runs FIRST: it fully materializes
    // the lazy checkpoint, so by the time the write starts deleting
    // partition directories the plan no longer reads the store (the
    // self-overwrite hazard the checkpoint exists for). A merge can
    // VACATE a partition (all its components relabeled into another
    // partition's range): dynamic overwrite only replaces partitions
    // that receive rows, so an empty affected partition must be
    // dropped explicitly below or its stale labels survive.
    val present = mat.select(col("__pb")).distinct()
      .collect().map(_.getLong(0)).toSet
    // per-WRITE dynamic mode (writer option, not a session-conf
    // set/restore — concurrent writers can interleave a global toggle;
    // r10 ADVICE)
    mat.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__pb").parquet(storeDir)
    val fs = new org.apache.hadoop.fs.Path(storeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (affected -- present).foreach { p =>
      fs.delete(new org.apache.hadoop.fs.Path(storeDir, s"__pb=$p"), true)
    }
    // the session caches file listings per path: readers planned after
    // this update must not resolve against pre-rewrite file names
    spark.catalog.refreshByPath(storeDir)
  }

  /** Seed a [[updateLabelStore]] store from an initial labeling; the
    * layout's `parts` is persisted in the store manifest so updaters
    * never need (or get to contradict) it.
    */
  def writeLabelStore(labels: DataFrame, nodeCol: String, compCol: String,
      storeDir: String, parts: Int = 16): Unit = {
    labels.select(col(nodeCol).as("node"), col(compCol).as("component"))
      .withColumn("__pb", pmod(col("component"), lit(parts.toLong)))
      // one file per partition directory (see updateLabelStore's mat)
      .repartition(col("__pb"))
      .write.mode("overwrite").partitionBy("__pb").parquet(storeDir)
    writeManifest(labels.sparkSession, storeDir, parts)
  }

  /** Synchronous label propagation with self-vote — community labels
    * over the pair graphs a dedup pipeline emits, the vote-based
    * companion to [[connectedComponents]] (LPA converges to finer
    * structure on dense graphs; on the sparse planted dup graph its
    * fixpoint is the component labeling, which q113's oracle replays
    * round by round).
    *
    * Each round, every node adopts the most frequent label among its
    * OWN current label plus its neighbors' labels, ties broken toward
    * the smallest label — the self-vote makes the update a contraction
    * on trees/chains (pure neighbor voting oscillates on bipartite
    * structure) and the (count DESC, label ASC) tie-break makes every
    * round deterministic, so a fixed round count is replayable by any
    * engine. Per round: one equi-join of the symmetric edge list
    * against the label vector, one (node, label) count aggregate and
    * one rank-1 window (map-side-pruned by WindowGroupLimit) — all
    * hash-partition-able; labels checkpoint every 3 rounds exactly as
    * [[pageRank]] bounds plan growth.
    *
    * Returns `(node, label)` for every node that appears in an edge.
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int = 4): DataFrame = {
    val e0 = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .where(col("u") =!= col("v"))
    val sym = e0.union(e0.select(col("v").as("u"), col("u").as("v")))
      .distinct().localCheckpoint()
    val nodes = sym.select(col("u").as("id")).distinct().localCheckpoint()
    var lab = nodes.select(col("id"), col("id").as("l"))
    for (i <- 0 until rounds) {
      val votes = sym.join(lab, col("u") === col("id"))
        .select(col("v").as("id"), col("l"))
        .unionByName(lab)
      // argmax by (count DESC, label ASC): a hash aggregate then a
      // rank-1 window. max(struct(count, -label)) would be one
      // aggregate but plans as a SortAggregate (struct buffers aren't
      // hash-aggregable — engine-wide banned); the row_number window
      // gets WindowGroupLimit's map-side rank<=1 pruning instead, so
      // only one candidate row per node crosses the wire.
      val counted = votes.groupBy(col("id"), col("l"))
        .agg(count(lit(1)).as("__c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("id")).orderBy(col("__c").desc, col("l").asc)
      lab = counted.withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1)
        .select(col("id"), col("l"))
      if ((i + 1) % 3 == 0 && i + 1 < rounds) lab = lab.localCheckpoint()
    }
    lab.select(col("id").as("node"), col("l").as("label"))
  }

  /** `rounds`-round synchronous k-core peel (Seidman 1983 cores via
    * the Matula–Beck peeling dynamics, run a FIXED number of
    * synchronous rounds): each round deletes EVERY node of current
    * degree < k together with its edges. The result after `rounds`
    * rounds is a well-defined over-approximation of the k-core that
    * EQUALS it once a round deletes nothing; the loop early-stops on
    * that fixpoint (edge-signature compare — results are identical
    * with or without the stop, so the stop is pure cost control).
    * Returns the surviving nodes with their residual degrees.
    *
    * Edges are canonicalized on entry (u < v, distinct, no
    * self-loops) like [[triangleStats]]. Node ids may be any
    * orderable type (tokens included).
    *
    * 100 TB shape: each round is ONE degree hash-aggregate over the
    * shrinking edge set plus two semi joins (no row ever widens);
    * `localCheckpoint` every 3 rounds caps lineage like
    * [[labelPropagation]]; the per-round fixpoint probe is a
    * 2-column scalar aggregate, not a collect.
    */
  def kCorePeel(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1, "k and rounds must be positive")
    var e = canon(edges.select(col(srcCol).as("u"), col(dstCol).as("v")))
      .localCheckpoint()
    var sig = signature(e)
    var converged = false
    var i = 0
    while (i < rounds && !converged) {
      val deg = e.select(col("u")).union(e.select(col("v").as("u")))
        .groupBy(col("u")).agg(count(lit(1)).as("__d"))
      val keep = deg.where(col("__d") >= k)
        .select(col("u").as("__keep"))
      var next = e
        .join(keep, e("u") === col("__keep"), "left_semi")
        .join(keep, e("v") === col("__keep"), "left_semi")
      if ((i + 1) % 3 == 0 && i + 1 < rounds) next = next.localCheckpoint()
      val nextSig = signature(next)
      converged = nextSig == sig
      sig = nextSig
      e = next
      i += 1
    }
    e.select(col("u")).union(e.select(col("v").as("u")))
      .groupBy(col("u")).agg(count(lit(1)).as("deg"))
      .select(col("u").as("node"), col("deg"))
  }
}
