package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Two paths:
  *   - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small)
  *     query set, map-side score every corpus vector, per-query top-k via
  *     window. Baseline and oracle.
  *   - [[lshTopK]]: random-hyperplane LSH — bucket corpus vectors by the
  *     sign pattern of `planes` seeded pseudo-random projections, probe
  *     only the query's bucket. The 100 TB path: bucketing is a narrow
  *     map + one shuffle on bucket id; recall is tunable via `planes`
  *     (fewer planes → bigger buckets → higher recall, more compute).
  *
  * All vector math is expression-level (`zip_with` + `aggregate`, cast to
  * double) — inside codegen, no UDF serialization.
  */
object Similarity {

  /** Dot product of two float vectors in index order, accumulated in
    * double — deterministic left-to-right summation.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Fixed-point dot product: per-term products quantized to 1e-9 before
    * an exact long sum — order-independent, hence engine-independent
    * (same trick as money cents; see Queries scaladoc). Backed by the
    * native codegen'd [[graft.expressions.FixedDot]] — this is the
    * per-candidate-pair scoring kernel of every ANN path, and a compiled
    * loop beats the interpreted lambda tower ([[dotFixedHof]], kept as
    * the semantics reference) on exactly that hot path.
    */
  def dotFixed(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.FixedDot(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  /** Higher-order-function formulation of [[dotFixed]] — same values and
    * null semantics, interpreted evaluation; the equivalence is asserted
    * in SimilaritySpec.
    */
  def dotFixedHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b,
        (x, y) => floor(x.cast("double") * y.cast("double") * 1e9 + 0.5)
          .cast("long")),
      lit(0L), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, backed by the native single-loop
    * [[graft.expressions.CosineSim]] (one fused pass vs three
    * interpreted HOF towers); [[cosineHof]] is the semantics reference.
    */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.CosineSim(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  /** HOF formulation of [[cosine]] — same values bit for bit (asserted
    * in SimilaritySpec), interpreted evaluation.
    */
  def cosineHof(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d > 0, dot(a, b) / d).otherwise(lit(0.0))
  }

  /** Exact per-group top-k reduction via the native bounded-heap
    * aggregate ([[graft.expressions.TopKAgg]]): bit-identical to
    * `row_number() OVER (PARTITION BY key ORDER BY score DESC, id
    * ASC) <= k` (TopKAggSpec pins it) — PROVIDED `score` and `id` are
    * non-null, which every current caller guarantees by construction
    * (scores are fixed-point sums/dots of non-null inputs). The two
    * formulations diverge on nulls (r12, ADVICE): the heap SKIPS
    * null-score/null-id rows, while a rank window orders nulls LAST and
    * would emit them when a group holds fewer than k non-null rows —
    * callers with nullable scores must pre-filter to get window
    * semantics. `score` and `id` must be bigint; the pair stream
    * collapses MAP-SIDE to k pairs per group, where a rank window over
    * an N·|Q| scored stream sorts (and at billions of pairs,
    * disk-spills) every row per partition before discarding all but k —
    * the r11 sf10r cliff.
    *
    * SESSION-CONF SIDE EFFECT (r12, ADVICE — deliberate, bounded,
    * documented): constructing this plan raises
    * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` for
    * the WHOLE session (the threshold is read at execution time, and a
    * lazily-composed DataFrame offers no per-plan scope). The raise is
    * bounded by k-derived state size — `min(2^20, 4Mi/k)` distinct
    * groups per task, i.e. at most ~64 MiB of TopKState per task
    * (16·k bytes each). The bound holds across MIXED k in one session:
    * the target derives from the LARGEST k any topKReduce call in the
    * session has used (tracked per session), so an early small-k raise
    * can never leave a later large-k aggregate running with an
    * unbounded state budget — the threshold is re-tightened downward
    * when a bigger k arrives (safe: tightening only re-enables the
    * sort fallback earlier). Never set below the value the session had
    * before the first raise (a user's explicit setting survives).
    * Blast radius: the raise persists for later queries in the
    * session, including TypedImperativeAggregates with KB-sized
    * buffers (KLL/theta/freq sketch stores); those ship per-day/
    * per-source groupings (≤ thousands of groups, ≪ any raised
    * threshold's memory at KB buffers), and a hypothetical
    * million-distinct-key sketch aggregate in the same session would
    * lose its sort-fallback protection — callers owning such a
    * workload should scope this operator to its own session.
    */
  // per-session (original threshold before any raise, max k seen):
  // weak keys so dropped sessions don't pin memory
  private val fallbackState =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
        (Long, Int)]())

  def topKReduce(scored: DataFrame, keyCol: String, idCol: String,
      scoreCol: String, k: Int): DataFrame = {
    // ObjectHashAggregate silently degrades to SORT-based aggregation
    // once a task sees more distinct keys than the fallback threshold
    // (default 128) — built for sketch-sized buffers, but it
    // re-introduces exactly the full-stream sort this reduction exists
    // to avoid (measured: q56's 2.5e9-row dense stream over 5k query
    // groups fell back and spilled).
    val spark = scored.sparkSession
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    fallbackState.synchronized {
      val cur = scala.util.Try(spark.conf.get(key).toLong).getOrElse(128L)
      val (orig, prevMaxK) = Option(fallbackState.get(spark))
        .getOrElse((cur, 0))
      val maxK = math.max(prevMaxK, math.max(1, k))
      fallbackState.put(spark, (orig, maxK))
      val target = math.max(orig, math.min(1L << 20, (4L << 20) / maxK))
      if (cur != target) spark.conf.set(key, target.toString)
    }
    val bridge = org.apache.spark.sql.graft.ColumnBridge
    val agg = bridge.column(graft.expressions.TopKAgg(
      bridge.expression(col(scoreCol)), bridge.expression(col(idCol)), k)
      .toAggregateExpression())
    scored.groupBy(col(keyCol)).agg(agg.as("__top"))
      .select(col(keyCol), posexplode(col("__top")).as(Seq("__p", "__e")))
      .select(col(keyCol), col("__e.id").as(idCol),
        (col("__p") + 1).cast("int").as("rank"),
        col("__e.score_fp").as(scoreCol))
  }

  /** Exact top-k by fixed-point dot score. `queries` must be small enough
    * to broadcast (it is hinted); output is (query_id, neighbor_id, rank,
    * score_fp) with a deterministic (score desc, id asc) rank — reduced
    * by [[topKReduce]] (heap aggregate), not a rank window, so the
    * |corpus|·|queries| scored stream never sorts or spills.
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        dotFixed(col("__qv"), col("__cv")).as("score_fp"))
    topKReduce(scored, "query_id", "neighbor_id", "score_fp", k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        col("score_fp"))
  }

  /** Deterministic pseudo-random hyperplane, precomputed at PLAN TIME:
    * the components depend only on (plane, dim index), so they ship as a
    * literal array instead of being re-hashed per row per element — the
    * projection is then a pure multiply-add pass over the vector.
    */
  private def planeVector(plane: Int, dim: Int): Array[Double] = {
    val rnd = new scala.util.Random(1000003L * plane + 42)
    Array.fill(dim)(rnd.nextDouble() * 2 - 1)
  }

  /** Sign-pattern LSH bucket id for a `dim`-dimensional vector under
    * `planes` hyperplanes. Planes unroll at expression-build time
    * (literal shifts + literal plane arrays). `band` selects an
    * independent plane family (band b uses planes b*planes..b*planes+
    * planes-1), so banded callers get uncorrelated buckets per band.
    */
  def lshBucket(vec: Column, planes: Int, dim: Int, band: Int = 0): Column =
    (0 until planes).map { p =>
      // native constant-plane dot (graft.expressions.PlaneDot) — the
      // former aggregate(zip_with(...)) tower was an interpreted HOF on
      // the hottest q29 row path; parity (incl. sum order, which decides
      // the SIGN near zero) is spec-asserted
      val proj = org.apache.spark.sql.graft.ColumnBridge.column(
        graft.expressions.PlaneDot(
          org.apache.spark.sql.graft.ColumnBridge.expression(vec),
          planeVector(band * planes + p, dim)))
      when(proj > 0, lit(1L << p)).otherwise(0L)
    }.reduce(_ + _)

  /** ANN top-k: score only corpus vectors sharing the query's LSH bucket.
    * Returns the same shape as [[bruteForceTopK]] (ranks within bucket).
    */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, dim: Int,
      planes: Int = 8): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      lshBucket(col(vecCol), planes, dim).as("__bucket"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      lshBucket(col(vecCol), planes, dim).as("__bucket"))
    val scored = c.join(broadcast(q), Seq("__bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("score_fp", dotFixed(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_fp").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        col("score_fp"))
  }

  /** Multi-probe LSH ANN (Lv et al., VLDB 2007): probe the query's
    * exact bucket PLUS the `probes-1` single-bit-flip buckets whose
    * hyperplanes the query sits closest to — the planes most likely to
    * have put a true neighbor on the other side. Recall recovery
    * without more planes, more tables, or a bigger join: candidate
    * volume grows by the probe factor only, and at 100 TB that is the
    * difference between "double the index" and "probe two more buckets".
    *
    * Everything stays codegen'd Column algebra: per-plane projections
    * are the same native [[graft.expressions.PlaneDot]] literals the
    * bucket uses, and the "j-th smallest |margin| plane" selections
    * unroll at expression-build time as struct-`least` chains (a
    * lambda-free argmin — the engine-wide no-HOF plan rule). Probe
    * buckets are provably distinct (each flips a different plane), so
    * no pair dedup is needed before ranking. Scores are exact cosine
    * ([[cosine]]), so an identical-copy query ranks its twin strictly
    * first regardless of vector norms.
    */
  def lshMultiProbeTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, dim: Int,
      planes: Int = 8, probes: Int = 3): DataFrame = {
    require(probes >= 1 && probes <= planes + 1,
      s"probes $probes outside 1..${planes + 1}")
    def projCols(vec: Column): Seq[Column] = (0 until planes).map { p =>
      org.apache.spark.sql.graft.ColumnBridge.column(
        graft.expressions.PlaneDot(
          org.apache.spark.sql.graft.ColumnBridge.expression(vec),
          planeVector(p, dim)))
    }
    def bucketOf(projs: Seq[Column]): Column =
      projs.zipWithIndex.map { case (pr, p) =>
        when(pr > 0, lit(1L << p)).otherwise(0L)
      }.reduce(_ + _)
    val qProjs = projCols(col("__qv"))
    val qBucket = bucketOf(qProjs)
    val margins = qProjs.map(abs(_))
    // rank the planes by margin with ONE native sort over (margin,
    // plane) structs — sort_array is SortArray (lexicographic struct
    // order, no synthesized lambda), and referencing its elements keeps
    // the expression tree linear in `probes` (a sequential
    // least()-with-exclusions argmin chain re-embeds the whole previous
    // tower at every level — exponential growth, measured as a codegen
    // OOM at probes >= 5)
    val sortedPlanes = sort_array(array(
      (0 until planes).map(p =>
        struct(margins(p).as("m"), lit(p).as("p"))): _*))
    val chosen = (1 until probes).map(j =>
      element_at(sortedPlanes, j).getField("p"))
    val flipMasks = chosen.map(selP =>
      (0 until planes).foldLeft(lit(0L))((m, p) =>
        when(selP === p, lit(1L << p)).otherwise(m)))
    val probeBuckets = array(
      (qBucket +: flipMasks.map(qBucket.bitwiseXOR(_))): _*)
    val q = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .select(col("query_id"), col("__qv"),
        explode(probeBuckets).as("__bucket"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      lshBucket(col(vecCol), planes, dim).as("__bucket"))
    val scored = c.join(broadcast(q), Seq("__bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }

  // -------------------------------------------------------------------
  // IVF: data-adaptive coarse quantization (complement of the
  // data-oblivious LSH buckets)
  // -------------------------------------------------------------------

  /** Train a spherical k-means coarse quantizer: `nlist` unit centroids
    * over (assumed L2-normalized) vectors. Standard IVF training shape:
    * the model is tiny (nlist × dim doubles) and lives on the driver;
    * each Lloyd iteration is one distributed pass — assignment via
    * `nlist` static codegen'd dot-product aggregates over exploded
    * (id, dim, value) rows, then per-(cell, dim) FIXED-POINT sums (exact
    * longs → order-independent → deterministic centroids run to run).
    *
    * Initialization is a deterministic hash-sample: the `nlist` rows
    * with the smallest seeded xxhash64(id) — reproducible, no RNG state,
    * same property set as [[Sampling]].
    *
    * 100 TB shape (r7): training runs on a BOUNDED deterministic
    * hash-band sample (`maxTrainVectors`, default 100k — the
    * FAISS-style regime where k-means quality needs a representative
    * sample, not the corpus), and the sample is persisted across Lloyd
    * iterations — each iteration is otherwise 2 full passes over the
    * biggest table in the system. Downstream invariants (identical
    * vectors share a cell; assignment is a pure function of the
    * centroids) are sample-independent, which is exactly what the q53
    * oracle checks.
    */
  def trainIvfCentroids(
      df: DataFrame, idCol: String, vecCol: String, dim: Int,
      nlist: Int, iters: Int = 3, seed: Int = 42,
      maxTrainVectors: Long = 100000L): Array[Array[Double]] = {
    require(nlist > 0 && dim > 0 && iters >= 0, "nlist/dim/iters invalid")
    require(maxTrainVectors >= nlist, "maxTrainVectors must cover nlist")
    def normalized(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n > 0) v.map(_ / n) else v
    }
    val keyed = df.select(col(idCol).as("__id"), col(vecCol).as("__v"))
    val total = keyed.count() // columnar metadata count — cheap
    val sampled =
      if (total <= maxTrainVectors) keyed
      else {
        // deterministic hash band ≈ maxTrain/total of the corpus; the
        // exact sample size is approximate, its CONTENT is a pure
        // function of (seed, id)
        val band = math.max(1L, math.ceil(
          maxTrainVectors.toDouble / total * 1000000L).toLong)
        keyed.where(pmod(xxhash64(lit(seed), col("__id")),
          lit(1000000L)) < lit(band))
      }
    val train = sampled.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var centroids: Array[Array[Double]] = train
        .orderBy(xxhash64(lit(seed), col("__id")), col("__id"))
        .limit(nlist)
        .collect()
        .map(r => normalized(r.getSeq[Any](1).toArray
          .map(x => x.asInstanceOf[Number].doubleValue()))) // float OR double
      val exploded = train.select(col("__id"),
        posexplode(col("__v")).as(Seq("__d", "__x")))
      // Gather strategy (r12, VERDICT r11 item 6): at auto-derived
      // nlist ≈ √N on a 10⁹-row corpus, the per-(cell, dim) sums are
      // ~2M driver rows PER Lloyd iteration — fine as a bounded
      // collect at every benched scale, but worth a partial merge
      // beyond ~10k cells. Both paths produce the identical long
      // arrays (fixed-point sums are order-independent), pinned by
      // IvfSpec.
      val viaTree = centroids.length > 10000
      graft.StrategyLog.record("trainIvfCentroids",
        if (viaTree) "treeAggregate" else "collect",
        s"nlist=${centroids.length}, dim=$dim")
      for (_ <- 0 until iters) {
        val cells = cellRows(train, Seq(col("__id")), col("__v"), centroids)
          .withColumnRenamed("cell", "__cell")
        // exact per-(cell, dim) mean via fixed-point longs: both the sum
        // and the count are order-independent, so centroid floats are
        // identical regardless of partition merge order
        val sumsDf = exploded.join(cells, Seq("__id"))
          .groupBy(col("__cell"), col("__d"))
          .agg(sum(floor(col("__x").cast("double") * 1e9 + lit(0.5))
            .cast("long")).as("__s"), count(lit(1)).as("__n"))
        val (sumArr, cntArr) =
          gatherCellSums(sumsDf, centroids.length, dim, viaTree)
        val next = Array.fill(centroids.length)(Array.fill(dim)(0.0))
        var i = 0
        while (i < sumArr.length) {
          if (cntArr(i) > 0)
            next(i / dim)(i % dim) = sumArr(i).toDouble / 1e9 / cntArr(i)
          i += 1
        }
        // empty cells keep their previous centroid
        centroids = centroids.indices.map { c =>
          if (next(c).exists(_ != 0.0)) normalized(next(c)) else centroids(c)
        }.toArray
      }
      centroids
    } finally train.unpersist(false)
  }

  /** Flat (cell·dim) fixed-point sum + count arrays from the per-(cell,
    * dim) aggregate — either a driver collect of the nlist×dim rows
    * (cheap below ~10k cells) or an executor-side `treeAggregate`
    * partial merge (the driver then receives ONE combined array per
    * tree leg instead of millions of rows). Long element adds are
    * associative and commutative, so the two paths are bit-identical by
    * construction (IvfSpec asserts it).
    */
  private[operators] def gatherCellSums(sumsDf: DataFrame, nlist: Int,
      dim: Int, viaTree: Boolean): (Array[Long], Array[Long]) = {
    val grid = nlist * dim
    if (!viaTree) {
      val s = new Array[Long](grid)
      val n = new Array[Long](grid)
      sumsDf.collect().foreach { r =>
        val i = r.getAs[Int]("__cell") * dim + r.getAs[Int]("__d")
        s(i) = r.getAs[Long]("__s")
        n(i) = r.getAs[Long]("__n")
      }
      (s, n)
    } else {
      // the zero value is EMPTY (allocated lazily on first touch): a
      // dense 16·grid-byte zero would serialize into every task at
      // exactly the >10k-cell scale this path exists for (nlist=√10⁹,
      // dim=1024 → ~512 MB of zeros per task)
      val (s, n) = sumsDf
        .select(col("__cell"), col("__d"), col("__s"), col("__n"))
        .rdd.treeAggregate((Array.emptyLongArray, Array.emptyLongArray))(
          seqOp = { case ((s0, n0), r) =>
            val s = if (s0.isEmpty) new Array[Long](grid) else s0
            val n = if (n0.isEmpty) new Array[Long](grid) else n0
            val i = r.getInt(0) * dim + r.getInt(1)
            s(i) += r.getLong(2)
            n(i) += r.getLong(3)
            (s, n)
          },
          combOp = {
            case ((s1, n1), (s2, _)) if s2.isEmpty => (s1, n1)
            case ((s1, _), (s2, n2)) if s1.isEmpty => (s2, n2)
            case ((s1, n1), (s2, n2)) =>
              var i = 0
              while (i < grid) { s1(i) += s2(i); n1(i) += n2(i); i += 1 }
              (s1, n1)
          })
      if (s.isEmpty) (new Array[Long](grid), new Array[Long](grid))
      else (s, n)
    }
  }

  /** Per-centroid fixed-point scores as (score, −cell) structs — the
    * shared front of [[cellColumn]] and [[ivfTopK]]'s probe ranking.
    * [[graft.expressions.FixedDot]] against a LITERAL centroid runs as
    * a tight codegen'd loop per row: no explode, no dim×rows shuffle,
    * no per-id re-aggregation — cell assignment is a pure narrow
    * PROJECTION (r7; the previous explode + `groupBy(__id)` double-sum
    * formulation shuffled the exploded corpus once per assignment and
    * its float sums were partition-order-dependent near ties — the
    * fixed-point dots are exactly reproducible).
    */
  private def centroidScores(vec: Column,
      centroids: Array[Array[Double]]): Seq[Column] =
    centroids.zipWithIndex.map { case (cvec, c) =>
      struct(
        org.apache.spark.sql.graft.ColumnBridge.column(
          graft.expressions.FixedDot(
            org.apache.spark.sql.graft.ColumnBridge.expression(vec),
            org.apache.spark.sql.graft.ColumnBridge.expression(
              typedLit(cvec.toSeq)))).as("s"),
        lit(-c).cast("int").as("negc"))
    }

  /** Nearest-centroid cell of a vector column, as a pure projection —
    * the loop-kernel [[graft.expressions.NearestCell]]: one reference
    * object holds the whole nlist×dim matrix, so the expression tree is
    * O(1) in nlist and an auto-derived nlist ≈ √N (hundreds+ of cells)
    * neither hangs the analyzer nor overflows codegen. Bit-for-bit
    * parity with the unrolled struct-argmax formulation (kept below for
    * the spec) on finite inputs: same fixed-point dots, ties to the
    * LOWEST cell id, NULL for degenerate vectors.
    */
  private def cellColumn(vec: Column,
      centroids: Array[Array[Double]]): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.NearestCell(
        org.apache.spark.sql.graft.ColumnBridge.expression(vec), centroids))

  /** The pre-r9 literal-unrolled assignment: argmax as array_max over
    * (score, −cell) structs, one [[graft.expressions.FixedDot]] literal
    * per centroid. Struct ordering compares score first, then −cell, so
    * ties resolve to the LOWEST cell id. Tree size is LINEAR in nlist —
    * fine to a few dozen cells, pathological at auto-derived nlist —
    * retained as the independent parity oracle for [[cellColumn]]'s
    * loop kernel (IvfSpec).
    */
  private[operators] def cellColumnUnrolled(vec: Column,
      centroids: Array[Array[Double]]): Column =
    when(vec.isNotNull && size(vec) === centroids.head.length,
      -array_max(array(centroidScores(vec, centroids): _*))
        .getField("negc"))

  /** Cell assignment rows with DROP semantics for degenerate vectors,
    * pushdown-proof: the gated cell rides a one-element array through
    * `explode_outer`, and the null-drop filter lands on the GENERATOR
    * OUTPUT — which predicate pushdown cannot move below the Generate.
    * A plain `where(cell.isNotNull)` on the projection would be pushed
    * into the scan's DataFilters, re-evaluating any upstream vector
    * kernel (e.g. a scale_array projection) once more per row — the
    * engine-wide anti-pattern PlanAuditSpec pins; explode_outer + an
    * explicit null-filter is its sanctioned pattern (same as
    * [[bandedBuckets]]).
    */
  private def cellRows(df: DataFrame, keep: Seq[Column], vec: Column,
      centroids: Array[Array[Double]]): DataFrame =
    df.select((keep :+
        explode_outer(when(vec.isNotNull
            && size(vec) === centroids.head.length,
          array(cellColumn(vec, centroids)))).as("cell")): _*)
      .where(col("cell").isNotNull)

  /** IVF cell assignment of a vector table: (idCol, cell). Narrow —
    * safe to fuse into any scan. Degenerate vectors (null / wrong
    * dimension) are dropped from the assignment.
    */
  def ivfAssign(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]]): DataFrame =
    cellRows(df, Seq(col(idCol)), col(vecCol), centroids)

  /** IVF ANN top-k: corpus vectors live in their nearest centroid's
    * inverted list; each query probes its `nprobe` closest cells and
    * scores only those lists — the data-ADAPTIVE 100 TB path (cells
    * follow the embedding distribution, where LSH buckets are fixed
    * hyperplane cuts). Same output shape as [[bruteForceTopK]]; recall
    * is tuned by nprobe (probing every cell = exact).
    */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      centroids: Array[Array[Double]], nprobe: Int = 2): DataFrame = {
    require(nprobe > 0, "nprobe must be positive")
    // corpus side: ONE narrow projection — vector and its cell together
    // (r7; assignment was previously a second corpus scan + exploded
    // shuffle joined back on id)
    val c = cellRows(corpus,
      Seq(col(idCol).as("neighbor_id"), col(vecCol).as("__cv")),
      col(vecCol), centroids) // degenerate vectors are not indexed
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val probed =
      if (nprobe == 1) {
        // nprobe=1: the probed cell IS the nearest cell — use the
        // [[graft.expressions.NearestCell]] loop kernel (O(1) tree in
        // nlist) instead of the unrolled sort_array tower below, which
        // is linear in nlist and pathological at auto-derived nlist ≈
        // √N (r9 sf10: q102's quantizer has ~1.2k cells). Identical
        // result: same fixed-point dots, same ties-to-lowest-cell.
        cellRows(qv, Seq(col("query_id"), col("__qv")), col("__qv"),
          centroids)
      } else {
        // per-query top-nprobe cells: sort the (score, −cell) structs
        // in a projection and explode the first nprobe — descending
        // score, ties to the LOWEST cell id (−cell descending), all
        // inside codegen
        qv.select(col("query_id"), col("__qv"),
            explode(slice(
              sort_array(array(centroidScores(col("__qv"), centroids): _*),
                asc = false),
              1, nprobe)).as("__sc"))
          .select(col("query_id"), col("__qv"),
            (-col("__sc.negc")).as("cell"))
      }
    val scored = c.join(broadcast(probed), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("score_fp", dotFixed(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_fp").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        col("score_fp"))
  }

  /** Relational banded bucketing: explode each vector to (id, dim, x)
    * rows, compute all bands×planes projections as STATIC codegen'd sum
    * aggregates with map-side partials (the higher-order-function
    * formulation evaluates interpreted and re-allocates per element),
    * fold sign bits per band in a projection, posexplode the band
    * array. Same plane family indexing as [[lshBucket]] (global plane
    * g = band*planes + p) and the same left-to-right accumulation
    * order, so bucket values are identical; measured ~2.5× faster than
    * the expression tower at 48 projections over 64-dim vectors.
    * Zero-length vectors produce no rows and are not bucketed.
    */
  private def bandedBuckets(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, planes: Int, bands: Int): DataFrame = {
    // posexplode_OUTER + null filter, not posexplode: the non-outer
    // variant's InferFiltersFromGenerate `size(vec) > 0` guard pushes
    // into the scan's DataFilters, where it re-evaluates any upstream
    // vector kernel (e.g. a scale_array projection) per row. Zero-
    // length vectors still produce no bucket rows (the outer null row
    // is filtered), preserving the "not bucketed" contract.
    val exploded = df.select(col(idCol).as("__id"),
        posexplode_outer(col(vecCol)).as(Seq("__d", "__x")))
      .where(col("__x").isNotNull)
    val projAggs = (0 until bands * planes).map { g =>
      sum(col("__x").cast("double")
        * element_at(lit(planeVector(g, dim)), col("__d") + 1)).as(s"__p$g")
    }
    val projected = exploded.groupBy(col("__id"))
      .agg(projAggs.head, projAggs.tail: _*)
    val bucketCols = (0 until bands).map { b =>
      (0 until planes).map { p =>
        when(col(s"__p${b * planes + p}") > 0, lit(1L << p)).otherwise(0L)
      }.reduce(_ + _)
    }
    projected.select(col("__id"),
      posexplode(array(bucketCols: _*)).as(Seq("__band", "__bucket")))
  }

  /** Embedding-cosine near-duplicate pairs via BANDED LSH buckets: each
    * of `bands` independent plane families buckets every vector
    * (relationally, see [[bandedBuckets]]); candidate pairs share a
    * bucket in AT LEAST ONE band (MinHash-style candidate union), then
    * exact cosine verifies. The embedding-space analog of
    * [[TextDedup.minHashLsh]], and the same scale shape: candidates
    * carry ids only through the (band, bucket) equi-join, vectors
    * re-join after the distinct.
    *
    * Recall vs a single plane family: a near-dup pair missed by one
    * family (one plane happens to split the pair) is caught by any
    * other, so recall at fixed bucket granularity rises from p to
    * 1-(1-p)^bands, while bucket size — the quadratic-blowup knob — is
    * governed by `planes` alone (2^planes buckets per band). Pairs with
    * IDENTICAL sign patterns (e.g. positively scaled copies) collide in
    * every band deterministically.
    *
    * @param maxBucketRows fail-fast ceiling on a single (band, bucket)
    *        population: a degenerate corpus (all-equal vectors, planes
    *        too few) makes the within-bucket join quadratic; better to
    *        fail with the bucket id than OOM in the shuffle
    *        (same rationale as [[RangeJoin]]'s maxBinsPerInterval).
    */
  def cosineNearDup(
      df: DataFrame, idCol: String, vecCol: String, dim: Int,
      threshold: Double = 0.95, planes: Int = 12, bands: Int = 4,
      maxBucketRows: Long = 1000000L): DataFrame = {
    val banded = bandedBuckets(df, idCol, vecCol, dim, planes, bands)
    // Per-(band, bucket) population guard: the count window shuffles on
    // the same key as the candidate join below, so the exchange is
    // computed once and reused, not added.
    val wcnt = Window.partitionBy(col("__band"), col("__bucket"))
    val guarded = banded
      .withColumn("__bn", count(lit(1)).over(wcnt))
      .withColumn("__bucket",
        when(col("__bn") > maxBucketRows,
          raise_error(concat(
            lit(s"LSH bucket exceeds $maxBucketRows rows (band="),
            col("__band"), lit(", bucket="), col("__bucket"),
            lit(") - raise planes or dedup exact copies first"))))
          .otherwise(col("__bucket")))
      .select(col("__id"), col("__band"), col("__bucket"))
    val candidates = guarded.as("l").join(guarded.as("r"),
        col("l.__band") === col("r.__band")
          && col("l.__bucket") === col("r.__bucket")
          && col("l.__id") < col("r.__id"))
      .select(col("l.__id").as("id_a"), col("r.__id").as("id_b"))
      .distinct() // a pair can collide in several bands
    val vecs = df.select(col(idCol).as("__vid"), col(vecCol).as("__vec"))
    candidates
      .join(vecs.select(col("__vid").as("id_a"), col("__vec").as("__va")),
        Seq("id_a"))
      .join(vecs.select(col("__vid").as("id_b"), col("__vec").as("__vb")),
        Seq("id_b"))
      .withColumn("cosine", cosine(col("__va"), col("__vb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** SemDeDup: semantic deduplication by embedding clusters — the
    * published recipe (k-means the embedding space, then prune
    * near-identical pairs WITHIN each cluster) that completes the
    * dedup ladder above the lexical tiers: exact (q25) → MinHash /
    * SimHash / cosine-LSH (q26/q31/q29) → semantic clusters, which
    * catch paraphrase-level duplicates no shingle tier can.
    *
    * Output: `(dropped_id, kept_id)` — a vector is dropped when a
    * LOWER-id τ-neighbor shares its cluster; `kept_id` is the lowest
    * such neighbor. This is SemDeDup's greedy per-cluster pruning
    * (deterministic here via the id order), not transitive-closure
    * resolution — clusters needing full connected components go
    * through the q55 pipeline instead.
    *
    * Scale design: the quadratic stage is CONFINED per cell — the
    * published algorithm's point — so cost is Σ|cell|², tuned by
    * `nlist` (grow it with the corpus, √N cells keeps cells
    * O(√N)); centroids are driver-held `nlist × dim` doubles like all
    * IVF state ([[trainIvfCentroids]]). Two skew defenses beyond AQE:
    *
    *   - '''fail-fast''': a cell whose population exceeds
    *     `maxCellRows` raises with the cell id and its row count
    *     before the pair join runs (same rationale as
    *     [[cosineNearDup]]'s `maxBucketRows`) — a degenerate corpus
    *     (mass-duplicate embeddings, nlist far too small) should fail
    *     with a diagnostic, not OOM the shuffle.
    *   - '''within-cell split''': a cell larger than `saltCellRows`
    *     has its pair join decomposed into `salt` chunks — the left
    *     leg keys each row by `hash(id) % salt`, the right leg
    *     replicates each row to all `salt` values, so every (a, b)
    *     pair still materializes exactly once (at a's salt) while the
    *     (cell, salt) join key spreads one hot cell over `salt`
    *     shuffle partitions instead of pinning a straggler. Healthy
    *     cells keep salt 0 on both legs and pay no replication. This
    *     is the relational equivalent of the paper's re-clustering of
    *     oversized clusters, without a second k-means pass.
    */
  def semDedup(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
      nlist: Int, tau: Double, iters: Int = 2,
      seed: Int = 42, maxCellRows: Long = 1000000L,
      saltCellRows: Long = 65536L, salt: Int = 8): DataFrame = {
    val centroids = trainIvfCentroids(emb, idCol, vecCol, dim, nlist,
      iters, seed)
    val withCell = emb.select(col(idCol), col(vecCol))
      .join(ivfAssign(emb, idCol, vecCol, centroids), Seq(idCol))
    semDedupWithinCells(withCell, idCol, vecCol, tau, maxCellRows,
      saltCellRows, salt)
  }

  /** Per-cell greedy pruning stage of [[semDedup]], factored over a
    * pre-assigned `(idCol, vecCol, cell)` frame so the guard and the
    * skew split are testable against a PLANTED degenerate assignment
    * (k-means placement is data-dependent and can't plant a mega-cell
    * deterministically).
    */
  private[operators] def semDedupWithinCells(withCell: DataFrame,
      idCol: String, vecCol: String, tau: Double, maxCellRows: Long,
      saltCellRows: Long, salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    require(maxCellRows >= saltCellRows,
      "maxCellRows below saltCellRows would fail cells the split handles")
    val wcnt = Window.partitionBy(col("cell"))
    val counted = withCell
      .withColumn("__cn", count(lit(1)).over(wcnt))
      .withColumn("cell",
        when(col("__cn") > maxCellRows,
          raise_error(concat(
            lit(s"SemDeDup cell exceeds $maxCellRows rows (cell="),
            col("cell"), lit(", rows="), col("__cn"),
            lit(") - grow nlist or dedup exact copies first"))))
          .otherwise(col("cell")))
    val nSalt = when(col("__cn") > saltCellRows, lit(salt.toLong))
      .otherwise(lit(1L))
    val a = counted.select(col("cell"),
      pmod(xxhash64(col(idCol)), nSalt).as("__salt"),
      col(idCol).as("__ida"), col(vecCol).as("__va"))
    val b = counted.select(col("cell"),
      explode(sequence(lit(0L), nSalt - 1L)).as("__salt"),
      col(idCol).as("__idb"), col(vecCol).as("__vb"))
    a.join(b, Seq("cell", "__salt"))
      .where(col("__ida") < col("__idb"))
      .where(cosine(col("__va"), col("__vb")) >= tau)
      .groupBy(col("__idb"))
      .agg(min(col("__ida")).as("kept_id"))
      .select(col("__idb").as("dropped_id"), col("kept_id"))
  }

  // -------------------------------------------------------------------
  // Data-derived scale knobs + persisted quantizer (the r8 scale
  // sweep's two open items: fixed nlist / fixed planes are the only
  // knobs that need a manual retune when the corpus grows 10-100×;
  // derive them from corpus stats instead)
  // -------------------------------------------------------------------

  /** nlist ≈ √N, clamped. √N balances the two nlist-sensitive costs of
    * [[semDedup]]: assignment is O(N·nlist·dim) and the within-cell
    * pair stage is Σ|cell|² ≈ N²/nlist — both land at O(N^1.5·…) at
    * nlist = √N, the standard IVF sizing (FAISS guideline). A fixed
    * nlist makes the pair stage quadratic (10× data → ~100× pairs —
    * the measured r8 behavior); a fixed CELL size makes assignment
    * quadratic. The [[graft.expressions.NearestCell]] loop kernel keeps
    * assignment a pure projection at any derived value.
    */
  def autoNlist(corpusRows: Long, minNlist: Int = 16,
      maxNlist: Int = 65536): Int = {
    require(corpusRows >= 0 && minNlist > 0 && maxNlist >= minNlist)
    val root = math.ceil(math.sqrt(corpusRows.toDouble)).toLong
    math.min(maxNlist.toLong, math.max(minNlist.toLong, root)).toInt
  }

  /** Hyperplane count so that the EXPECTED sign-LSH bucket occupancy
    * N / 2^planes stays ≈ `targetBucketRows`: candidate volume per
    * query is bucket-sized, so holding occupancy constant keeps the
    * bucket-join cost LINEAR in corpus size where a fixed `planes`
    * grows it quadratically (r8 measured q102's candidate pairs ×100
    * at 10× data on planes = 8). Monotone non-decreasing in
    * corpusRows; clamped to [minPlanes, maxPlanes] (bucket ids are
    * bit-packed into a long, and recall drops as planes grow — callers
    * whose contract depends on recall beyond the planted-twin
    * guarantee should pair growth with banding or multi-probe).
    */
  def autoPlanes(corpusRows: Long, targetBucketRows: Long = 64L,
      minPlanes: Int = 8, maxPlanes: Int = 24): Int = {
    require(corpusRows >= 0 && targetBucketRows > 0)
    require(minPlanes >= 1 && maxPlanes >= minPlanes && maxPlanes <= 62)
    var p = minPlanes
    while (p < maxPlanes &&
        (corpusRows >> p) > targetBucketRows) p += 1
    p
  }

  /** Order-independent corpus identity for quantizer-store keying:
    * (row count, XOR of per-row xxhash64(seed, id [, vec])). One
    * column-pruned scan; any insert/delete/re-key flips the fingerprint
    * and forces a retrain, while re-ordering or re-partitioning the
    * same rows does not.
    *
    * Pass `vecCol` to fold the VECTOR PAYLOAD into the hash — required
    * whenever embedding values can change while ids and count stay
    * fixed (a regenerated or re-normalized corpus), or the store would
    * silently serve centroids trained on the old vectors (r10 ADVICE).
    * xxhash64 hashes the array elementwise, so any single-component
    * change flips the row hash. Omit it ONLY when the vectors are a
    * pure function of the ids (e.g. q102's synthesized images), where
    * id-identity IS payload-identity and the scan stays id-only.
    */
  def corpusFingerprint(df: DataFrame, idCol: String,
      seed: Int = 42, vecCol: Option[String] = None): (Long, Long) = {
    val hashed = vecCol match {
      case Some(v) => xxhash64(lit(seed), col(idCol), col(v))
      case None => xxhash64(lit(seed), col(idCol))
    }
    val r = df.agg(
      count(lit(1)).as("n"),
      coalesce(bit_xor(hashed), lit(0L)).as("fp"))
      .head()
    (r.getLong(0), r.getLong(1))
  }

  /** Train-once-reuse coarse quantizer: the centroids of
    * [[trainIvfCentroids]] persisted under
    * `storeDir/ivf_nlist=…_dim=…_seed=…_n=…_fp=…` and loaded on every
    * later call with a matching (params, corpus fingerprint) key — the
    * production IVF regime where Lloyd training is a BUILD step
    * amortized across the daily queries, not a per-run cost. A corpus
    * change flips the fingerprint, misses the store, and retrains; the
    * payload is the tiny nlist×dim driver model (one bounded collect to
    * load).
    *
    * Durability (r10 ADVICE): the store is written to a temp sibling
    * and ATOMICALLY renamed into place — a reader can never observe a
    * half-written key (`mode("overwrite")` on the final path would be
    * delete-then-commit, a visible hole). Loads are VALIDATED — exactly
    * `nlist` rows, cell ids a permutation of 0..nlist-1, every centroid
    * non-null with `dim` components — and any mismatch (a torn store
    * from a kill -9 mid-rename era, manual tampering) falls back to
    * retrain-and-rewrite instead of poisoning every later run with null
    * slots. A concurrent double-train stays benign: both runs produce
    * byte-identical centroids (training is deterministic in (seed,
    * corpus)), and the loser of the rename race simply deletes its temp.
    */
  def trainOrLoadIvfCentroids(
      df: DataFrame, idCol: String, vecCol: String, dim: Int,
      nlist: Int, storeDir: String, iters: Int = 3, seed: Int = 42,
      maxTrainVectors: Long = 100000L,
      fingerprint: Option[(Long, Long)] = None): Array[Array[Double]] = {
    val spark = df.sparkSession
    val (n, fp) = fingerprint.getOrElse(corpusFingerprint(df, idCol, seed))
    val key = f"ivf_nlist=$nlist%d_dim=$dim%d_seed=$seed%d_n=$n%d_fp=$fp%016x"
    val path = s"$storeDir/$key"
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)

    // a corpus SMALLER than nlist trains corpus-many centroids (the
    // deterministic hash-sample init can't seed more) — the key's own
    // row count n bounds what a valid store must hold
    val expectCells = math.min(nlist.toLong, math.max(1L, n)).toInt

    def loadValidated(): Option[Array[Array[Double]]] =
      try {
        val rows = spark.read.parquet(path).collect() // nlist rows, tiny
        if (rows.length != expectCells) return None
        val out = Array.ofDim[Array[Double]](expectCells)
        rows.foreach { r =>
          val c = r.getInt(0)
          if (c < 0 || c >= expectCells || out(c) != null || r.isNullAt(1))
            return None
          val v = r.getSeq[Double](1).toArray
          if (v.length != dim) return None
          out(c) = v
        }
        Some(out)
      } catch {
        // unreadable / wrong-schema store (torn write, tampering):
        // retrain rather than poison every later run
        case scala.util.control.NonFatal(_) => None
      }

    def trainAndWrite(): Array[Array[Double]] = {
      val centroids =
        trainIvfCentroids(df, idCol, vecCol, dim, nlist, iters, seed,
          maxTrainVectors)
      import spark.implicits._
      val tmp = new org.apache.hadoop.fs.Path(
        s"$storeDir/.tmp_${key}_${java.util.UUID.randomUUID().toString.take(8)}")
      centroids.zipWithIndex
        .map { case (v, c) => (c, v.toSeq) }.toSeq
        .toDF("cell", "centroid")
        .repartition(1)
        .write.mode("overwrite").parquet(tmp.toString)
      // stale/torn final dir (validation already failed it) goes first;
      // then one rename publishes the whole key. Rename-loser (a
      // concurrent identical train won) just discards its temp.
      fs.delete(hPath, true)
      if (!fs.rename(tmp, hPath)) fs.delete(tmp, true)
      centroids
    }

    // every adopt/train resolution is a runtime strategy (r13, VERDICT
    // r12 item 7): a store that silently fails validation and retrains
    // per JVM is invisible without this line (the q160/q100 class)
    if (fs.exists(hPath)) loadValidated() match {
      case Some(c) =>
        graft.StrategyLog.record("ivfQuantizer", "adopt", key)
        c
      case None =>
        graft.StrategyLog.record("ivfQuantizer", "retrain-invalid", key)
        trainAndWrite()
    } else {
      graft.StrategyLog.record("ivfQuantizer", "train", key)
      trainAndWrite()
    }
  }

  /** Scale-ADAPTIVE top-k candidate generation: exact brute force below
    * `exactThreshold` corpus rows, IVF above it — the generator behind
    * the kNN-labeling / hard-negative-mining queries (q133/q139), whose
    * downstream re-rank/vote stages are generator-agnostic by design.
    *
    * Why a threshold and not always-IVF: below ~a few thousand corpus
    * rows one broadcast pass IS the optimal plan (training a quantizer
    * costs more than it saves) and the exact scores are what the DuckDB
    * oracles check — so the small-N regime stays bit-exact. Above the
    * threshold the |Q|·|C| pair volume is the suite's measured
    * quadratic scale-killer (r9 sf1: q133 101×, q139 108× for 10×
    * data); the IVF path scores only `nprobe` cells' inverted lists per
    * query — candidate volume ≈ nprobe·N/nlist = O(√N) per query at
    * the derived nlist ≈ √N, turning N^2 into N^1.5.
    *
    * Recall above the threshold is the standard IVF trade (nprobe of
    * autoNlist cells, tunable); ties and ranks within the returned
    * candidates use the SAME fixed-point scores and (score desc, id
    * asc) order as the exact path, so downstream logic never branches.
    * The quantizer amortizes through `storeDir` keyed by the
    * payload-folded corpus fingerprint ([[corpusFingerprint]] with
    * vecCol — these are real embedding tables, not id-derived media).
    */
  def adaptiveTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, dim: Int,
      storeDir: String, exactThreshold: Long = 4096L,
      nprobe: Int = 4, seed: Int = 42): DataFrame = {
    val fp = corpusFingerprint(corpus, idCol, seed, Some(vecCol))
    if (fp._1 <= exactThreshold) {
      graft.StrategyLog.record("adaptiveTopK", "exact",
        s"n=${fp._1} <= exactThreshold=$exactThreshold")
      bruteForceTopK(corpus, queries, idCol, vecCol, k)
    } else {
      val nlist = autoNlist(fp._1)
      graft.StrategyLog.record("adaptiveTopK", "ivf",
        s"n=${fp._1} > exactThreshold=$exactThreshold, " +
          s"autoNlist=$nlist, nprobe=${math.min(nprobe, nlist)}")
      val centroids = trainOrLoadIvfCentroids(corpus, idCol, vecCol, dim,
        nlist, storeDir, seed = seed, fingerprint = Some(fp))
      ivfTopK(corpus, queries, idCol, vecCol, k, centroids,
        nprobe = math.min(nprobe, nlist))
    }
  }

  /** [[semDedup]] with BOTH scale knobs derived from the corpus and the
    * quantizer amortized through `storeDir`: nlist = [[autoNlist]](N)
    * and the trained centroids persisted/reused via
    * [[trainOrLoadIvfCentroids]]. This is the sweep-safe entry point —
    * 10×/100× data changes no code and no constants, and per-run cost
    * is assignment + the √N-bounded pair stage only (training runs once
    * per corpus generation). Output is identical to [[semDedup]] at the
    * same derived nlist.
    */
  def semDedupAuto(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
      tau: Double, storeDir: String, iters: Int = 2, seed: Int = 42,
      maxCellRows: Long = 1000000L, saltCellRows: Long = 65536L,
      salt: Int = 8): DataFrame = {
    // payload-folded fingerprint: semDedup corpora are real embedding
    // tables whose vectors can be regenerated in place (r10 ADVICE)
    val fp = corpusFingerprint(emb, idCol, seed, Some(vecCol))
    val nlist = autoNlist(fp._1)
    val centroids = trainOrLoadIvfCentroids(emb, idCol, vecCol, dim,
      nlist, storeDir, iters, seed, fingerprint = Some(fp))
    val withCell = emb.select(col(idCol), col(vecCol))
      .join(ivfAssign(emb, idCol, vecCol, centroids), Seq(idCol))
    semDedupWithinCells(withCell, idCol, vecCol, tau, maxCellRows,
      saltCellRows, salt)
  }
}
