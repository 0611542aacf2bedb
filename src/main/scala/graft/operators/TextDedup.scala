package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-scale deduplication operators for training-data pipelines.
  *
  * Four tiers, in increasing recall of near-duplicates:
  *   1. exact (content-hash groupBy)            — [[exact]]
  *   2. MinHash + LSH banding (Jaccard near-dup) — [[minHashLsh]]
  *   3. SimHash (Hamming near-dup)               — [[simHashPairs]]
  *   4. verified n-gram Jaccard on candidates    — inside [[minHashLsh]]
  *
  * Scale design: everything is expression-level except the candidate
  * join, which shuffles on (band, signature) — the standard
  * shingle→minhash→band→bucket-join plan. No O(n²) stage exists: pairs
  * are only materialized within identical LSH buckets, and the final
  * Jaccard verification touches candidate pairs only. On 100 TB the
  * band-join shuffle is the dominant cost and is tunable via
  * (numHashes, bands): more bands → higher recall, bigger shuffle.
  */
object TextDedup {

  /** EXACT set-similarity join via prefix filtering (the
    * Bayardo/Chaudhuri/Xiao "AllPairs / PPJoin" family): ALL document
    * pairs with shingle-set Jaccard >= `threshold`, with zero false
    * negatives — the deterministic counterpart to [[minHashLsh]] (LSH
    * trades recall for cost; prefix filtering keeps exactness and
    * prunes by ordering instead of hashing).
    *
    * Plan: distinct (doc, shingle) pairs → global document frequency
    * per shingle → each doc's shingles ranked rarest-first by
    * (df ASC, shingle ASC) → only the PREFIX (the first
    * `|s| − ⌈t·|s|⌉ + 1` rarest shingles) enters the candidate
    * self-join, with the size-band filter `t·|a| ≤ |b| ≤ |a|/t` applied
    * inside the join. The prefix theorem guarantees every qualifying
    * pair shares a prefix shingle, and prefix shingles are globally
    * RARE by construction, so the join fans out on the df tail, never
    * on hot shingles. Candidates then verify by one array_intersect
    * against the per-doc sorted shingle arrays (candidate-sized work
    * only). Shuffles: by shingle (df + candidate join), by doc (rank
    * window + verify join) — all hash exchanges, no windows over the
    * corpus order, no cross product.
    *
    * Returns `(id_a, id_b, jaccard)` with id_a < id_b.
    */
  def prefixFilterJoin(docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int, threshold: Double): DataFrame = {
    require(threshold > 0 && threshold < 1, "threshold in (0, 1)")
    val tN = math.round(threshold * 10).toInt
    require(math.abs(threshold * 10 - tN) < 1e-9,
      "threshold must be a multiple of 0.1 (exact integer size filter)")
    // per-doc shingle sets SORTED once (array_sort = UTF8String binary
    // order), so the per-PAIR verify below is an allocation-free merge
    // walk (sorted_intersect_count) instead of a hash set per candidate
    val sets = docs.select(col(idCol).as("id"),
        array_sort(array_distinct(
          TextFunctions.shingles(col(textCol), shingleSize))).as("__s"))
      .select(col("id"), col("__s"), size(col("__s")).as("sz"))
      .localCheckpoint() // consumed three times: explode, verify ×2
    val ex = sets.select(col("id"), col("sz"),
        explode_outer(col("__s")).as("sh"))
      .where(col("sh").isNotNull)
    val dfreq = ex.groupBy(col("sh")).agg(count(lit(1)).as("__df"))
    val ranked = ex.join(dfreq, Seq("sh"))
      .withColumn("__rk", row_number().over(Window.partitionBy(col("id"))
        .orderBy(col("__df").asc, col("sh").asc)))
    // prefix length |s| - ceil(t*|s|) + 1, all integer at t = tN/10
    val prefix = ranked.where(
      col("__rk") <= col("sz") - floor((col("sz") * tN + 9) / 10) + 1)
    val left = prefix.select(col("id").as("id_a"), col("sz").as("__sza"),
      col("__rk").as("__rka"), col("sh"))
    val right = prefix.select(col("id").as("id_b"), col("sz").as("__szb"),
      col("__rk").as("__rkb"), col("sh"))
    // PPJoin positional filter (Xiao et al., WWW'08): a shared token at
    // ranks (p_a, p_b) of the per-doc (df ASC, shingle ASC) order caps
    // the achievable overlap at 1 + min(|a|−p_a, |b|−p_b) — only suffix
    // tokens can still match. Jaccard >= t needs overlap
    // >= ⌈t·(|a|+|b|)/(1+t)⌉; with t = tN/10 that is
    // (1 + min(…))·(10+tN) >= tN·(|a|+|b|) in exact integers. EXACT
    // pruning under the join's exists-semantics: for a qualifying pair
    // the FIRST common token (no earlier common tokens in either list)
    // attains the bound and sits inside both prefixes, so its candidate
    // row always survives; rows for later shared tokens may drop, which
    // only shrinks the distinct() input. Kills the AllPairs-sized
    // candidate tail that made q128 the widest-variance bench entry.
    val cand = left.join(right,
        left("sh") === right("sh") && col("id_a") < col("id_b") &&
          col("__szb") * 10 >= col("__sza") * tN &&
          col("__sza") * 10 >= col("__szb") * tN &&
          (lit(1) + least(col("__sza") - col("__rka"),
            col("__szb") - col("__rkb"))) * (10 + tN) >=
            (col("__sza") + col("__szb")) * tN)
      .select(col("id_a"), col("id_b")).distinct()
    val a = sets.select(col("id").as("id_a"), col("__s").as("__sa"),
      col("sz").as("__la"))
    val b = sets.select(col("id").as("id_b"), col("__s").as("__sb"),
      col("sz").as("__lb"))
    val sic = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.SortedIntersectCount(
        org.apache.spark.sql.graft.ColumnBridge.expression(col("__sa")),
        org.apache.spark.sql.graft.ColumnBridge.expression(col("__sb"))))
    cand.join(a, Seq("id_a")).join(b, Seq("id_b"))
      .withColumn("__i", sic)
      .withColumn("jaccard", col("__i").cast("double") /
        (col("__la") + col("__lb") - col("__i")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** EXACT set-CONTAINMENT join: all ordered pairs (a, b), a ≠ b, with
    * `|A ∩ B| / |A| >= threshold` over distinct `shingleSize`-shingle
    * sets — the asymmetric cousin of [[prefixFilterJoin]]. Jaccard
    * misses "snippet inside page" (a quote, a syndicated excerpt, a
    * clipped re-crawl): a 50-shingle doc fully contained in a
    * 500-shingle doc has Jaccard ≈ 0.1 but containment 1.0. Zero false
    * negatives, no LSH probabilism.
    *
    * Prefix theorem, containment form: a qualifying pair shares
    * `o = ⌈t·|A|⌉` shingles, so by pigeonhole at least one shared
    * shingle sits in A's first `|A| − o + 1` rarest-first entries —
    * only A's PREFIX explodes into the candidate join; the B side is
    * the full inverted index, but the join key is always one of A's
    * globally-rare prefix shingles, so fan-out rides the df tail,
    * never hot shingles. Positional filter (first-common-token
    * argument, exact under the join's exists-semantics as in
    * [[prefixFilterJoin]]): `1 + min(|A|−p_a, |B|−p_b) >= o` in exact
    * integers. Size filter inside the join: `|B| >= o`. Verify =
    * sorted merge-walk intersect on candidates only.
    *
    * Returns `(id_a, id_b, containment_ppm)` — id_a is the CONTAINED
    * doc; ppm is exact `⌊10⁶·|A∩B| / |A|⌋`. Near-equal sets emit both
    * directions (each row is a claim about its own id_a).
    */
  def containmentJoin(docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int, threshold: Double): DataFrame = {
    require(threshold > 0 && threshold < 1, "threshold in (0, 1)")
    val tN = math.round(threshold * 10).toInt
    require(math.abs(threshold * 10 - tN) < 1e-9,
      "threshold must be a multiple of 0.1 (exact integer size filter)")
    val sets = docs.select(col(idCol).as("id"),
        array_sort(array_distinct(
          TextFunctions.shingles(col(textCol), shingleSize))).as("__s"))
      .select(col("id"), col("__s"), size(col("__s")).as("sz"))
      .localCheckpoint() // consumed three times: explode, verify ×2
    val ex = sets.select(col("id"), col("sz"),
        explode_outer(col("__s")).as("sh"))
      .where(col("sh").isNotNull)
    val dfreq = ex.groupBy(col("sh")).agg(count(lit(1)).as("__df"))
    val ranked = ex.join(dfreq, Seq("sh"))
      .withColumn("__rk", row_number().over(Window.partitionBy(col("id"))
        .orderBy(col("__df").asc, col("sh").asc)))
    // o = ⌈t·|A|⌉ = (tN·|A| + 9) div 10; prefix length |A| − o + 1
    val left = ranked.where(
        col("__rk") <= col("sz") - floor((col("sz") * tN + 9) / 10) + 1)
      .select(col("id").as("id_a"), col("sz").as("__sza"),
        col("__rk").as("__rka"), col("sh"))
    val right = ranked.select(col("id").as("id_b"), col("sz").as("__szb"),
      col("__rk").as("__rkb"), col("sh"))
    val cand = left.join(right,
        left("sh") === right("sh") && col("id_a") =!= col("id_b") &&
          col("__szb") * 10 >= col("__sza") * tN &&
          (lit(1) + least(col("__sza") - col("__rka"),
            col("__szb") - col("__rkb"))) * 10 >= col("__sza") * tN)
      .select(col("id_a"), col("id_b")).distinct()
    val a = sets.select(col("id").as("id_a"), col("__s").as("__sa"),
      col("sz").as("__la"))
    val b = sets.select(col("id").as("id_b"), col("__s").as("__sb"))
    val sic = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.SortedIntersectCount(
        org.apache.spark.sql.graft.ColumnBridge.expression(col("__sa")),
        org.apache.spark.sql.graft.ColumnBridge.expression(col("__sb"))))
    cand.join(a, Seq("id_a")).join(b, Seq("id_b"))
      .withColumn("__i", sic)
      .where(col("__i") * 10 >= col("__la") * tN)
      .select(col("id_a"), col("id_b"),
        expr("__i * CAST(1000000 AS BIGINT) div __la")
          .as("containment_ppm"))
  }

  /** Exact dedup by normalized content hash: deterministic keep-first by
    * tiebreak (pandas-style), one shuffle on the 128-bit fingerprint.
    */
  def exact(df: DataFrame, textCol: String, tiebreak: Seq[Column]): DataFrame =
    Dedup.keepFirst(
      df.withColumn("__fp", TextFunctions.fingerprint(col(textCol))),
      Seq("__fp"), tiebreak).drop("__fp")

  /** Incremental snapshot dedup: admit only the rows of a NEW batch
    * whose content fingerprint is absent from the existing corpus, then
    * keep-first within the batch itself — the shape of a daily ingest
    * against a 100 TB corpus, where "re-crawled yesterday's page" is
    * the common case and must die cheaply.
    *
    * Scale design: the corpus fingerprint set is the big side, so the
    * batch NEVER joins it directly. A Bloom word table
    * ([[Bloom.build]], ≤ mBits/32 rows) built from the corpus
    * fingerprints is broadcast at the batch; definite misses (most of
    * a typical batch) are admitted with ZERO shuffle, and only the
    * maybe-members — true dups plus the filter's false positives —
    * reach the exact anti-join. False negatives are impossible, so no
    * duplicate survives; the Bloom layer is RESULT-INVISIBLE (q83's
    * oracle is the plain anti-join, exactly like q63's salting).
    *
    * The corpus side pays one distinct on the fingerprint — the same
    * exchange an exact-dedup maintenance pass already runs — and the
    * anti-join shuffles only the candidate subset.
    */
  def incrementalExact(newDocs: DataFrame, corpus: DataFrame,
      textCol: String, tiebreak: Seq[Column],
      mBits: Int = 1 << 20, k: Int = 4): DataFrame = {
    val corpusFps = corpus
      .select(TextFunctions.fingerprint(col(textCol)).as("__cfp"))
      .distinct()
    val bloom = Bloom.build(corpusFps, "__cfp", mBits, k)
    val probed = Bloom.probe(
      newDocs.withColumn("__fp", TextFunctions.fingerprint(col(textCol))),
      "__fp", bloom, mBits, k)
    val misses = probed.where(!col("maybe_member")).drop("maybe_member")
    val candidates = probed.where(col("maybe_member")).drop("maybe_member")
      .join(corpusFps, col("__fp") === col("__cfp"), "left_anti")
    Dedup.keepFirst(misses.unionByName(candidates), Seq("__fp"), tiebreak)
      .drop("__fp")
  }

  /** Streaming exact dedup: the unbounded-corpus counterpart of
    * [[exact]] — fingerprint each document and drop duplicates within
    * the event-time watermark, so state holds one fingerprint per
    * distinct document seen inside the lateness window instead of
    * growing with the stream (the property that survives a continuous
    * 100 TB/day ingest; a duplicate arriving later than the watermark
    * is admitted, the documented trade of bounded state).
    */
  def exactStreaming(df: DataFrame, textCol: String, eventTimeCol: String,
      watermark: String): DataFrame =
    df.withColumn("__fp",
        TextFunctions.fingerprint(coalesce(col(textCol), lit(""))))
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /** Seeded 64-bit token/shingle hash: xxhash64 with the seed mixed in as
    * a literal column — k independent-enough hash families without UDFs.
    */
  private def seededHash(c: Column, seed: Int): Column =
    xxhash64(lit(seed), c)

  /** Hashed word-n-gram shingles of a text column as array<long>, via
    * the native codegen'd [[graft.expressions.ShingleHash64]] kernel —
    * tokenize, shingle and xxhash64 in ONE flat static call, no
    * higher-order lambdas anywhere in the plan (the former
    * `transform(sequence, concat_ws(slice))` tower was measured
    * unstable run-over-run in a shared JVM; ROUND4.md). Byte-identical
    * to hashing `concat_ws(" ", slice(tokens, i, n))` per window.
    */
  def shingleHashArray(text: Column, shingleSize: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.ShingleHash64(
        org.apache.spark.sql.graft.ColumnBridge.expression(text),
        shingleSize))

  /** Relational MinHash: (id, array<long> signature) per input row via
    * explode + grouped min aggregates (see [[minHashLsh]] scale note).
    *
    * The k families hash a PRE-HASHED 8-byte shingle key, not the
    * shingle string: one string hash per (doc, shingle) row, then k
    * hashes of a fixed-width long inside the aggregate — the variable-
    * length string would otherwise be re-hashed k times per row, which
    * dominates the whole operator as k grows (inner-hash collisions are
    * a 2^-64 non-event next to MinHash's own estimator variance).
    */
  /** (id, hashed shingle) rows: one [[shingleHashArray]] call → explode.
    * The shared front of [[minHashSignatures]] and [[minHashLsh]] — the
    * double-hash scheme lives HERE and in [[familyMinAggs]] only, so the
    * formulations cannot drift apart. coalesce: null text behaves like
    * an empty document (one empty-string shingle) rather than
    * null-propagating — the policy TextChunker/TextFeatures already
    * follow.
    */
  private def shingleHashRows(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int): DataFrame =
    df.select(col(idCol).as("__id"),
        shingleHashArray(coalesce(col(textCol), lit("")), shingleSize)
          .as("__shs"))
      // explode_OUTER although the array is never empty (< n tokens
      // yields one joined shingle, so every doc has >= 1 element):
      // a plain explode gets an InferFiltersFromGenerate
      // `size(...) > 0` filter whose pushdown re-evaluates the shingle
      // kernel ONCE MORE per row in the scan stage — the outer variant
      // is exempt from the inference and halves the kernel cost, with
      // identical output on never-empty arrays
      .select(col("__id"), explode_outer(col("__shs")).as("__sh"))

  /** The k family min-aggregates over [[shingleHashRows]]' `__sh`. */
  private def familyMinAggs(numHashes: Int): Seq[Column] =
    (0 until numHashes).map(j =>
      min(xxhash64(lit(j), col("__sh"))).as(s"__h$j"))

  private def sigArray(numHashes: Int): Column =
    array((0 until numHashes).map(j => col(s"__h$j")): _*)

  /** One LSH "side": the single-corpus-pass lineage shared by
    * [[minHashLsh]] (both self-join legs) and
    * [[minHashLshIncremental]] (each table once). Returns
    * `(distinctRows, banded)`:
    *  - `distinctRows` — distinct `(__id, __sh)` shingle-hash rows,
    *    the verify joins' input;
    *  - `banded` — `(__id, __n, __band, __bandsig)`, one row per
    *    (doc, band).
    *
    * Plan contract (r7, pinned by PlanAuditSpec on the FINAL adaptive
    * plan): every consumer of either lineage collapses onto ONE
    * corpus scan+shingle pass at runtime. Three ingredients:
    *  - explicit not-null guards BEFORE the distinct: explode_outer's
    *    output is nullable to the optimizer (never null in fact), so
    *    downstream joins would otherwise INFER IsNotNull(__sh) and
    *    push it below THEIR copy of the distinct, making that copy's
    *    (id, sh) exchange canonically different and defeating AQE
    *    stage reuse;
    *  - __n (exact distinct-shingle count) FUSED into the signature
    *    aggregate and riding every band row: a separate size
    *    aggregate (the r5 shape) let column pruning specialize the
    *    branches, after which the min-only copy's distinct was
    *    legally elided (min is duplicate-insensitive) and the corpus
    *    was re-scanned per branch — count(1) pins the distinct and
    *    the end-of-query size joins disappear;
    *  - band array as static references to __sig: CollapseProject
    *    refuses to inline a non-cheap alias referenced more than
    *    once, so the signature materializes once per row, not once
    *    per band.
    */
  private def lshSide(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int, bands: Int, shingleSize: Int)
      : (DataFrame, DataFrame) = {
    val rowsPerBand = numHashes / bands
    val minAggs = familyMinAggs(numHashes)
    val distinctRows = shingleHashRows(df, idCol, textCol, shingleSize)
      .where(col("__sh").isNotNull && col("__id").isNotNull)
      .distinct()
    val aggregated = distinctRows
      .groupBy(col("__id"))
      .agg(minAggs.head, (minAggs.tail :+
        count(lit(1)).as("__n")): _*)
    val sigs = aggregated.select(col("__id"),
      sigArray(numHashes).as("__sig"), col("__n"))
    val bandArray = array((0 until bands).map(b =>
      xxhash64(slice(col("__sig"), lit(b * rowsPerBand + 1), lit(rowsPerBand))
        .cast("string"), lit(b))): _*)
    val banded = sigs
      .select(col("__id"), col("__n"),
        posexplode(bandArray).as(Seq("__band", "__bandsig")))
    (distinctRows, banded)
  }

  /** Hot-bucket guard for the LSH band join: DROP every
    * `(__band, __bandsig)` bucket whose population exceeds `maxRows`
    * before any candidate join sees it. A bucket of m rows emits O(m²)
    * candidate pairs, and a boilerplate-heavy web corpus (license
    * headers, templated pages, mass-duplicated spam) concentrates
    * millions of near-identical documents into single buckets — at
    * 100 TB that single join key is THE near-dedup killer, turning the
    * band join quadratic regardless of how healthy the rest of the
    * corpus is.
    *
    * Why DROP (the production policy) rather than fail like
    * [[Similarity.cosineNearDup]]'s `maxBucketRows`: a daily corpus
    * ingest must not abort on one templated cluster. Dropping a hot
    * bucket is a bounded, documented recall trade —
    *  - docs whose OTHER bands are healthy keep their candidates there
    *    (bands are independent hash families; only the degenerate band
    *    is skipped);
    *  - fully identical copies (hot in EVERY band) are the exact-dedup
    *    tier's job ([[exact]] / [[incrementalExact]]), which catches
    *    them at hash-aggregate cost before near-dedup ever runs;
    *  - a cluster of >maxRows MUTUALLY-near-identical distinct texts is
    *    precisely the degenerate case where emitting the O(m²) pair
    *    list is useless output — downstream keeps one doc per cluster
    *    anyway, which the exact tier on a normalized fingerprint
    *    ([[graft.functions.TextFunctions.fingerprint]]) approximates
    *    at linear cost.
    *
    * Plan shape: the population count is a WINDOW over the same
    * `(__band, __bandsig)` keys the candidate join shuffles on, so the
    * guard rides the join's own exchange (computed once, reused by both
    * self-join legs) instead of adding one — the same trick as
    * `cosineNearDup`'s guard and `winnowPairs`' `maxDocFreq` filter.
    */
  private def capBandBuckets(banded: DataFrame, maxRows: Long): DataFrame = {
    require(maxRows > 0, "maxBandBucketRows must be positive")
    banded
      .withColumn("__bn", count(lit(1))
        .over(Window.partitionBy(col("__band"), col("__bandsig"))))
      .where(col("__bn") <= maxRows)
      .select(col("__id"), col("__n"), col("__band"), col("__bandsig"))
  }

  def minHashSignatures(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int, shingleSize: Int): DataFrame = {
    val minAggs = familyMinAggs(numHashes)
    shingleHashRows(df, idCol, textCol, shingleSize)
      .groupBy(col("__id"))
      .agg(minAggs.head, minAggs.tail: _*)
      .select(col("__id"), sigArray(numHashes).as("__sig"))
  }

  /** MinHash + LSH near-duplicate pairs.
    *
    * Plan: per doc compute the `numHashes`-long signature, split into
    * `bands` bands, hash each band to one value, explode → one row per
    * (band, bandSig, id); self-join on equal (band, bandSig) with id<id2
    * (dedup candidates); verify with exact shingle-set Jaccard; keep
    * pairs ≥ `threshold`.
    *
    * Returns (id_a, id_b, jaccard) with id_a < id_b, one row per pair.
    *
    * @param maxBandBucketRows hot-bucket cap (see [[capBandBuckets]]):
    *        a `(band, bandsig)` bucket over this size is dropped before
    *        the self-join — the guard that keeps a boilerplate-heavy
    *        corpus from going quadratic at 100 TB.
    */
  def minHashLsh(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 32,
      bands: Int = 8,
      shingleSize: Int = 3,
      threshold: Double = 0.7,
      maxBandBucketRows: Long = 100000L): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    // FULLY RELATIONAL formulation (round 5): explode shingles to rows,
    // hash each shingle string ONCE to a 64-bit key, DISTINCT the
    // (id, hash) rows, and compute the k family minima + the exact
    // set size in ONE pure-codegen HashAggregate (min over distinct
    // rows equals min over all rows, so signatures are unchanged).
    // Verification no longer materializes per-doc shingle SETS at all:
    // |A∩B| is a count over candidate-filtered (pair, hash) joins of
    // the same distinct rows, and |A∪B| = |A|+|B|−|A∩B|. Jaccard on
    // hashed shingles equals Jaccard on the strings up to 64-bit
    // collisions (~(shingles/doc)²/2⁶⁴ — a non-event next to the
    // banding's own false-negative rate).
    //
    // History of this shape (all measured at sf0.1):
    //  - r2-r4 used a combined aggregate (k min columns + collect_set)
    //    — one pass, but collect_set made it an ObjectHashAggregate:
    //    interpreted update loop (the suite's largest residual stall
    //    source once the lambda kernels landed — recorded [20.9, 122.0,
    //    4.8] s mid-suite) and, at 100 TB, an unbounded per-doc array
    //    width in the exchange row.
    //  - r4 ALSO measured a naive split (codegen mins + lone
    //    collect_set joined on id) at 35-370 s: without map-side
    //    partials the k×rows hash tower landed reduce-side. The r5
    //    shape keeps full map-side partial aggregation for the minima
    //    (partials run on the distinct exchange's output) and carries
    //    only fixed-width (id, long) rows through every shuffle —
    //    measured at parity with the combined aggregate clean-JVM, with
    //    no object aggregate anywhere in the plan (PlanAuditSpec).
    val side = lshSide(df, idCol, textCol, numHashes, bands, shingleSize)
    val distinctRows = side._1
    val banded = capBandBuckets(side._2, maxBandBucketRows)
    // SELF-join via aliases of the SAME plan: both shuffle children
    // canonicalize identically, so ReuseExchange computes the shingle
    // pass and the aggregate exchange once, not twice. __n is
    // functionally dependent on the id, so min() is just "the value" —
    // the winnowPairs trick that replaces two post-verify size joins.
    val candidates = banded.as("l").join(banded.as("r"),
        col("l.__band") === col("r.__band")
          && col("l.__bandsig") === col("r.__bandsig")
          && col("l.__id") < col("r.__id"))
      .groupBy(col("l.__id").as("id_a"), col("r.__id").as("id_b"))
      // one row per pair even when several bands collide
      .agg(min(col("l.__n")).as("__na"), min(col("r.__n")).as("__nb"))
    // Count-based exact verification, no sets: a (pair, hash) row
    // survives both joins iff the hash is in A ∩ B. The candidate side
    // is tiny (near-dup pairs only) so the first join semi-filters the
    // corpus rows down to candidate docs; every shuffled row is
    // fixed-width. Pairs with an EMPTY intersection drop out of the
    // count — restored by the left join below so a threshold of 0.0
    // would still see them (parity with the old otherwise(0.0) arm).
    // candidates is consumed twice (here and in the final left join
    // that restores empty-intersection pairs). Both consumers must
    // reference ALL FOUR columns: pruning __na/__nb from this copy
    // would specialize its subtree (min-only signature aggregate, no
    // distinct) and re-run the corpus pass — the same canonical-
    // divergence trap as the __sh filter above. The min(__na/__nb)
    // aggregates below exist purely to keep the columns referenced;
    // they are per-pair constants.
    val interCounts = candidates
      .join(distinctRows.select(col("__id").as("id_a"), col("__sh")),
        Seq("id_a"))
      .join(distinctRows.select(col("__id").as("id_b"), col("__sh")),
        Seq("id_b", "__sh"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("__i"),
        min(col("__na")).as("__na_ic"), min(col("__nb")).as("__nb_ic"))
    // coalesce(__na_ic, __na): identical values — the _ic columns are
    // referenced HERE (not via an intermediate select, which column
    // pruning would see through) precisely so neither candidates copy
    // can be specialized.
    candidates
      .join(interCounts, Seq("id_a", "id_b"), "left")
      .select(col("id_a"), col("id_b"),
        (coalesce(col("__i"), lit(0L)).cast("double")
          / (coalesce(col("__na_ic"), col("__na"))
              + coalesce(col("__nb_ic"), col("__nb"))
              - coalesce(col("__i"), lit(0L)))
            .cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** A materialized LSH index over a corpus snapshot: the two tables a
    * production pipeline PERSISTS so daily batches dedup against the
    * accumulated corpus without re-shingling it —
    *  - `shingles`: distinct `(__id, __sh)` 64-bit shingle-hash rows
    *    (the verify join's input);
    *  - `bands`: `(__id, __n, __band, __bandsig)` band signatures.
    * Build with [[buildLshIndex]], store both as parquet (bucketing the
    * bands table by (__band, __bandsig) makes the candidate join
    * exchange-free), append each accepted batch's rows, and feed to
    * [[minHashLshIncremental]].
    */
  final case class LshIndex(shingles: DataFrame, bands: DataFrame)

  /** Compute the [[LshIndex]] tables for a corpus — one corpus pass
    * (the [[lshSide]] lineage and its plan contract). Hot buckets are
    * capped HERE ([[capBandBuckets]]), at build time, so the persisted
    * store never contains a bucket a later batch join could go
    * quadratic against — and the per-batch reads of the stored side
    * stay guard-free (no window pass over the snapshot per micro-batch).
    */
  def buildLshIndex(corpus: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 32, bands: Int = 8,
      shingleSize: Int = 3, maxBandBucketRows: Long = 100000L): LshIndex = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val (rows, banded) =
      lshSide(corpus, idCol, textCol, numHashes, bands, shingleSize)
    LshIndex(rows, capBandBuckets(banded, maxBandBucketRows))
  }

  /** Persist an [[LshIndex]] as BUCKETED catalog tables —
    * `<name>_shingles` bucketed by `__id` (the verify join's key),
    * `<name>_bands` bucketed by `(__band, __bandsig)` (the candidate
    * join's keys) — so at read time the SNAPSHOT side of each join has
    * compatible output partitioning and never exchanges: only the
    * day's batch shuffles (LshIndexSpec asserts the plan). This is the
    * storage layout of the signature store at 100 TB; the bucket count
    * should track the cluster, not the default here.
    */
  def storeLshIndex(index: LshIndex, name: String, buckets: Int = 8): Unit = {
    graft.sources.Bucketing.writeBucketed(
      index.shingles, s"${name}_shingles", Seq("__id"), buckets)
    graft.sources.Bucketing.writeBucketed(
      index.bands, s"${name}_bands", Seq("__band", "__bandsig"), buckets)
  }

  /** Content-derived store key for a persisted LSH index (r12): the
    * corpus fingerprint folds the TEXT payload, not just the ids — an
    * ids-only key let a store built from different text under the same
    * doc ids be silently reused, and the candidate join then returned
    * ZERO pairs (measured: an orphaned warehouse store adopted by name
    * produced an empty q100 at sf0.001 — signatures from mismatched
    * text never collide). The LSH parameters ride the name too, so a
    * parameter or scheme change can never read an incompatible store.
    * Cost: the keying pass reads the text column once (1-row narrow
    * aggregate) — the price of making staleness impossible, same
    * regime as the embedding stores' vecCol folding.
    */
  def lshStoreKey(prefix: String, corpus: DataFrame, idCol: String,
      textCol: String, numHashes: Int, bands: Int,
      shingleSize: Int): String = {
    val (n, fp) = Similarity.corpusFingerprint(corpus, idCol,
      vecCol = Some(textCol))
    f"${prefix}_h${numHashes}%db${bands}%ds${shingleSize}%d" +
      f"_n${n}%d_fp${fp}%016x"
  }

  /** True iff a stored [[storeLshIndex]] under `name` is usable in this
    * session — already cataloged, or ADOPTED from a previous JVM's
    * committed warehouse directories ([[graft.sources.Bucketing
    * .adoptBucketed]]; r12). Both tables must adopt with the store's
    * write-time bucket spec; a torn build (one table missing or
    * uncommitted) returns false so the caller rebuilds. Callers MUST
    * key `name` by corpus CONTENT ([[lshStoreKey]]) — adoption makes
    * stores outlive the JVM that understood their provenance.
    */
  def adoptLshIndex(spark: org.apache.spark.sql.SparkSession,
      name: String, buckets: Int = 8): Boolean =
    graft.sources.Bucketing.adoptBucketed(spark, s"${name}_shingles",
      Seq("__id"), buckets) &&
      graft.sources.Bucketing.adoptBucketed(spark, s"${name}_bands",
        Seq("__band", "__bandsig"), buckets)

  /** Read a stored [[storeLshIndex]] back; the bucket layout rides the
    * catalog metadata.
    */
  def readLshIndex(spark: org.apache.spark.sql.SparkSession,
      name: String): LshIndex =
    LshIndex(spark.table(s"${name}_shingles"), spark.table(s"${name}_bands"))

  /** Append an accepted batch's signatures to a stored index — each
    * append is written with the store's own bucket spec
    * ([[graft.sources.Bucketing.appendBucketed]]), so the
    * zero-exchange join guarantee holds across appends and the daily
    * loop never rewrites the accumulated corpus side.
    */
  def appendLshIndex(index: LshIndex, name: String): Unit = {
    graft.sources.Bucketing.appendBucketed(index.shingles, s"${name}_shingles")
    graft.sources.Bucketing.appendBucketed(index.bands, s"${name}_bands")
  }

  /** Compact a stored index to one file per bucket
    * ([[graft.sources.Bucketing.compactBucketed]]) — run periodically;
    * daily appends at 100 TB otherwise leave thousands of small bucket
    * files whose per-file open cost dominates the stored-side scan.
    */
  def compactLshIndex(spark: org.apache.spark.sql.SparkSession,
      name: String): Unit = {
    graft.sources.Bucketing.compactBucketed(spark, s"${name}_shingles")
    graft.sources.Bucketing.compactBucketed(spark, s"${name}_bands")
  }

  /** Retention pass over a stored index: drop every signature row whose
    * `__id` fails `keepId` (takedown requests, TTL windows) from BOTH
    * tables in one layout-preserving rewrite each
    * ([[graft.sources.Bucketing.retainWhere]]) — the store stays
    * compacted, bucketed and exchange-free afterwards (LshIndexSpec).
    */
  def retainLshIndex(spark: org.apache.spark.sql.SparkSession,
      name: String, keepId: org.apache.spark.sql.Column): Unit = {
    graft.sources.Bucketing.retainWhere(spark, s"${name}_shingles", keepId)
    graft.sources.Bucketing.retainWhere(spark, s"${name}_bands", keepId)
  }

  /** Incremental MinHash+LSH: near-duplicate pairs between a NEW batch
    * and an existing SNAPSHOT — the near-dup counterpart of the exact
    * incremental dedup ([[incrementalExact]]-style Bloom + anti-join
    * covers identical texts; this catches the mutated ones). A daily
    * ingest dedups against the accumulated corpus without the corpus ×
    * corpus self-join: candidates exist only where a batch doc and a
    * snapshot doc share an LSH band bucket, so the join volume is
    * |batch| × collision-rate, not |snapshot|².
    *
    * At 100 TB the snapshot's [[LshIndex]] is the materialized artifact
    * the pipeline maintains (append each accepted batch's rows); the
    * index overload below is the production path — only candidate
    * snapshot docs' stored shingle rows are touched by the verify join.
    * This from-text convenience recomputes the index in-plan so a
    * one-shot caller (and the q99 oracle) stays self-contained; the
    * join topology is identical either way.
    *
    * Returns `(batch_id, snap_id, jaccard)`, one row per candidate
    * pair with exact (hash-collision-exact) Jaccard ≥ `threshold`.
    */
  def minHashLshIncremental(
      snapshot: DataFrame, snapId: String, snapText: String,
      batch: DataFrame, batchId: String, batchText: String,
      numHashes: Int = 32,
      bands: Int = 8,
      shingleSize: Int = 3,
      threshold: Double = 0.7,
      maxBandBucketRows: Long = 100000L): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    minHashLshIncremental(
      buildLshIndex(snapshot, snapId, snapText, numHashes, bands,
        shingleSize, maxBandBucketRows),
      batch, batchId, batchText, numHashes, bands, shingleSize, threshold,
      maxBandBucketRows)
  }

  /** Index-based incremental near-dup: the production path — the
    * snapshot side comes from a persisted [[LshIndex]] and is never
    * re-shingled. The BATCH side's hot buckets are capped here; the
    * snapshot side was capped when the index was built
    * ([[buildLshIndex]]), so the stored tables stay pristine —
    * bucket-layout-compatible and window-free — per micro-batch.
    */
  def minHashLshIncremental(
      index: LshIndex,
      batch: DataFrame, batchId: String, batchText: String,
      numHashes: Int,
      bands: Int,
      shingleSize: Int,
      threshold: Double,
      maxBandBucketRows: Long): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    minHashLshIncremental(index,
      buildLshIndex(batch, batchId, batchText, numHashes, bands,
        shingleSize, maxBandBucketRows),
      threshold)
  }

  /** Index × index incremental near-dup — the daily-loop shape where
    * the batch's signatures are computed ONCE and reused: join them
    * against the store here, then [[appendLshIndex]] the SAME
    * [[LshIndex]] (persist/localCheckpoint its frames first — both are
    * consumed twice, and an unmaterialized lineage would re-shingle the
    * batch per consumer, which is exactly the recompute this overload
    * exists to kill; r8 measured it as ~25% of q100's steady state).
    */
  def minHashLshIncremental(index: LshIndex, batchIndex: LshIndex,
      threshold: Double): DataFrame = {
    val snapRows = index.shingles
    val snapBanded = index.bands
    val batchRows = batchIndex.shingles
    val batchBanded = batchIndex.bands
    // Same pin discipline as minHashLsh: candidates is consumed twice
    // (verify + final restore-join), so both copies must reference all
    // four columns or pruning specializes one into a fresh corpus pass.
    val candidates = batchBanded.as("b").join(snapBanded.as("s"),
        col("b.__band") === col("s.__band")
          && col("b.__bandsig") === col("s.__bandsig"))
      .groupBy(col("b.__id").as("batch_id"), col("s.__id").as("snap_id"))
      .agg(min(col("b.__n")).as("__nb"), min(col("s.__n")).as("__ns"))
    val interCounts = candidates
      .join(batchRows.select(col("__id").as("batch_id"), col("__sh")),
        Seq("batch_id"))
      .join(snapRows.select(col("__id").as("snap_id"), col("__sh")),
        Seq("snap_id", "__sh"))
      .groupBy(col("batch_id"), col("snap_id"))
      .agg(count(lit(1)).as("__i"),
        min(col("__nb")).as("__nb_ic"), min(col("__ns")).as("__ns_ic"))
    candidates
      .join(interCounts, Seq("batch_id", "snap_id"), "left")
      .select(col("batch_id"), col("snap_id"),
        (coalesce(col("__i"), lit(0L)).cast("double")
          / (coalesce(col("__nb_ic"), col("__nb"))
              + coalesce(col("__ns_ic"), col("__ns"))
              - coalesce(col("__i"), lit(0L)))
            .cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .select(col("batch_id"), col("snap_id"), col("jaccard"))
  }

  /** Exact word-n-gram Jaccard similarity between two texts. */
  def jaccardShingles(a: Column, b: Column, shingleSize: Int = 3): Column = {
    val sa = array_distinct(TextFunctions.shingles(a, shingleSize))
    val sb = array_distinct(TextFunctions.shingles(b, shingleSize))
    val inter = size(array_intersect(sa, sb)).cast("double")
    val union = size(array_union(sa, sb)).cast("double")
    when(union > 0, inter / union).otherwise(lit(0.0))
  }

  /** Number of SimHash bits: 62 keeps every per-bit weight an exact
    * positive long (no sign-bit overflow under ANSI arithmetic).
    */
  val simHashBits: Int = 62

  /** PORTABLE 60-bit token hash: the top 15 hex chars of md5, parsed as
    * an integer — reproducible on any engine with md5 (DuckDB:
    * `CAST('0x' || substr(md5(t), 1, 15) AS BIGINT)`, bit-identical;
    * verified cross-engine), unlike Spark-specific xxhash64. 60 bits
    * stay positive in a signed long. Use as [[simHashPairs]]'
    * `tokenHash` with `bits = 60` when the fingerprint itself must be
    * externally checkable; xxhash64 remains the fast default.
    */
  def md5Hash60(c: Column): Column =
    // native kernel ([[graft.expressions.Md5Hash60]]): same 60 bits as
    // `conv(substring(md5(c),1,15),16,10)` (fuzz-asserted) without the
    // hex-string/substring/NumberConverter tower that dominated q130's
    // stall profile
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.Md5Hash60(
        org.apache.spark.sql.graft.ColumnBridge.expression(c)))

  /** SimHash of the token set: per bit, sum +1/-1 votes over tokens by
    * that bit of the token hash; bit set iff the vote is positive. The
    * per-bit shift amounts must be literals (Catalyst lambdas cannot
    * variable-shift), so the bits unroll at expression-build time — one
    * pass per bit over the token hash array, all inside codegen, no
    * shuffle.
    */
  def simHash(text: Column): Column =
    simHashFromHashes(transform(TextFunctions.tokens(text), t => xxhash64(t)))

  /** SimHash over an already-hashed token array: one scalar-accumulator
    * aggregate per bit (62 passes, statically unrolled — Catalyst lambdas
    * cannot variable-shift). Measured faster than the "one pass with a
    * 62-wide vote array" transposition: interpreted higher-order
    * functions pay per-element array allocation, which dominates the
    * saved traversals. Callers should pass an ATTRIBUTE (materialized
    * hash array), not an inline tokenization — see [[simHashPairs]].
    */
  def simHashFromHashes(hashes: Column): Column =
    (0 until simHashBits).map { b =>
      val votes = aggregate(hashes, lit(0L),
        (a, h) => a + when(shiftright(h, b).bitwiseAND(1) === 1, 1L)
          .otherwise(-1L))
      when(votes > 0, lit(1L << b)).otherwise(0L)
    }.reduce(_ + _)

  /** Hamming distance between two 64-bit fingerprints. */
  def hammingDist(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: bucket by `maxDist + 1` bit chunks — by
    * pigeonhole, a pair within Hamming distance `maxDist` shares at least
    * one exact chunk, so recall is GUARANTEED (not probabilistic) at the
    * configured distance. Join within buckets, verify Hamming ≤ maxDist.
    * Same no-O(n²) shape as MinHash LSH. Cost note: more chunks → narrower
    * chunks → more random bucket collisions; keep maxDist small (≤7) on
    * large corpora.
    */
  /** @param tokenHash per-token hash feeding the bit votes; xxhash64 by
    *        default, [[md5Hash60]] (with `bits = 60`) when cross-engine
    *        reproducibility matters
    * @param bits       fingerprint width ≤ the hash's usable bits
    */
  def simHashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxDist: Int = 3,
      tokenHash: Column => Column = xxhash64(_),
      bits: Int = simHashBits): DataFrame = {
    require(bits > 0 && bits <= simHashBits,
      s"bits must be in (0, $simHashBits]")
    require(maxDist >= 0 && maxDist < bits / 2,
      s"maxDist must be in [0, ${bits / 2})")
    val nChunks = maxDist + 1
    val chunkWidth = (bits + nChunks - 1) / nChunks
    val chunkMask = (1L << chunkWidth) - 1
    // RELATIONAL simhash (same rationale as minHashSignatures): explode
    // token hashes to rows, compute the per-bit ±1 vote sums as one
    // codegen'd grouped aggregate (`bits` static sum() columns, map-side
    // partials), then fold votes into the fingerprint in a projection.
    // explode FIRST, hash in the following projection: the hash then
    // runs per row inside whole-stage codegen instead of per element
    // inside an interpreted transform() lambda
    val tokenHashes = df
      .select(col(idCol).as("__id"),
        explode_outer(TextFunctions.tokens(coalesce(col(textCol), lit(""))))
          .as("__t"))
      .where(col("__t").isNotNull) // outer: no size() scan-filter inference
      .select(col("__id"), tokenHash(col("__t")).as("__h"))
    val voteAggs = (0 until bits).map(b =>
      sum(when(shiftright(col("__h"), b).bitwiseAND(1) === 1, 1L)
        .otherwise(-1L)).as(s"__v$b"))
    val withSig = tokenHashes
      .groupBy(col("__id"))
      .agg(voteAggs.head, voteAggs.tail: _*)
      .select(col("__id"),
        (0 until bits).map(b =>
          when(col(s"__v$b") > 0, lit(1L << b)).otherwise(0L))
          .reduce(_ + _).as("__sim"))
    val chunked = withSig.select(col("__id"), col("__sim"),
      posexplode(array((0 until nChunks).map(c =>
        shiftright(col("__sim"), c * chunkWidth).bitwiseAND(chunkMask)): _*))
        .as(Seq("__chunk", "__chunkval")))
    chunked.as("l").join(chunked.as("r"),
        col("l.__chunk") === col("r.__chunk")
          && col("l.__chunkval") === col("r.__chunkval")
          && col("l.__id") < col("r.__id"))
      .select(col("l.__id").as("id_a"), col("r.__id").as("id_b"),
        hammingDist(col("l.__sim"), col("r.__sim")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  // --- Winnowing (MOSS-style) fingerprints -----------------------------

  /** Winnowed fingerprint set per document (Schleimer/Wilkerson/Aiken,
    * SIGMOD 2003 — the MOSS algorithm): hash every k-token shingle,
    * slide a w-position window over the hash sequence, keep each
    * window's minimum. DISTINCT window-minima form the fingerprint set.
    *
    * The winnowing guarantee — any shared token run of length
    * ≥ w + k − 1 produces at least one SHARED fingerprint — makes this
    * the substring-overlap detector the set-based families (MinHash:
    * whole-doc resemblance; SimHash: token multiset) cannot express:
    * it localizes copied PASSAGES, the "quoted paragraph" class of
    * near-duplication in a training corpus.
    *
    * Shapes (round-4 rewrite, WINDOW-based and higher-order-function
    * free): tokens posexplode to (doc, pos, token) rows; the k-gram is
    * assembled with `lead()` windows (`concat_ws` skips the null leads
    * at the tail, which also yields the whole-short-doc gram at pos 0);
    * the gram hash is a FLAT, whole-stage-codegen projection; the
    * winnow minimum is a `ROWS BETWEEN CURRENT AND w−1 FOLLOWING`
    * frame over the same (doc, pos) window — no second exchange; and
    * the distinct fingerprint set per doc is one `collect_set`
    * aggregate that lands on the window's partitioning (again no
    * exchange). Exactly ONE shuffle total, of narrow token rows.
    *
    * Why not in-row array algebra (`transform`+`slice`+`array_min`)?
    * Measured on this JVM, nested interpreted higher-order lambdas are
    * both slow and UNSTABLE — the same shingle+hash HOF pipeline
    * degraded run-over-run (2 s → 12 s → 52 s at sf0.1) as interpreter
    * call sites went megamorphic, while flat codegen'd projections and
    * window frames hold steady. The hash is the hot kernel here; it
    * must stay inside WholeStageCodegen, which means NO lambda around
    * it.
    *
    * Output: (idCol, fp, __n) where `__n` is the doc's DISTINCT
    * fingerprint count riding along each row (`size(collect_set)` —
    * free at the source), saving [[winnowPairs]] a second pass plus two
    * joins for the containment denominators. A doc's fingerprint set is
    * ~2·len/w entries, so the collect_set state is bounded by document
    * length, never corpus size.
    *
    * `hash` defaults to [[md5Hash60]] (oracle-portable); swap in
    * `xxhash64 _` for production at a fraction of the hash cost.
    */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5, w: Int = 8,
      hash: Column => Column = md5Hash60): DataFrame = {
    require(k >= 1 && w >= 1, s"k and w must be >= 1, got k=$k w=$w")
    // Zero-token docs still contribute the empty gram (matching the
    // oracle's CASE len<k branch); posexplode of an empty array would
    // silently drop them instead.
    val toks = TextFunctions.tokens(col(textCol))
    val rows = df.where(col(textCol).isNotNull)
      .select(col(idCol),
        posexplode(when(size(toks) === 0, array(lit(""))).otherwise(toks))
          .as(Seq("__pos", "__tok")))
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("__pos"))
    val wholeDoc = Window.partitionBy(col(idCol))
    val gram = concat_ws(" ",
      (col("__tok") +: (1 until k).map(j => lead(col("__tok"), j).over(byDoc))): _*)
    // Valid gram starts: 0..n−k (full k-token grams); short docs keep
    // only pos 0, whose gram is the whole text (nulls skipped above).
    val grams = rows
      .select(col(idCol), col("__pos"), gram.as("__gram"),
        count(lit(1)).over(wholeDoc).as("__ntok"))
      .where(col("__pos") <= col("__ntok") - k || col("__pos") === 0)
    val winMin = Window.partitionBy(col(idCol)).orderBy(col("__pos"))
      .rowsBetween(Window.currentRow, w - 1)
    // hash(__gram) is a flat projection between the two window passes —
    // codegen'd, computed exactly once per gram. The per-doc DISTINCT
    // and the set-size count both land on the id partitioning the
    // window already established: HashPartitioning(id) satisfies
    // ClusteredDistribution(id, fp), so neither adds an exchange. A
    // collect_set formulation was measured pathological here: with more
    // than the ObjectHashAggregate fallback threshold of distinct
    // groups per partition it switches to sort-based object aggregation
    // whose per-group buffer re-initialization burned ~38 s of CPU in a
    // single task at sf0.1 — HashAggregate distinct + window count stay
    // codegen'd and flat.
    grams
      .select(col(idCol), col("__pos"), hash(col("__gram")).as("__hv"))
      .select(col(idCol), min(col("__hv")).over(winMin).as("fp"))
      .distinct()
      .withColumn("__n",
        count(lit(1)).over(Window.partitionBy(col(idCol))).cast("long"))
  }

  /** Candidate passage-overlap pairs: documents sharing ≥ `minShared`
    * winnowed fingerprints, with the containment fraction relative to
    * the smaller set. `maxDocFreq` drops fingerprints present in more
    * than that many documents before the join — boilerplate/stop-gram
    * removal, and the guard that keeps the self-join from going
    * quadratic on corpus-wide phrases at scale.
    */
  def winnowPairs(fpsIn: DataFrame, idCol: String,
      minShared: Int, maxDocFreq: Int): DataFrame = {
    require(minShared >= 1 && maxDocFreq >= 2,
      s"need minShared >= 1 and maxDocFreq >= 2, got $minShared/$maxDocFreq")
    // Per-doc set sizes for the containment denominator: ride the `__n`
    // column [[winnowFingerprints]] now emits (free at the source); for
    // a caller-supplied bare (id, fp) table, derive it with one extra
    // aggregate + join, the round-3 shape.
    val fpsWithN =
      if (fpsIn.columns.contains("__n")) fpsIn
      else fpsIn.join(
        fpsIn.groupBy(col(idCol)).agg(count(lit(1)).as("__n")), idCol)
    // One DELIBERATE shuffle on fp, shared by every consumer: the
    // fingerprint pipeline is now narrow (zero shuffles of its own), so
    // without care each self-join side would rescan and re-hash the
    // corpus. Two structural choices make the reuse actually happen:
    // (1) the partition count is pinned (AQE cannot coalesce a
    // repartition(n, col), keeping this canonically identical under
    // both join legs), and (2) the doc-frequency guard is a WINDOW
    // count over this same partitioning rather than a separate
    // groupBy+join — a groupBy would column-prune its exchange down to
    // (fp), a DIFFERENT canonical exchange than the wide join legs, and
    // the hash pipeline would run once per schema (measured: two 97 s
    // single-task stages at sf0.1 doing exactly that). The df-filter is
    // the guard that keeps the self-join from going quadratic on
    // corpus-wide phrases: a fp contributes at most maxDocFreq² pairs.
    val numParts =
      fpsIn.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val kept = fpsWithN.repartition(numParts, col("fp"))
      .withColumn("__df",
        count(lit(1)).over(Window.partitionBy(col("fp"))))
      .where(col("__df") <= maxDocFreq)
      .select(col(idCol), col("fp"), col("__n"))
    kept.as("l").join(kept.as("r"),
        col("l.fp") === col("r.fp")
          && col(s"l.$idCol") < col(s"r.$idCol"))
      .groupBy(col(s"l.$idCol").as("id_a"), col(s"r.$idCol").as("id_b"))
      // __n is functionally dependent on the doc id, so min() is just
      // "the value" — carrying it through the aggregate replaces the
      // round-3 pair→sizes joins (two extra shuffles) entirely.
      .agg(count(lit(1)).as("shared"),
        min(col("l.__n")).as("__na"), min(col("r.__n")).as("__nb"))
      .where(col("shared") >= minShared)
      .select(col("id_a"), col("id_b"), col("shared"),
        (col("shared").cast("double")
          / least(col("__na"), col("__nb")).cast("double")).as("containment"))
  }
}
