package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Ranked lexical retrieval over a document corpus — the "find the
  * passages that match this query" primitive a training-data pipeline
  * uses for eval-set curation, hard-negative mining and corpus
  * inspection.
  *
  * Reference scope note: the reference has no retrieval stage; this
  * serves the LLM-data-pipeline surface (SURVEY §2.6) next to the
  * embedding-space ANN operators (Similarity/IVF) as their exact
  * lexical counterpart.
  */
object Retrieval {

  /** BM25 top-k: for each query, the k best-scoring documents.
    *
    * Scoring is `idf(t) * tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))`.
    * By default `idf` is the classic Robertson–Sparck Jones
    * `ln((N − df + 0.5) / (df + 0.5))` — true BM25 ranking.
    *
    * `rationalIdf = true` drops the `ln` and uses the raw rational
    * `(N − df + 0.5) / (df + 0.5)` (the exponential of RSJ idf). This
    * exists for cross-engine reproducibility: `ln` is a libm call that
    * is not guaranteed correctly rounded, so log-based scores cannot be
    * recomputed bit-for-bit by an independent engine, while the
    * rational form is pure correctly-rounded IEEE add/mul/div. The
    * transform is strictly monotone PER TERM (single-term rankings are
    * identical to BM25), but it re-weights terms relative to each
    * other — exp(idf) amplifies rare terms — so multi-term rankings
    * can legitimately differ from true BM25; callers that need BM25's
    * exact trade-off must use the default. q56 uses the rational
    * variant because its DuckDB oracle must reproduce every score.
    *
    * Per-term contributions are quantized to exact micro-units
    * (`FLOOR(c·1e6 + 0.5) AS BIGINT`) before the cross-term sum, so
    * accumulation is integer — order-independent across any
    * partitioning — and the score column is a hash-safe BIGINT.
    *
    * Scale shape — TWO physical strategies, identical output (the
    * score algebra below is shared verbatim, Bm25DenseSpec pins
    * equality):
    *
    *  - SPARSE (the default): one explode+groupBy over the
    *    corpus builds the (doc, term, tf) postings; `df` is a second
    *    narrow aggregate of the postings; the query side is exploded,
    *    DISTINCT-ed and broadcast, so the only wide state is postings
    *    keyed by term — an inverted index, shuffled once. Candidate
    *    volume is Σ over (query, term) of df(term): the right shape
    *    for Zipfian corpora where query terms are discriminative.
    *  - DENSE (candidate-DEGENERATE corpora, ≤ `maxDenseTerms`
    *    distinct query terms): the r11 sf10r sweep measured
    *    Σ df = 5.69e9 for 500k docs × 5k queries (a 3.3k-word
    *    vocabulary makes every prefix token a stopword; classic
    *    df-cutoff pruning would have emptied every query). The dense
    *    path pivots each document's
    *    per-query-term contributions into a T-slot array (T = distinct
    *    query terms, a plain HashAggregate with T sum buffers), scores
    *    each (doc, query) pair with [[graft.expressions.SlotSum]]
    *    (a few array fetches — no join fan-out, no per-pair
    *    aggregation state), and reduces through the native top-k heap
    *    aggregate ([[Similarity.topKReduce]]) — |docs|·|queries| rows
    *    streamed through codegen, nothing sorted, nothing spilled.
    *    (WAND/MaxScore-style ordered-list early termination is the
    *    classic EXACT alternative, but needs impact-ordered posting
    *    traversal with per-query state — not expressible as a
    *    declarative plan; the dense form reaches the same exactness
    *    at the same asymptotic cost for the degenerate regime.)
    *
    * Both paths are EXACT — the strategy switch is physical, so the
    * DuckDB oracle stays hash-green regardless of which side runs.
    *
    * The cutover is MEASURED, not a size constant (r13, VERDICT r12
    * item 6 — the old `denseAboveDocs = 100000` was one corpus's
    * number, wrong in both directions: a 10M-doc corpus with
    * discriminative query terms wants the inverted index, a 50k-doc
    * degenerate-vocabulary corpus wants dense). Above the
    * `denseMinDocs` triviality floor, a bounded sample of
    * `sampleDocs` documents estimates each query term's df; the
    * decision statistic is the CANDIDATE RATIO
    * `r = Σ_(query,term) df̂(term) / (nDocs · nQueries)` — the
    * estimated sparse candidate-pair stream as a fraction of the full
    * cross product. Small r means query terms are discriminative and
    * the inverted index touches a sliver of the corpus; r near 1
    * means candidate generation degenerates to query-by-scan and the
    * sparse (query, doc) hash-aggregate state approaches
    * |docs|·|queries| — exactly what the dense bounded-heap pass
    * avoids. Dense engages when BOTH hold:
    *
    *  - `r ≥ denseAboveCandidateRatio` (default 0.25: the r11/r13
    *    measured corpora sit far on each side — the sf10r degenerate
    *    corpus at r ≈ 2.3, the sf0.1 documents corpus at r ≈ 2.9,
    *    per-doc-unique-term corpora at r ≈ 0; the constant picks the
    *    middle of a wide gap), AND
    *  - the estimated candidate VOLUME `Σ df̂ = r · nDocs · nQueries`
    *    is at least `denseMinCandidatePairs` (default 2²⁴ ≈ 16.7M).
    *    The ratio is scale-free, and degeneracy alone does not make
    *    dense faster: at sf0.1 the documents corpus measures r = 2.9
    *    but only ~714k candidate pairs — one small shuffle, where
    *    sparse ran 1.4 s vs dense 3.0 s (the pivot/dict fixed costs
    *    dominate). The sparse stream's cost grows with Σ df̂ while
    *    dense stays |docs| + bounded heaps, so an absolute volume
    *    floor is the correct second axis; below it the whole candidate
    *    stream is a seconds-scale job on any cluster.
    *
    * A mis-estimate flips only the physical plan, never output. The
    * sample, both statistics and the verdict are logged via
    * [[graft.StrategyLog]].
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      rationalIdf: Boolean = false,
      denseMinDocs: Long = 4096L,
      maxDenseTerms: Int = 4096,
      sampleDocs: Int = 2048,
      denseAboveCandidateRatio: Double = 0.25,
      denseMinCandidatePairs: Long = 1L << 24): DataFrame = {
    val spark = docs.sparkSession
    val dtoks = docs.select(col(idCol).as("__did"),
      TextFunctions.tokens(col(textCol)).as("__dt"))
    // ONE postings exchange carries tf AND doc length (r7): the r5
    // shape derived tf / dl / df from three specialized copies of the
    // tokenize pipeline (plus the join-inferred IsNotNull(__term)
    // diverging a fourth), so the corpus tokenizer ran ~5× at runtime —
    // the q26 canonical-divergence trap, audited the same way (final
    // adaptive plan). Now: __dl rides each exploded row into min(), the
    // not-null guards are stated once at the source, and df_ below
    // aggregates THIS exchange's output, so AQE computes the tokenize +
    // explode + (did,term) shuffle once.
    // explode_OUTER, not explode: the non-outer variant's
    // InferFiltersFromGenerate `size(__dt) > 0` guard pushes to the
    // scan where it RE-RUNS the tokenizer kernel per row (the
    // TextDedup/shingle lesson); outer emits a null row for token-empty
    // docs instead, which the explicit where removes with identical
    // output.
    val postings = dtoks
      .select(col("__did"), size(col("__dt")).cast("long").as("__dl"),
        explode_outer(col("__dt")).as("__term"))
      .where(col("__did").isNotNull && col("__term").isNotNull)
      .groupBy(col("__did"), col("__term"))
      .agg(count(lit(1)).as("__tf"), min(col("__dl")).as("__dl"))
    // Corpus stats must include token-EMPTY documents (they count in N
    // and the avgdl denominator), which postings cannot see — this is
    // the one deliberate second tokenize pass: scan → tokens → size →
    // 1-row partial aggregate, no explode, no wide shuffle.
    val stats = dtoks.agg(count(lit(1)).as("__n"),
      (sum(size(col("__dt"))).cast("double") / count(lit(1))).as("__avgdl"))
    // min(__tf)/min(__dl) are pins, not semantics: without a reference
    // to every non-key postings column, column pruning would specialize
    // df_'s copy of the postings aggregate (count-only, no min) and
    // re-run the corpus pass. They surface in the score expression
    // through greatest() — NOT coalesce: count() output is non-nullable,
    // so NullPropagation would simplify coalesce(__tf, pin) back to
    // __tf and prune the pin (measured). greatest(x, min-over-group-
    // of-x) is the identity on x, but Catalyst cannot prove it.
    val df_ = postings.groupBy(col("__term"))
      .agg(count(lit(1)).as("__df"),
        min(col("__tf")).as("__tfpin"), min(col("__dl")).as("__dlpin"))
      .withColumnRenamed("__term", "__dfterm")
    val qterms = queries.select(col(qidCol).as("query_id"),
        explode_outer(array_distinct(TextFunctions.tokens(col(qtextCol))))
          .as("__qterm"))
      .where(col("__qterm").isNotNull)
    // operand order below is mirrored verbatim by q56's oracle SQL —
    // identical IEEE operations on identical operands are bit-identical
    // (greatest(x, per-group-min-of-x) is the identity on x). Shared by
    // BOTH physical paths, which is what makes the switch output-exact.
    val rational = ((col("__n") - col("__df")).cast("double") + lit(0.5)) /
      (col("__df").cast("double") + lit(0.5))
    val idf = if (rationalIdf) rational else log(rational)
    val tfv = greatest(col("__tf"), col("__tfpin")).cast("double")
    val tfNorm = (tfv * lit(k1 + 1)) /
      (tfv +
        lit(k1) * (lit(1 - b) +
          lit(b) * (greatest(col("__dl"), col("__dlpin")).cast("double")
            / col("__avgdl"))))
    val cExpr = floor(idf * tfNorm * lit(1000000) + lit(0.5)).cast("long")
    // Id-type contract (r12, ADVICE): the heap reductions (topk_agg,
    // bm25_daat_agg) key by LONG. INTEGRAL doc ids ride a lossless
    // widening cast through the heap and cast back at the output;
    // non-integral (string/decimal) doc ids keep the rank-window top-k
    // formulation, which supports any ordered type — the heap is a
    // physical optimization, never a type restriction on the operator.
    val integral = Set[org.apache.spark.sql.types.DataType](
      org.apache.spark.sql.types.ByteType,
      org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType,
      org.apache.spark.sql.types.LongType)
    val dIdType = docs.schema(idCol).dataType
    val qIdType = queries.schema(qidCol).dataType
    // SPARSE inverted-index path — the default, and the fallback for
    // every dense-precondition failure below.
    def sparsePath(): DataFrame = {
      val joined = postings
        .join(broadcast(qterms), col("__term") === col("__qterm"))
        .join(df_, col("__term") === col("__dfterm"))
        .crossJoin(broadcast(stats))
      val scores = joined.select(col("query_id"), col("__did"),
          cExpr.as("__c"))
        .groupBy(col("query_id"), col("__did"))
        .agg(sum(col("__c")).as("score_micro"))
      if (integral(dIdType)) {
        val longIds = scores.select(col("query_id"),
          col("__did").cast("long").as("__did"), col("score_micro"))
        Similarity.topKReduce(longIds, "query_id", "__did",
            "score_micro", k)
          .select(col("query_id"), col("__did").cast(dIdType).as("__did"),
            col("rank"), col("score_micro"))
      } else {
        // rank-window top-k: sorts each query's full candidate list —
        // acceptable for the rare non-integral-id corpus (candidates
        // per query are Σ df, the sparse regime's contract); ties break
        // on the id column's own ordering, matching the heap's long
        // ordering on integral ids
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("score_micro").desc, col("__did").asc)
        scores.withColumn("rank", row_number().over(w))
          .where(col("rank") <= k)
          .select(col("query_id"), col("__did"), col("rank"),
            col("score_micro"))
      }
    }
    def sparse(reason: String): DataFrame = {
      graft.StrategyLog.record("bm25TopK",
        if (integral(dIdType)) "sparse" else "sparse-window", reason)
      sparsePath()
    }
    // Physical strategy switch (r13, VERDICT r12 item 6): the decider
    // is the MEASURED candidate ratio (scaladoc above), estimated from
    // a bounded document sample — the exact Σ df would cost the
    // postings pass the decision exists to avoid. The dict collect is
    // bounded by 4·|queries| ∩ vocabulary; queries are broadcast-small
    // by this operator's contract. Every decision (and the measured
    // values that drove it) is recorded in [[graft.StrategyLog]] —
    // Bench/Verify surface it in their artifacts so a future corpus
    // landing on the wrong side of the boundary is visible post-hoc.
    //
    // Dense preconditions beyond the ratio (r12, ADVICE): Bm25DaatAgg
    // keys its heaps by LONG ids, so the dense path needs INTEGRAL
    // (long-castable without loss) doc AND query id columns, and
    // non-null query ids — a string/decimal id corpus in the dense
    // regime, or a null query id, falls back to sparse (which supports
    // any id type) instead of failing analysis or silently dropping
    // rows.
    val nDocs = docs.count()
    val ranked =
      if (nDocs < denseMinDocs)
        sparse(s"nDocs=$nDocs < denseMinDocs=$denseMinDocs " +
          "(below the sample size the sample IS the corpus, and the " +
          "worst-case sparse state is sampleDocs-bounded)")
      else if (!integral(dIdType) || !integral(qIdType))
        sparse(s"non-integral ids (doc=$dIdType, query=$qIdType), " +
          s"nDocs=$nDocs")
      else {
        // ONE driver collect of the (query, term) pairs — bounded by
        // the broadcast-small query contract — feeds the dict, both
        // ratio statistics AND the dense slot lists below; only the
        // sampled-df estimate needs a (bounded) corpus-side job.
        val qtRows = qterms.collect()
        val terms = qtRows.map(_.getString(1)).distinct.sorted
        lazy val qGroups = qtRows.groupBy(r => Option(r.get(0)))
        lazy val nQueries = qGroups.size.toLong
        lazy val ratioAndN = candidateRatio(dtoks,
          qtRows.map(_.getString(1)), terms, nDocs, sampleDocs, nQueries)
        lazy val ratio = ratioAndN._1
        lazy val sampledN = ratioAndN._2
        lazy val estPairs = (ratio * nDocs * nQueries).toLong
        if (terms.isEmpty || terms.length > maxDenseTerms)
          sparse(s"dict=${terms.length} outside (0, $maxDenseTerms], " +
            s"nDocs=$nDocs")
        // the null-qid veto is a free driver-side lookup on the rows
        // already collected — it must run BEFORE the lazy ratio forces
        // the sampled-df Spark job (r13 review: the job's result would
        // be discarded, and a null-qid + low-ratio corpus would log the
        // ratio as the fallback reason instead of the real veto)
        else if (qGroups.contains(None))
          sparse(s"null query ids present, nDocs=$nDocs")
        else if (ratio < denseAboveCandidateRatio)
          sparse(f"candidateRatio=$ratio%.4f < " +
            f"$denseAboveCandidateRatio%.2f (sampled df over " +
            s"$sampledN hash-spread docs), nDocs=$nDocs")
        else if (estPairs < denseMinCandidatePairs)
          sparse(f"candidateRatio=$ratio%.4f but estPairs=$estPairs < " +
            s"denseMinCandidatePairs=$denseMinCandidatePairs " +
            s"(one small shuffle), nDocs=$nDocs")
        else {
          import spark.implicits._
          val dict = terms.toSeq.zipWithIndex.toDF("__qterm", "__idx")
          // per-(doc, query-term) contribution — same algebra, same df_
          // pins; T-row broadcast side
          val dictDf = broadcast(
            df_.join(broadcast(dict), col("__dfterm") === col("__qterm")))
          val cByDoc = postings
            .join(dictDf, col("__term") === col("__qterm"))
            .crossJoin(broadcast(stats))
            .select(col("__did"), col("__idx"), cExpr.as("__c"))
          // dense per-doc contribution vector: pivot on the slot index —
          // a plain HashAggregate with T sum buffers; NULL = term absent
          val pivoted = cByDoc.groupBy(col("__did"))
            .pivot("__idx", terms.indices.map(i => i: Integer))
            .agg(sum(col("__c")))
          val docVec = pivoted.select(
            col("__did").cast("long").as("__did"),
            array(terms.indices.map(i => col(s"`$i`")): _*).as("__cv"))
          graft.StrategyLog.record("bm25TopK", "dense",
            f"candidateRatio=$ratio%.4f >= " +
              f"$denseAboveCandidateRatio%.2f, estPairs=$estPairs, " +
              s"nDocs=$nDocs, dict=${terms.length}, " +
              s"queries=$nQueries")
          // query slot lists from the same collected rows (ids are
          // integral by the guard above — lossless long widening)
          val termIdx = terms.zipWithIndex.toMap
          val slotPairs = qGroups.toSeq
            .map { case (qid, rows) =>
              (qid.get.asInstanceOf[Number].longValue(),
                rows.map(r => termIdx(r.getString(1))).sorted.toSeq)
            }.sortBy(_._1)
          val queryIds = slotPairs.map(_._1)
          val querySlots = slotPairs.map(_._2)
          // document-at-a-time evaluation: ONE aggregate pass over the
          // 500k-ish doc vectors scores all queries in a primitive
          // loop with a bounded heap per query — no |docs|·|queries|
          // rows ever materialize (the per-pair BNLJ+SlotSum+topk_agg
          // formulation measured 538 s at sf10r; this is the same
          // arithmetic minus the row machinery). SlotSum remains the
          // per-pair kernel for callers that need pair-level scores.
          val bridge = org.apache.spark.sql.graft.ColumnBridge
          val daat = bridge.column(graft.expressions.Bm25DaatAgg(
            bridge.expression(col("__cv")),
            bridge.expression(col("__did")),
            queryIds, querySlots, k).toAggregateExpression())
          docVec.agg(daat.as("__t"))
            .select(explode(col("__t")).as("__e"))
            // ids went through a widening long cast on the way in
            // (integral-only, so lossless and injective); cast back to
            // the caller's schema on the way out
            .select(col("__e.query_id").cast(qIdType).as("query_id"),
              col("__e.id").cast(dIdType).as("__did"),
              col("__e.rank").cast("int").as("rank"),
              col("__e.score_fp").as("score_micro"))
        }
      }
    ranked.select(col("query_id"), col("__did").as("doc_id"),
      col("rank").cast("long").as("rank"), col("score_micro"))
  }

  /** The estimated sparse candidate-pair stream as a fraction of
    * |docs|·|queries| (see [[bm25TopK]]'s scaladoc): per-term df is
    * measured over a bounded document sample and scaled to the corpus,
    * weighted by each term's query multiplicity (`qtermOccurrences`,
    * already driver-side from the caller's one query collect). ONE
    * bounded plan-time job — the sampled-df aggregate over ~sampleDocs
    * tokenized docs. A sample mis-estimate flips only the physical
    * strategy, never output. Returns (ratio, actual sampled docs) so
    * the StrategyLog line reports the sample that was really measured.
    *
    * r14 (ADVICE): the sample is a deterministic HASH-MOD spread over
    * `__did` — `xxhash64(__did) % m == 0` with m sized so the expected
    * hit count is `sampleDocs` — not the old `limit(sampleDocs)`
    * prefix. A corpus whose leading rows are unrepresentative (sorted
    * or clustered by topic/length) biased the prefix's df-hat and
    * could flip the sparse/dense choice to the slow side; the hash
    * spread is order-free, seed-free-deterministic, and the ratio's
    * denominator is the sample's ACTUAL distinct-doc count (grand
    * total of the same one-job rollup), so hash-mod count variance
    * cancels out of df/sampleN.
    */
  private def candidateRatio(dtoks: DataFrame,
      qtermOccurrences: Array[String], terms: Array[String],
      nDocs: Long, sampleDocs: Int, nQueries: Long): (Double, Long) = {
    val spark = dtoks.sparkSession
    import spark.implicits._
    if (nDocs == 0 || nQueries == 0) return (0.0, 0L)
    val m = math.max(1L, nDocs / math.max(1, sampleDocs))
    val dict = broadcast(terms.toSeq.toDF("__st"))
    // Sentinel group for docs with no query-term hits: they must stay
    // in the frame so the rollup's grand total counts EVERY sampled
    // doc, but must not collide with a real term's df row.
    val noneKey = "\u0000none"
    val grouped = dtoks
      .where(pmod(xxhash64(col("__did")), lit(m)) === 0)
      .select(col("__did"), explode_outer(col("__dt")).as("__t"))
      .join(dict, col("__t") === col("__st"), "left")
      .select(col("__did"),
        coalesce(col("__st"), lit(noneKey)).as("__mt"))
      .distinct() // df counts DOCS containing the term, not occurrences
      .rollup(col("__mt"))
      .agg(countDistinct(col("__did")).as("__df"))
      .collect()
    val sampleN = grouped.collectFirst {
      case r if r.isNullAt(0) => r.getLong(1)
    }.getOrElse(0L)
    if (sampleN == 0) return (0.0, 0L)
    val dfSample = grouped.iterator
      .filter(r => !r.isNullAt(0) && r.getString(0) != noneKey)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val qCounts = qtermOccurrences.groupBy(identity)
      .map { case (t, occ) => t -> occ.length.toLong }
    val ratio = terms.iterator.map { t =>
      (dfSample.getOrElse(t, 0L).toDouble / sampleN) *
        qCounts.getOrElse(t, 0L)
    }.sum / nQueries
    (ratio, sampleN)
  }

  /** Reciprocal Rank Fusion: merge N ranked lists — lexical BM25,
    * vector ANN, any other retriever — into one ranking per query,
    * `score(d) = Σ_lists 1/(kRrf + rank_list(d))`. The standard way a
    * hybrid (text + embedding) retrieval stack combines modalities
    * without comparable raw scores: only RANKS cross lists, so a
    * micro-unit BM25 score and a fixed-point dot product need no
    * common scale.
    *
    * Each input must expose `(query_id, doc_id, rank)`. A document
    * missing from one list simply contributes nothing from it (no
    * outer-join NULL handling — fusion is a union + sum). A query id
    * present in only one list degrades gracefully to that list's
    * ranking.
    *
    * Contributions are fixed-point (`floor(1e9/(kRrf + rank))` —
    * single correctly-rounded division, then exact integers), so the
    * fused score is an order-independent BIGINT sum, hash-stable
    * across engines and partitionings like q28/q56's scores.
    *
    * Scale shape: inputs are already per-query top-k lists — tiny
    * relative to the corpora that produced them — so the union +
    * groupBy(query, doc) + per-query WindowGroupLimit all ride on
    * k·|queries|-sized data; the expensive retrieval stays inside the
    * upstream operators.
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, kRrf: Int = 60)
      : DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking to fuse")
    require(k > 0 && kRrf >= 0, "k must be positive, kRrf non-negative")
    val contribs = rankings.map(_.select(col("query_id"), col("doc_id"),
      floor(lit(1e9) /
          (lit(kRrf).cast("double") + col("rank").cast("double")))
        .cast("long").as("__c")))
      .reduce(_ unionByName _)
    val fused = contribs.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("__c")).as("rrf_fp"), count(lit(1)).as("n_lists"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_fp").desc, col("doc_id").asc)
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("rrf_fp"),
        col("n_lists"))
  }

  /** Per-document keyword extraction: the `k` most distinctive tokens
    * of each document by tf-idf — corpus labeling, topic inspection
    * and dedup-cluster naming all start here.
    *
    * Scoring is the log-free rational form `tf · (N − df + 1) / df`
    * (numerator integer-exact, ONE correctly-rounded double division),
    * for the same reason as [[bm25TopK]]'s `rationalIdf`: `ln` is not
    * correctly rounded, so a log-form score is not bit-reproducible
    * across engines. The [[bm25TopK]] caveat applies here too: at FIXED
    * tf the rational idf is strictly monotone in df (so it orders terms
    * of equal frequency exactly as log idf would), but across different
    * tf values rankings CAN differ from classic `tf·ln(N/df)` — the
    * rational form weights rare terms more aggressively than the log
    * damps them, so a df=1 singleton can outrank a high-tf common term
    * that log tf-idf would place first. That bias is a deliberate trade:
    * the ranking is a deterministic, engine-portable function of exact
    * integers, which is what an oracle-checked pipeline needs; callers
    * wanting classic log weighting can rescore the (tf, df, N) columns
    * this operator already emits. Ties break on token text.
    *
    * Scale shape: the same inverted-index skeleton as BM25 — one
    * explode+groupBy builds (doc, token, tf), a narrow aggregate of it
    * builds df, one shuffle-join keyed on token puts them together, and
    * top-k per doc is a WindowGroupLimit (state O(k) per doc, never the
    * full token list).
    */
  /** PMI collocations: the top-k adjacent token pairs by pointwise
    * mutual information — the classic collocation detector (Church &
    * Hanks 1990) a tokenizer/phrase-mining pipeline runs to find
    * multiword units worth fusing. All statistics come from the bigram
    * stream alone (left-slot, right-slot and joint counts over the
    * same N bigram slots), so the score is a pure count ratio:
    * `pmi_fp = floor(1e6 · c_xy·N / (c_x_left · c_y_right))` — exact
    * int64 counts, one correctly-rounded double divide, no logs (log
    * is monotone, so the RANKING equals true PMI's). `minCount` floors
    * the joint count (PMI's low-frequency pathology).
    *
    * Scale shape: one corpus pass emits bigrams; everything after is
    * vocabulary-sized (two broadcast marginal joins + a broadcast
    * single-row total, TakeOrderedAndProject top-k — no global sort).
    */
  def pmiCollocations(docs: DataFrame, idCol: String, textCol: String,
      minCount: Long, k: Int): DataFrame = {
    require(k > 0 && minCount >= 1, "k and minCount must be positive")
    val toks = docs.select(TextFunctions.tokens(col(textCol)).as("__t"))
    val bigrams = toks.select(arrays_zip(
        slice(col("__t"), lit(1), greatest(size(col("__t")) - 1, lit(0)))
          .as("x"),
        slice(col("__t"), lit(2), greatest(size(col("__t")) - 1, lit(0)))
          .as("y")).as("__z"))
      .select(explode_outer(col("__z")).as("__p"))
      .where(col("__p").isNotNull)
      .select(col("__p.x").as("x"), col("__p.y").as("y"))
    val joint = bigrams.groupBy(col("x"), col("y"))
      .agg(count(lit(1)).as("c_xy"))
    val left = joint.groupBy(col("x")).agg(sum(col("c_xy")).as("__cl"))
      .withColumnRenamed("x", "__lx")
    val right = joint.groupBy(col("y")).agg(sum(col("c_xy")).as("__cr"))
      .withColumnRenamed("y", "__ry")
    val total = joint.agg(sum(col("c_xy")).as("__nb"))
    joint.where(col("c_xy") >= minCount)
      .join(broadcast(left), col("x") === col("__lx"))
      .join(broadcast(right), col("y") === col("__ry"))
      .crossJoin(broadcast(total))
      .select(col("x"), col("y"), col("c_xy"),
        floor(lit(1000000.0) *
          (col("c_xy") * col("__nb")).cast("double") /
          (col("__cl") * col("__cr")).cast("double")).cast("long")
          .as("pmi_fp"))
      .orderBy(col("pmi_fp").desc, col("x"), col("y"))
      .limit(k)
  }

  def tfidfKeywords(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val toks = docs.select(col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("__t"))
    // explode_OUTER + null filter: avoids the inferred size() > 0
    // guard re-running the tokenizer at the scan (PLANS.md r7)
    val tf = toks.select(col("doc_id"), explode_outer(col("__t")).as("token"))
      .where(col("token").isNotNull)
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      .withColumnRenamed("token", "__dft")
    val n = toks.agg(count(lit(1)).as("__n"))
    val scored = tf
      .join(df_, col("token") === col("__dft"))
      .crossJoin(broadcast(n))
      .withColumn("score",
        (col("tf") * (col("__n") - col("df") + lit(1L))).cast("double") /
          col("df").cast("double"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("token").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("token"), col("tf"),
        col("df"), col("score"))
  }
}
