package graft

import org.apache.spark.sql.functions.col

/** Physical-plan shape assertions: the optimizations the engine depends on
  * at scale must actually appear in the executed plans, not just in
  * comments. Each test pins one property from the scale design:
  * filter/column pushdown to the scan, broadcast of small sides, map-side
  * partial aggregation, and the top-k operator that avoids a global sort.
  */
class PlanAuditSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q03 range filters push down to the parquet scan") {
    val p = plan("q03_validity_filter")
    assert(p.contains("PushedFilters:"), p.take(500))
    assert(p.contains("GreaterThanOrEqual(l_quantity,10.0)"), p.take(2000))
  }

  test("q03 scan reads only the projected columns") {
    val p = plan("q03_validity_filter")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_discount"))
    assert(!readSchema.contains("l_shipdate"),
      s"scan reads columns the query never uses: $readSchema")
  }

  test("q13 dimension join broadcasts the small side") {
    assert(plan("q13_join_broadcast").contains("BroadcastHashJoin"))
  }

  test("q15/q16 compile to semi/anti joins, not join+distinct") {
    assert(plan("q15_semi_join").contains("LeftSemi"))
    assert(plan("q16_anti_join").contains("LeftAnti"))
  }

  test("q01 aggregation is partial (map-side combine before the shuffle)") {
    val p = plan("q01_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "expected partial + final HashAggregate")
  }

  test("q17 global top-k uses TakeOrderedAndProject, never a global sort") {
    val p = plan("q17_top_k")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q14 keeps the plain join shape: no per-key pre-aggregate, partial agg after the join") {
    // r14 adjudication: a partial-agg pushdown (pre-aggregating lineitem
    // per l_orderkey below the join) measured 1.4× SLOWER than this
    // shape at sf10r on local shuffle — the ~15M-group pre-aggregate
    // costs more than the exchange bytes it saves (see q14JoinAgg's
    // scaladoc for the numbers). This pin keeps the measured-faster
    // shape: the only aggregates are the 5-group priority rollup
    // (partial + final), both ABOVE the join.
    val p = plan("q14_join_agg")
    assert(!p.contains("HashAggregate(keys=[l_orderkey"),
      s"per-order-key pre-aggregate reappeared below the join:\n${p.take(2000)}")
    assert(p.contains("HashAggregate(keys=[o_orderpriority"),
      s"missing priority aggregate:\n${p.take(2000)}")
  }

  test("q28 ANN broadcasts the query vectors (corpus side streams)") {
    assert(plan("q28_ann_topk").contains("Broadcast"))
  }

  test("q20 pipeline whole-stage codegen covers the scalar tower") {
    // AQE finalizes (and annotates codegen spans in) the plan only once
    // THIS dataframe executes — count() would execute a derived plan
    val df = SparkEntry.queries("q20_weather_pipeline")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), p.take(200))
    // AQE final plans mark whole-stage-codegen stages as "*(n) Op"
    assert(p.contains("*(") , "no whole-stage codegen stage in plan")
    assert(p.linesIterator.exists(l => l.contains("*(") && l.contains("Project")
      && l.contains("heat_index")),
      "scalar tower (heat_index projection) fell out of codegen")
    // dedup's row_number()=1 must use the WindowGroupLimit pushdown
    // (partial per-partition limit before the shuffle)
    assert(p.contains("WindowGroupLimit"))
  }

  test("q48 packing window is partitioned (no single-partition global sort)") {
    val p = plan("q48_packing")
    val windowLines = p.linesIterator.filter(_.contains("Window")).toSeq
    assert(windowLines.nonEmpty, "no Window operator in packing plan")
    assert(windowLines.exists(_.contains("shard")),
      s"packing window is not partitioned by shard:\n${windowLines.mkString("\n")}")
  }

  test("q29 banded cosine LSH joins on buckets, never a cross product") {
    val p = plan("q29_cosine_neardup")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      "banded LSH must stay an equi-join on (band, bucket)")
    // the bucket-population guard rides the same (band, bucket) key
    assert(p.contains("Window"), "bucket-size guard window missing")
  }

  test("q70 ranks via value chunks — no per-priority corpus sort") {
    // the scale defect this pins: ntile over partition by
    // o_orderpriority funnels the table through 5 single-task sorts.
    // The r10 plan buckets rows by a min/max-scaled VALUE chunk of the
    // leading sort key (pure row function — the q106 fix class; the
    // former spark_partition_id over a sampled range exchange could
    // disagree between the plan's two consumers) and windows per
    // (chunk, priority); only the P×5-row offset table may window on
    // the bare priority.
    val p = plan("q70_ntile_deciles")
    // every corpus-side window (the row_number computing the local rank)
    // must include the chunk id in its partition spec
    val rankWindows = p.linesIterator
      .filter(l => l.contains("row_number() windowspecdefinition")).toSeq
    assert(rankWindows.nonEmpty, "local-rank window missing")
    assert(rankWindows.forall(_.contains("__chunk")),
      s"corpus rank window not chunk-partitioned:\n${rankWindows.mkString("\n")}")
    // and the chunk id must come from the data, never the exchange
    assert(!p.contains("spark_partition_id"),
      "q70 must not derive chunks from runtime partition ids")
  }

  test("q26 reuses the shingle exchange and carries no object aggregates") {
    // both band-join legs consume one exchange (if the reuse breaks,
    // the corpus is tokenized and shingled twice), and the round-5
    // relational verify must keep the whole plan in codegen hash
    // aggregates — the former collect_set ObjectHashAggregate was the
    // suite's largest residual interpreted stall source and an
    // unbounded per-doc row width at scale
    val df = SparkEntry.queries("q26_minhash_neardup")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange"),
      "the shingle aggregate's exchange must be computed once and reused")
    assert(!p.contains("ObjectHashAggregate") && !p.contains("SortAggregate"),
      "q26 must carry only codegen HashAggregates")
  }

  test("q104 substring dedup: ONE corpus pass, linear join-free pipeline") {
    val df = SparkEntry.queries("q104_substring_dedup")(spark, dir)
    df.collect()
    // count over the FINAL adaptive plan only — the toString repeats the
    // whole tree under "== Initial Plan ==", doubling every occurrence
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // the pipeline is join-free BY CONSTRUCTION (count-over-hash window
    // instead of groupBy+flag-join): the join formulation measured THREE
    // corpus scans here — column pruning and join-inferred not-null
    // filters diverge the consumers' subtrees past ReuseExchange (the
    // r7 q26 trap). Linear means the corpus text provably streams once.
    assert(!p.contains("Join"), s"q104 must stay join-free:\n${p.take(1500)}")
    assert("token_array\\(".r.findAllIn(p).size == 1,
      "tokenizer must appear in exactly one scan subtree")
    assert("shingle_array\\(".r.findAllIn(p).size == 1,
      "shingle kernel must appear in exactly one scan subtree")
    // span merge must window per document, never a global sort; the
    // occurrence count windows on the hash
    val windowLines = p.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(windowLines.nonEmpty &&
      windowLines.forall(l => l.contains("doc_id") || l.contains("__h")),
      s"unexpected window partitioning:\n${windowLines.mkString("\n")}")
  }

  test("q53 IVF probe is a broadcast equi-join on cells, no cross product") {
    val p = plan("q53_ivf_ann")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      "IVF probe must stay an equi-join on the cell id")
    assert(p.contains("Broadcast"), "probed query cells should broadcast")
  }

  test("q32 as-of join is one exchange per side + window, no cross product") {
    val p = plan("q32_asof_join")
    assert(p.contains("Window"))
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      "as-of join must not degrade to a cross join")
  }

  test("q55 connected components: equi-joins only, checkpointed lineage") {
    val df = SparkEntry.queries("q55_dup_clusters")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      "star-contraction rounds must stay equi-joins on the node id")
    // the converged edge set enters the final plan as a checkpointed
    // scan, not as the unrolled multi-round join tree
    assert(p.contains("Scan ExistingRDD") || p.contains("LocalTableScan"),
      "iteration lineage was not truncated by localCheckpoint")
  }

  test("q56 BM25 broadcasts query terms and stats; postings never cross-join") {
    val p = plan("q56_bm25_topk")
    assert(!p.contains("CartesianProduct"),
      "BM25 must stay equi-joins on term/doc keys")
    assert(p.contains("BroadcastHashJoin"),
      "query-term side should broadcast against the postings")
    // top-k per query rides the native heap aggregate (r11) — the rank
    // window it replaced sorted the full scored stream per partition
    assert(p.contains("topk_agg"))
  }

  test("q57 decontamination joins on the fixed-width hash, eval broadcast") {
    val p = plan("q57_decontam")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"))
    assert(p.contains("BroadcastHashJoin"),
      "eval n-gram side should broadcast (corpus side must stream)")
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("n_chars"),
      s"decontamination reads columns it never uses: $readSchema")
  }

  test("q67 bloom probe broadcasts the word table; probe side never cross-joins") {
    val p = plan("q67_bloom_semijoin")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p.take(500))
    assert(p.contains("BroadcastHashJoin"),
      "the <=m/32-row word table must broadcast to the probe side")
  }

  test("q71 per-stratum sample pushes rank<=k into the sort (WindowGroupLimit)") {
    assert(plan("q71_stratum_sample").contains("WindowGroupLimit"))
  }

  test("q74 edit-distance pairing window is partitioned, not global-order") {
    val p = plan("q74_edit_distance")
    assert(!p.contains("SinglePartition"),
      s"global-order window would serialize at scale: ${p.take(800)}")
  }

  test("q78 keyword top-k pushes rank<=k into the sort (WindowGroupLimit)") {
    val p = plan("q78_keywords")
    assert(p.contains("WindowGroupLimit"), p.take(800))
  }

  test("q79 z-order stats are one narrow map + partial aggregate, no join") {
    val p = plan("q79_zorder")
    assert(!p.contains("Join"), "z-value must be computed row-local")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "expected partial + final HashAggregate on the bucket id")
  }

  test("q80 skew report broadcasts totals and takes a global top-k") {
    val p = plan("q80_skew_report")
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "1-row totals side must broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("q81 MAD medians broadcast back onto rows; no cartesian") {
    val p = plan("q81_mad_outliers")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("CartesianProduct"))
  }

  test("q82 cohort retention avoids the multi-distinct Expand") {
    // count(DISTINCT u) per offset would compile to an Expand that
    // multiplies the shuffle by (offsets + 1); the (user, day) distinct
    // already guarantees one row per user per offset, so the operator
    // must use plain conditional counts.
    val p = plan("q82_cohort")
    assert(!p.contains("Expand"),
      "multi-distinct Expand reappeared — retention must use plain counts")
    assert(p.contains("BroadcastHashJoin"),
      "per-user cohort side should broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("q83 incremental dedup: bloom words broadcast, exact check is anti-join") {
    val p = plan("q83_incremental_dedup")
    assert(p.contains("BroadcastHashJoin"), "bloom word table must broadcast")
    assert(p.contains("LeftAnti"), "exact membership check must be anti-join")
    assert(!p.contains("CartesianProduct"))
  }

  test("q84 winsorization broadcasts the fences; no cartesian") {
    val p = plan("q84_winsorized")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("CartesianProduct"))
  }

  test("q85 profile aggregates are partial (map-side combine)") {
    val p = plan("q85_table_profile")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(800))
    assert(!p.contains("CartesianProduct"))
  }

  test("q86 active users explodes to equi-joins, never a range nested loop") {
    val p = plan("q86_active_users")
    assert(p.contains("Generate explode"), "bounded 1-to-w explode missing")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      "trailing window degenerated to a non-equi join")
    assert(p.contains("LeftSemi"), "observed-day grid filter must be semi-join")
  }

  test("q93 boilerplate set broadcasts back; df agg is partial; no cartesian") {
    val p = plan("q93_boilerplate")
    // The raw exploded (doc, shingle) stream must never shuffle for the
    // hit join — the tiny heavy-hitter set comes TO it (Boilerplate
    // scaladoc). The only wide exchange is the df aggregation, which
    // must combine map-side.
    assert(p.contains("BroadcastHashJoin"),
      s"boilerplate set no longer broadcasts:\n${p.take(800)}")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "df aggregation lost map-side partial combine")
    assert(!p.contains("CartesianProduct"))
  }

  test("q94 LM: prefix table broadcasts, counts aggregate partially, no cartesian") {
    val p = plan("q94_bigram_lm")
    assert(p.contains("BroadcastHashJoin"),
      s"unigram-prefix table no longer broadcasts:\n${p.take(800)}")
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      "bigram/prefix counts lost map-side partial aggregation")
    assert(!p.contains("CartesianProduct"))
  }

  test("q96 semdedup pairs via cell equi-join, never an all-pairs product") {
    val p = plan("q96_semdedup")
    // The quadratic must stay CONFINED per cell: the pair stage is an
    // equi-join on the cell id; a planner fallback to a nested-loop or
    // cartesian over the whole table is the O(n^2) regression SemDeDup
    // exists to avoid.
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"pair stage degenerated to an all-pairs nested loop:\n${p.take(800)}")
  }

  test("q97 curation: signal branches aggregate partially, no cartesian") {
    val p = plan("q97_curation")
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      "signal pipelines lost map-side partial aggregation")
    assert(p.contains("BroadcastHashJoin"),
      "small-side signal joins should broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("ENGINE-WIDE: interpreted-eval constructs pinned to the whitelist") {
    // Interpreted expression paths (HOF lambdas, object/sort-aggregate
    // update loops) were the round-4/5 bench killer (BASELINE.md
    // §round-5) and are slow on a cluster even when a fresh JVM hides
    // it. The engine-wide invariant after round 5: NO query plan may
    // contain a higher-order lambda, a sort aggregate, or a cartesian
    // product, and only these two intrinsic object aggregates remain —
    // q44 (collect_list IS the operator under test) and q64 (Spark's
    // percentile_approx sketch buffer). Growing this whitelist needs a
    // measured justification, not a convenient formulation.
    //
    // q111 joined the list in round 8: hll_sketch_agg / hll_union_agg
    // are TypedImperativeAggregates over DataSketches HLL state —
    // ObjectHashAggregate is the ONLY physical operator Spark has for
    // them, and the mergeable-sketch store is exactly the operator
    // under test (the per-day sketch is the thing being materialized).
    // The aggregate runs over (day, user) pairs after a narrow
    // projection, so the object path touches no wide rows.
    // q116: theta_sketch_agg is the engine's own TypedImperativeAggregate
    // (graft.expressions.ThetaSketchAgg) — same physical shape as q111's
    // hll_sketch_agg, and the sketch aggregate IS the operator under test.
    // q122: freq_sketch_agg/freq_merge_agg are the engine's own
    // TypedImperativeAggregates (graft.expressions.FreqSketchAgg) —
    // same rationale as q111/q116.
    // q158: kll_sketch_agg/kll_merge_agg likewise
    // (graft.expressions.KllSketchAgg — the quantile-store member of
    // the same sketch family).
    // q160/q164 (round 9): the same KLL store built incrementally /
    // by a stream — identical aggregate, identical rationale.
    // r11 additions: topk_agg (graft.expressions.TopKAgg) is the native
    // bounded-heap top-k reduction behind Similarity.topKReduce — the
    // aggregate IS the operator under test (exact order statistics, the
    // same TypedImperativeAggregate shape as the sketches), replacing
    // rank windows that sorted/spilled the full scored pair stream at
    // sf10r pair volumes. q28/q50 (brute-force ANN baselines), q56/q95
    // (BM25 top-k; q95 also fuses the ANN leg), q133/q139 (adaptiveTopK
    // exact arm at oracle SFs).
    val objAggWhitelist = Set("q44_collect_sorted", "q64_approx_quantiles",
      "q111_sketch_store", "q116_theta_overlap", "q122_freq_store",
      "q158_quantile_store", "q160_quantile_store_inc",
      "q164_stream_quantiles",
      "q28_ann_topk", "q50_text_ann", "q56_bm25_topk", "q95_hybrid_rrf",
      "q133_knn_label", "q139_hard_negatives")
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      val p = fn(spark, dir).queryExecution.executedPlan.toString
      Seq(
        if (p.contains("lambdafunction(")) Some(s"$name: LAMBDA") else None,
        if (p.contains("ObjectHashAggregate") && !objAggWhitelist(name))
          Some(s"$name: OBJAGG") else None,
        if (p.contains("SortAggregate")) Some(s"$name: SORTAGG") else None,
        if (p.contains("CartesianProduct")) Some(s"$name: CARTESIAN") else None,
      ).flatten
    }
    assert(offenders.isEmpty,
      s"interpreted-eval constructs crept into plans:\n${offenders.mkString("\n")}")
  }

  test("ENGINE-WIDE: unpartitioned windows run over aggregated (grid-sized) input") {
    // A Window with no PARTITION BY funnels every input row through ONE
    // task — the classic scale cliff. The engine's 7 unpartitioned
    // window call sites are each benign BY CONSTRUCTION (they window
    // over post-aggregate grids: sources, length buckets, Benford
    // digits, nChunks-row boundary merges) — this sweep makes the
    // invariant impossible to regress (VERDICT r9 item 6): every
    // unpartitioned WindowExec in every registered query must have an
    // aggregate somewhere below it in the same subtree, so its input
    // cardinality is group-count-sized, never raw-row-sized. A global
    // top-k wants TakeOrderedAndProject / WindowGroupLimit instead and
    // never trips this.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.window.WindowExec
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    def hasAggBelow(p: SparkPlan): Boolean =
      p.collectFirst { case _: BaseAggregateExec => () }.nonEmpty
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      val plan = unwrap(fn(spark, dir).queryExecution.executedPlan)
      plan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty
            && !hasAggBelow(w.child) =>
          s"$name: global window over non-aggregated input " +
            s"(${w.windowExpression.map(_.sql).mkString(", ").take(120)})"
      }
    }
    assert(offenders.isEmpty,
      s"raw-row global windows crept into plans:\n${offenders.mkString("\n")}")
  }

  test("ENGINE-WIDE: no text/vector kernel ever re-runs inside a scan filter") {
    // InferFiltersFromGenerate turns a non-outer explode over a
    // kernel-computed array into a size(kernel(...)) > 0 predicate that
    // predicate-pushdown lands in the scan's DataFilters — the kernel
    // then runs once for the filter and again for the projection, per
    // row (r7; PLANS.md addendum trap 3). The engine-wide rule: heavy
    // kernels appear in Project/Generate/Aggregate nodes only, never in
    // a Filter or scan DataFilters. explode_outer + an explicit
    // null-filter is the sanctioned pattern.
    val kernels = Seq("token_array(", "shingle_array(", "shingle_hash64(",
      "scale_array(", "token_profile(", "deflate_ratio(")
    val filterLine = """(?m)^.*(Filter |DataFilters: ).*$""".r
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      val p = fn(spark, dir).queryExecution.executedPlan.toString
      filterLine.findAllIn(p).toSeq.flatMap { line =>
        kernels.filter(line.contains).map(k => s"$name: $k in ${line.trim.take(120)}")
      }
    }
    assert(offenders.isEmpty,
      s"kernel evaluation inside a filter:\n${offenders.mkString("\n")}")
  }

  test("q77 winnow fingerprints carry no higher-order lambdas and one gram shuffle") {
    val p = plan("q77_winnow_overlap")
    // the hash must live in a flat (codegen-able) projection: interpreted
    // HOF lambdas around md5 were measured unstable (see TextDedup doc).
    // The tokenizer's filter(split(...)) lambda is fine — it is the
    // md5/conv tower inside a lambda that must never come back.
    assert(!p.contains("lambdafunction(cast(conv("),
      s"winnow hash moved back inside a higher-order lambda:\n${p.take(1200)}")
    assert(p.contains("md5"), "portable md5 hash missing from the plan")
    assert(!p.contains("CartesianProduct"))
  }

  test("q50 hashEmbed unrolled aggregate stays inside whole-stage codegen") {
    // hashEmbed unrolls `dim` sum(when(...)) columns; past
    // spark.sql.codegen.maxFields (default 100) codegen silently bails
    // and the stage runs interpreted. The dim cap in TextFeatures holds
    // the line; this pins that the executed plan actually keeps the
    // unrolled aggregate (its __c<i> aliases) inside a codegen'd span
    // and never falls back to an object aggregate.
    val df = SparkEntry.queries("q50_text_ann")(spark, dir)
    df.collect()
    // AQE's toString appends an "== Initial Plan ==" section whose
    // operators never carry codegen stars — audit only the final plan
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val aggLines = p.linesIterator
      .filter(l => l.contains("HashAggregate") && l.contains("__c0")).toSeq
    assert(aggLines.nonEmpty, s"unrolled embed aggregate missing:\n${p.take(1200)}")
    assert(aggLines.forall(_.contains("*(")),
      s"embed aggregate fell out of whole-stage codegen:\n${aggLines.mkString("\n")}")
    // the only object aggregate allowed is the r11 top-k heap reduction
    // downstream of the embed; the embed itself must stay codegen'd
    assert(p.linesIterator.filter(_.contains("ObjectHashAggregate"))
        .forall(_.contains("topk_agg")),
      "hashEmbed path must carry no object aggregates besides topk_agg")
  }

  test("q88 salted join runs as a shuffled join on (key, salt), no broadcast") {
    val p = plan("q88_salted_join")
    // the whole point is spreading a hot key across reducers; a broadcast
    // of the dim would silently bypass the mechanism under test
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      p.take(1200))
    assert(p.contains("__salt"), "join keys must include the salt")
    assert(!p.contains("CartesianProduct"))
  }

  test("q89 bucketed join subtree is exchange-free on both sides") {
    // build just the join (the query's final aggregate legitimately
    // shuffles); the bucket layout must eliminate both join exchanges
    graft.sources.Bucketing.writeBucketed(
      spark.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey"), col("c_mktsegment")),
      "g89a_customer", "c_custkey", 8)
    graft.sources.Bucketing.writeBucketed(
      spark.read.parquet(s"$dir/orders.parquet")
        .select(col("o_custkey").as("c_custkey"), col("o_totalprice")),
      "g89a_orders", "c_custkey", 8)
    try {
      val j = graft.sources.Bucketing.bucketedJoin(
        spark, "g89a_customer", "g89a_orders", "c_custkey")
      j.collect()
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p.take(1200))
      assert(!p.contains("Exchange"),
        s"bucketed join still shuffles:\n${p.take(1500)}")
    } finally {
      spark.sql("DROP TABLE IF EXISTS g89a_customer")
      spark.sql("DROP TABLE IF EXISTS g89a_orders")
    }
  }

  test("q26 minhash scans+shingles the corpus exactly once (AQE stage reuse)") {
    // The LSH pipeline references the corpus from four places (band
    // self-join legs, two intersection-join legs) plus the signature
    // aggregate; all of them must collapse onto ONE shingle pass at
    // runtime. Two historical traps, both canonicalization divergences
    // the static plan can't show (only the final adaptive plan can):
    // an inferred IsNotNull(__sh) pushed below one copy's distinct, and
    // column pruning dropping __n from one candidates copy — each cost
    // a full extra corpus scan+hash. The corpus here is a 2-way union,
    // so "one pass" = exactly 2 FileScans / 2 shingle kernels.
    val df = SparkEntry.queries("q26_minhash_neardup")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), p.take(200))
    val finalPlan = p.split("== Initial Plan ==")(0)
    val scans = "FileScan parquet".r.findAllIn(finalPlan).size
    val kernels = "shingle_hash64".r.findAllIn(finalPlan).size
    assert(scans == 2, s"corpus re-scanned: $scans FileScans in final plan")
    assert(kernels == 2, s"shingle kernel duplicated: $kernels occurrences")
    assert(finalPlan.contains("ReusedExchange"),
      "no runtime exchange reuse in q26 final plan")
  }

  test("q136 decontam broadcasts the benchmark side; rank-1 is group-limited") {
    val p = plan("q136_fuzzy_decontam")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      p.take(800))
    assert(p.contains("BroadcastHashJoin"),
      "the benchmark (eval-suite) side must broadcast")
    assert(p.contains("WindowGroupLimit"),
      "best-match rank must push the rn=1 limit into the sort")
  }

  test("q138 drift totals reuse the vocab aggregate exchange (one corpus pass)") {
    val df = SparkEntry.queries("q138_token_drift")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), p.take(200))
    val finalPlan = p.split("== Initial Plan ==")(0)
    assert(finalPlan.contains("ReusedExchange"),
      "grand totals must reuse the per-token count exchange, not re-explode")
    assert(finalPlan.contains("TakeOrderedAndProject"),
      "top-50 drift must be a heap take, not a global sort")
  }

  test("q139 hard negatives broadcast the query side; top-3 is group-limited") {
    val p = plan("q139_hard_negatives")
    assert(p.contains("Broadcast"), "query vectors must broadcast")
    assert(p.contains("WindowGroupLimit"), p.take(800))
  }

  test("q152 vocab is a heap take-k and broadcasts against the token stream") {
    val p = plan("q152_oov_coverage")
    assert(p.contains("TakeOrderedAndProject"),
      "top-1000 vocab must be a heap take, never a global sort")
    assert(p.contains("BroadcastHashJoin"),
      "the 1000-row vocab must broadcast; the corpus token stream " +
        "must not shuffle for the membership join")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      p.take(800))
  }

  test("q155 containment join: no cross product, verify is candidate-only") {
    val p = plan("q155_containment_join")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      p.take(800))
    assert(p.contains("sorted_intersect_count"),
      "verify must be the merge-walk kernel, not a per-pair hash set")
  }

  test("q157 fisher: one posexplode pass, hash aggregates only") {
    val p = plan("q157_fisher_score")
    assert("(?i)generate".r.findAllIn(p).size <= 2,
      "embedding must explode once (plan may print it twice across " +
        "adaptive sections), never per-class: " + p.take(400))
    assert(!p.toLowerCase.contains("sortaggregate"), p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(400))
  }

  test("q151/q154 cluster queries: one uniform-key shuffle, no cross product") {
    Seq("q151_split_leakage", "q154_best_of_dup").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
        s"$q: ${p.take(800)}")
      assert(!p.toLowerCase.contains("sortaggregate"),
        s"$q must hash-aggregate: ${p.take(800)}")
    }
  }

  test("q161 hrw reshard: pure projection + one hash aggregate, no lambdas") {
    val p = plan("q161_hrw_reshard")
    assert(!p.contains("lambdafunction("),
      "the 25 md5 towers and the struct-greatest argmax must unroll " +
        "at build time, not evaluate as HOFs: " + p.take(600))
    assert(!p.toLowerCase.contains("sortaggregate"), p.take(800))
    assert(!p.contains("Join"), "no join anywhere — routing is a pure " +
      "function of doc_id: " + p.take(600))
  }

  test("q162 k-core: equi/semi joins only, hash-aggregated degrees") {
    val p = plan("q162_token_kcore")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      p.take(800))
    assert(!p.toLowerCase.contains("sortaggregate"), p.take(800))
  }

  test("q163 centroid drift: one posexplode pass, hash aggregates only") {
    val p = plan("q163_centroid_drift")
    assert("(?i)generate".r.findAllIn(p).size <= 2,
      "embedding must explode once (adaptive sections may reprint): " +
        p.take(400))
    assert(!p.toLowerCase.contains("sortaggregate"), p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(400))
  }

  test("q176 haar builds the 32 day columns in ONE partial-agg pass") {
    val p = plan("q176_haar_bursts")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "expected partial + final HashAggregate for the day columns")
    assert(!p.contains("lambdafunction("),
      "the 31-coefficient tower must unroll statically: " + p.take(600))
    assert("FileScan".r.findAllIn(p).size <= 1,
      "the transform must not re-scan events: " + p.take(600))
  }

  test("q191 GDD is two hash aggregates after the dedup window") {
    val p = plan("q191_growing_degree_days")
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      "expected partial+final pairs for daily extremes and month rollup")
    assert(!p.toLowerCase.contains("sortaggregate"), p.take(800))
    assert(!p.contains("CartesianProduct"), p.take(400))
  }

  test("q169 geo nearest is MAP-ONLY up to the 15-group rollup: no join") {
    val p = plan("q169_geo_nearest")
    assert(!p.contains("Join"), "the 15-site argmin must unroll into a " +
      "flat projection, never a dim join: " + p.take(600))
    assert(!p.contains("lambdafunction("), p.take(600))
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "expected partial + final HashAggregate for the region rollup")
  }

  test("q171 weighted sample takes top-k without a global sort or explode") {
    val p = plan("q171_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"), p.take(600))
    assert(!p.contains("Generate"), "ticket fold must unroll, not " +
      "explode a per-weight sequence: " + p.take(600))
    assert(!p.contains("lambdafunction("), p.take(600))
  }

  test("q172 LCP windows are partitioned (no single-partition global sort)") {
    val p = plan("q172_prefix_order")
    // the only SinglePartition exchanges allowed are the two scalar
    // (count,sum) rollups AFTER the per-pair LCP projection; the lag
    // windows themselves must hash-partition on the block/bucket keys
    assert("Exchange hashpartitioning".r.findAllIn(p).size >= 2,
      "both lag windows must exchange on their pairing keys: " +
        p.take(800))
    assert("Exchange SinglePartition".r.findAllIn(p).size <= 2,
      "only the two 2-row scalar rollups may single-partition: " +
        p.take(800))
    assert(p.contains("Window"), p.take(400))
    assert(!p.contains("lambdafunction("), p.take(600))
  }
}
