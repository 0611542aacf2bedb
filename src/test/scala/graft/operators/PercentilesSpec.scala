package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PercentilesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val lineitem =
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

  test("BOTH strategies are BIT-identical to the Percentile aggregate") {
    // r12: the strategy is adaptive (window below smallInputRows,
    // chunked above). Force each path explicitly and pin both against
    // the in-memory aggregate — the cutover must be invisible in
    // results at ANY threshold.
    val probes = Seq(0.0 -> "0", 0.25 -> "25", 0.5 -> "50",
      0.95 -> "95", 1.0 -> "100")
    val buffer = lineitem.groupBy(col("l_returnflag"))
      .agg(percentile(col("l_extendedprice"),
        array(probes.map(p => lit(p._1)): _*)).as("p"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getSeq[Double](1).toIndexedSeq))
    for (threshold <- Seq(0L, Long.MaxValue)) {
      val sortBased = Percentiles.exact(lineitem, Seq("l_returnflag"),
          "l_extendedprice", probes, threshold)
        .orderBy("l_returnflag").collect()
        .map(r => (r.getString(0), probes.indices.map(i => r.getDouble(i + 1))))
      assert(sortBased.length === buffer.length)
      sortBased.zip(buffer).foreach { case ((g1, v1), (g2, v2)) =>
        assert(g1 === g2)
        v1.zip(v2).foreach { case (a, b) =>
          assert(java.lang.Double.doubleToRawLongBits(a)
            === java.lang.Double.doubleToRawLongBits(b),
            s"threshold $threshold group $g1: $a vs $b differ at bit level")
        }
      }
    }
  }

  test("chunked ranking: ties straddling chunk boundaries and skew match the aggregate") {
    // r12: ranking is chunk-decomposed (q70 shape). Adversarial input
    // for the decomposition: heavy ties (few distinct values, so tie
    // runs cross min/max-scaled chunk boundaries), skew (99% of rows in
    // one value region), and a constant-valued group (span 0 — its
    // mutually-tied rows salt across chunks by full-row hash, r12.2).
    val rnd = new scala.util.Random(7)
    val rows = (0 until 5000).map { i =>
      val g = s"g${i % 3}"
      val v = if (i % 3 == 2) 42.0 // constant group
        else if (rnd.nextDouble() < 0.99) (rnd.nextInt(5) + 1).toDouble
        else 1000.0 + rnd.nextInt(3)
      (g, v)
    }
    val df = rows.toDF("g", "v").repartition(8)
    val probes = Seq(0.0 -> "0", 0.1 -> "10", 0.5 -> "50",
      0.9 -> "90", 1.0 -> "100")
    val got = Percentiles.exact(df, Seq("g"), "v", probes, 0L)
      .orderBy("g").collect()
      .map(r => (r.getString(0), probes.indices.map(i => r.getDouble(i + 1))))
    val want = df.groupBy(col("g"))
      .agg(percentile(col("v"), array(probes.map(p => lit(p._1)): _*)).as("p"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getSeq[Double](1).toIndexedSeq))
    assert(got.length === want.length)
    got.zip(want).foreach { case ((g1, v1), (g2, v2)) =>
      assert(g1 === g2)
      v1.zip(v2).foreach { case (a, b) =>
        assert(java.lang.Double.doubleToRawLongBits(a)
          === java.lang.Double.doubleToRawLongBits(b),
          s"group $g1: $a vs $b differ at bit level")
      }
    }
  }

  test("chunked ranking distributes the sort: no single per-group window over the data") {
    // The data-side window must partition by (__chunk, group) — the
    // whole point of the r12 decomposition; a group-only partitioning
    // over the value stream would put each group on ONE sort task at
    // any scale. The group-only windows that remain ride the bounded
    // chunk-count side table (counts, not data rows).
    val df = lineitem.select(col("l_returnflag"), col("l_extendedprice"))
    val plan = Percentiles.exact(df, Seq("l_returnflag"),
        "l_extendedprice", Seq(0.5 -> "50"), 0L)
      .queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    val dataWindows = windows.filter(
      _.windowExpressions.exists(_.sql.contains("row_number")))
    assert(dataWindows.nonEmpty, "local-rank window missing")
    dataWindows.foreach { w =>
      assert(w.partitionSpec.exists(_.sql.contains("__chunk")),
        s"data-side window not chunk-partitioned: ${w.partitionSpec}")
    }
  }

  test("adaptive cutover picks window below the threshold, chunked above, and logs it") {
    graft.StrategyLog.drain()
    Percentiles.exact(lineitem, Seq("l_returnflag"), "l_extendedprice",
      Seq(0.5 -> "50")).collect() // sf0.001: far below smallInputRows
    val small = graft.StrategyLog.drain()
      .filter(_.op == "percentiles.exact")
    assert(small.map(_.strategy) === Seq("window"))
    Percentiles.exact(lineitem, Seq("l_returnflag"), "l_extendedprice",
      Seq(0.5 -> "50"), 100L).collect() // force the scale side
    val big = graft.StrategyLog.drain()
      .filter(_.op == "percentiles.exact")
    assert(big.map(_.strategy) === Seq("chunked"))
  }

  test("NULL group keys survive BOTH strategies (Profile relies on it)") {
    // r12 review: the chunked path's offsets join must be null-safe on
    // the group columns — a null-unsafe equi-join silently drops every
    // NULL-group row, diverging from the window path and the aggregate.
    val df = Seq((Some("a"), 1.0), (Some("a"), 3.0), (None, 10.0),
      (None, 20.0), (None, 30.0)).toDF("g", "v")
    val want = df.groupBy(col("g"))
      .agg(percentile(col("v"), lit(0.5)).as("p50"))
      .orderBy(col("g").asc_nulls_first).collect()
      .map(r => (Option(r.getString(0)), r.getDouble(1))).toSeq
    for (threshold <- Seq(0L, Long.MaxValue)) {
      val got = Percentiles.exact(df, Seq("g"), "v",
          Seq(0.5 -> "50"), threshold)
        .orderBy(col("g").asc_nulls_first).collect()
        .map(r => (Option(r.getString(0)), r.getDouble(1))).toSeq
      assert(got === want, s"threshold $threshold")
    }
  }

  test("NaN values rank last in both strategies and do not poison the chunk span") {
    // r12 review: max(v) propagates NaN; unguarded, span=NaN collapses
    // every row into one chunk (silent de-parallelization). Bounds now
    // exclude NaN and NaN rows go to the top chunk explicitly.
    val df = ((1 to 100).map(i => ("a", i.toDouble)) ++
      Seq(("a", Double.NaN), ("a", Double.NaN))).toDF("g", "v")
    val results = Seq(0L, Long.MaxValue).map { threshold =>
      Percentiles.exact(df, Seq("g"), "v",
          Seq(0.5 -> "50", 1.0 -> "100"), threshold)
        .select("p50", "p100").as[(Double, Double)].head()
    }
    assert(results.head._1 === results.last._1,
      "p50 must agree across strategies")
    // 102 rows, NaN last: p50 = interpolated between ranks 50 and 51
    assert(results.forall(_._1 === (0.5 * 51 + 0.5 * 52)))
    assert(results.forall(r => r._2.isNaN), "p100 is the NaN maximum")
  }

  test("nulls in the value column are skipped like the aggregate does") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)),
      ("a", Some(2.0))).toDF("g", "v")
    val got = Percentiles.exact(df, Seq("g"), "v", Seq(0.5 -> "50"))
      .select("p50").as[Double].head()
    assert(got === 2.0)
  }

  test("single-row group returns that value for every probe") {
    val df = Seq(("a", 7.5)).toDF("g", "v")
    val got = Percentiles.exact(df, Seq("g"), "v",
        Seq(0.0 -> "0", 0.5 -> "50", 1.0 -> "100"))
      .select("p0", "p50", "p100").as[(Double, Double, Double)].head()
    assert(got === ((7.5, 7.5, 7.5)))
  }

  test("per-group bounds: a group confined to a narrow slice of the global range still matches") {
    // r12.2: chunk scaling is PER-GROUP. Under global bounds a large
    // group whose values occupy a sliver of the global range ([0, 1e-3]
    // next to a [0, 1e9] group) collapses into chunk 0 — one sort task
    // at any scale. Per-group scaling spreads it; results must stay
    // bit-identical to the aggregate either way.
    val rnd = new scala.util.Random(11)
    val rows = (0 until 4000).map { i =>
      if (i % 2 == 0) ("narrow", rnd.nextDouble() * 1e-3)
      else ("wide", rnd.nextDouble() * 1e9)
    } :+ (("narrow", Double.NaN))
    val df = rows.toDF("g", "v").repartition(8)
    val probes = Seq(0.1 -> "10", 0.5 -> "50", 0.9 -> "90")
    val want = df.groupBy(col("g"))
      .agg(percentile(col("v"), array(probes.map(p => lit(p._1)): _*))
        .as("p"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getSeq[Double](1).toIndexedSeq))
    graft.StrategyLog.drain()
    val got = Percentiles.exact(df, Seq("g"), "v", probes, 0L)
      .orderBy("g").collect()
      .map(r => (r.getString(0), probes.indices.map(i => r.getDouble(i + 1))))
    val decisions = graft.StrategyLog.drain()
      .filter(_.op == "percentiles.exact")
    assert(decisions.exists(_.detail.contains("bounds=per-group")),
      s"expected per-group bounds, got: ${decisions.map(_.detail)}")
    assert(got.length === want.length)
    got.zip(want).foreach { case ((g1, v1), (g2, v2)) =>
      assert(g1 === g2)
      v1.zip(v2).foreach { case (a, b) =>
        assert(java.lang.Double.doubleToRawLongBits(a)
          === java.lang.Double.doubleToRawLongBits(b),
          s"group $g1: $a vs $b differ at bit level")
      }
    }
  }

  test("constant-valued group salts its tied rows across chunks without corrupting ranks") {
    // r12.2: measured span 0 proves every non-NaN value in the group is
    // equal, so chunk assignment is a free choice — the full-row hash
    // spreads the sort. A spread group shares the frame to prove the
    // salting never leaks into scaled groups, and extra row content
    // (the id column) gives the hash entropy.
    val rows = (0 until 3000).map(i => ("flat", i.toLong, 42.0)) ++
      (0 until 3000).map(i => ("spread", i.toLong, i.toDouble))
    val df = rows.toDF("g", "id", "v").repartition(8)
    val probes = Seq(0.0 -> "0", 0.5 -> "50", 1.0 -> "100")
    val want = df.groupBy(col("g"))
      .agg(percentile(col("v"), array(probes.map(p => lit(p._1)): _*))
        .as("p"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getSeq[Double](1).toIndexedSeq))
    val got = Percentiles.exact(df, Seq("g"), "v", probes, 0L)
      .orderBy("g").collect()
      .map(r => (r.getString(0), probes.indices.map(i => r.getDouble(i + 1))))
    assert(got.length === want.length)
    got.zip(want).foreach { case ((g1, v1), (g2, v2)) =>
      assert(g1 === g2)
      v1.zip(v2).foreach { case (a, b) =>
        assert(java.lang.Double.doubleToRawLongBits(a)
          === java.lang.Double.doubleToRawLongBits(b),
          s"group $g1: $a vs $b differ at bit level")
      }
    }
  }

  test("probe pruning engages under the group cap, full-sort past it; both match the aggregate") {
    // r12.2 step 5: with few groups only probe-rank chunks are sorted
    // (log says probe-pruned); past maxPruneGroups the side tables
    // would stop being broadcast-bounded, so the full-sort shape runs.
    // Both must be bit-identical to the aggregate.
    val rnd = new scala.util.Random(13)
    val few = (0 until 6000).map(i => (s"g${i % 4}", rnd.nextDouble()))
      .toDF("g", "v").repartition(8)
    val many = (0 until 70000).map(i => (s"g$i", rnd.nextDouble()))
      .toDF("g", "v").repartition(8) // 70000 > maxPruneGroups = 65536
    assert(70000L > Percentiles.maxPruneGroups)
    val probes = Seq(0.25 -> "25", 0.75 -> "75")
    for ((df, expectMode) <- Seq((few, "probe-pruned"),
        (many, "full-sort"))) {
      val want = df.groupBy(col("g"))
        .agg(percentile(col("v"), array(probes.map(p => lit(p._1)): _*))
          .as("p"))
        .orderBy("g").collect()
        .map(r => (r.getString(0), r.getSeq[Double](1).toIndexedSeq))
      graft.StrategyLog.drain()
      val got = Percentiles.exact(df, Seq("g"), "v", probes, 0L)
        .orderBy("g").collect()
        .map(r => (r.getString(0),
          probes.indices.map(i => r.getDouble(i + 1))))
      val modes = graft.StrategyLog.drain()
        .filter(_.op == "percentiles.chunks").map(_.strategy)
      assert(modes === Seq(expectMode), s"modes=$modes")
      assert(got.length === want.length)
      got.zip(want).foreach { case ((g1, v1), (g2, v2)) =>
        assert(g1 === g2)
        v1.zip(v2).foreach { case (a, b) =>
          assert(java.lang.Double.doubleToRawLongBits(a)
            === java.lang.Double.doubleToRawLongBits(b),
            s"$expectMode group $g1: $a vs $b differ at bit level")
        }
      }
    }
  }

  test("exactWithStats: caller stats skip the bounds job; stale bounds never change results") {
    // r12: Profile supplies (bounds, count) from one shared scan. The
    // bounds drive chunk ALIGNMENT only — a wrong-but-finite pair must
    // skew chunk balance, never values (out-of-range rows clamp into
    // the end chunks, which stay order-aligned). Feed bounds that are
    // wrong in both directions and a count that forces the chunked
    // path, and require bit-parity with the aggregate.
    val probes = Seq(0.25 -> "25", 0.5 -> "50", 0.75 -> "75")
    val expected = lineitem.groupBy(col("l_returnflag"))
      .agg(percentile(col("l_extendedprice"),
        array(probes.map(p => lit(p._1)): _*)).as("p"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getSeq[Double](1).toIndexedSeq))
    for (bounds <- Seq(Some((-1e9, 1e9)), // too wide: all rows in mid chunk
        Some((30000.0, 31000.0)), // too narrow: most rows clamp to ends
        None)) { // all-NaN degenerate: single chunk
      val got = Percentiles.exactWithStats(lineitem, Seq("l_returnflag"),
          "l_extendedprice", probes, bounds,
          nonNullCount = Long.MaxValue - 1) // force chunked
        .orderBy("l_returnflag").collect()
        .map(r => (r.getString(0), probes.indices.map(i => r.getDouble(i + 1))))
      assert(got.length === expected.length)
      got.zip(expected).foreach { case ((g1, v1), (g2, v2)) =>
        assert(g1 === g2)
        v1.zip(v2).foreach { case (a, b) =>
          assert(java.lang.Double.doubleToRawLongBits(a)
            === java.lang.Double.doubleToRawLongBits(b),
            s"bounds $bounds group $g1: $a vs $b differ at bit level")
        }
      }
    }
  }

  test("nested map columns don't break the salt; mapless-schema salting still impossible to corrupt") {
    // r13 ADVICE: xxhash64 rejects maps at ANY nesting depth — a
    // column of array<map> or struct{map} reaching the salt threw an
    // AnalysisException whenever a measured-bounds chunked path
    // engaged. The salt now excludes map-bearing columns recursively;
    // a constant-valued group alongside such columns must still run
    // and match the aggregate.
    val rows = (0 until 2000).map { i =>
      ("flat", i.toLong, Seq(Map("k" -> i)), 42.0)
    } ++ (0 until 2000).map { i =>
      ("spread", i.toLong, Seq(Map("k" -> i)), i.toDouble)
    }
    val df = rows.toDF("g", "id", "m", "v").repartition(8)
    val probes = Seq(0.0 -> "0", 0.5 -> "50", 1.0 -> "100")
    val want = df.groupBy(col("g"))
      .agg(percentile(col("v"), array(probes.map(p => lit(p._1)): _*))
        .as("p"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getSeq[Double](1).toIndexedSeq))
    val got = Percentiles.exact(df, Seq("g"), "v", probes, 0L)
      .orderBy("g").collect()
      .map(r => (r.getString(0), probes.indices.map(i => r.getDouble(i + 1))))
    assert(got.length === want.length)
    got.zip(want).foreach { case ((g1, v1), (g2, v2)) =>
      assert(g1 === g2)
      v1.zip(v2).foreach { case (a, b) =>
        assert(java.lang.Double.doubleToRawLongBits(a)
          === java.lang.Double.doubleToRawLongBits(b),
          s"group $g1: $a vs $b differ at bit level")
      }
    }
    // degenerate schema: EVERY column map-bearing except group+value
    // still can't salt (group and value are hashable but identical
    // within a tied group — zero entropy is fine, zero columns is not)
    val allMaps = (0 until 500).map(i => ("t", Map("k" -> i), 7.0))
      .toDF("g", "m", "v")
    val one = Percentiles.exact(allMaps, Seq("g"), "v",
        Seq(0.5 -> "50"), 0L)
      .select("p50").as[Double].head()
    assert(one === 7.0)
  }

  test("extreme-double spans and ±Inf values don't silently collapse or corrupt") {
    // r13 ADVICE: mx−mn overflowed to +Inf when endpoints straddle
    // ±~9e307 (every ratio 0 → all rows chunk 0, silent
    // de-parallelization); ±Inf VALUES made the span Inf/NaN. Scaling
    // now uses halved endpoints (finite whenever both endpoints are)
    // and explicitly single-chunks genuinely unscalable ±Inf-endpoint
    // groups. All must stay bit-identical to the aggregate.
    val rnd = new scala.util.Random(17)
    val straddle = (0 until 2000).map { i =>
      ("s", (rnd.nextDouble() * 2 - 1) * 1.5e308)
    }
    val withInf = (0 until 100).map(i => ("i", i.toDouble)) ++
      Seq(("i", Double.PositiveInfinity), ("i", Double.NegativeInfinity))
    val df = (straddle ++ withInf).toDF("g", "v").repartition(8)
    val probes = Seq(0.0 -> "0", 0.5 -> "50", 1.0 -> "100")
    val want = df.groupBy(col("g"))
      .agg(percentile(col("v"), array(probes.map(p => lit(p._1)): _*))
        .as("p"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getSeq[Double](1).toIndexedSeq))
    val got = Percentiles.exact(df, Seq("g"), "v", probes, 0L)
      .orderBy("g").collect()
      .map(r => (r.getString(0), probes.indices.map(i => r.getDouble(i + 1))))
    assert(got.length === want.length)
    got.zip(want).foreach { case ((g1, v1), (g2, v2)) =>
      assert(g1 === g2)
      v1.zip(v2).foreach { case (a, b) =>
        assert(java.lang.Double.doubleToRawLongBits(a)
          === java.lang.Double.doubleToRawLongBits(b),
          s"group $g1: $a vs $b differ at bit level")
      }
    }
    // and the straddling-span group must actually SPREAD (the bug was
    // silent: correct values, one chunk): re-run the chunk assignment
    // shape via a forced-chunked plan and check >1 distinct chunk by
    // probing the strategy log for the chunked path having engaged.
    graft.StrategyLog.drain()
    Percentiles.exact(straddle.toDF("g", "v"), Seq("g"), "v",
      Seq(0.5 -> "50"), 0L).collect()
    val decs = graft.StrategyLog.drain().filter(_.op == "percentiles.exact")
    assert(decs.map(_.strategy) === Seq("chunked"))
  }

  test("exactWithGroupStats: per-group supplied bounds match the aggregate and skip the bounds job") {
    // r13 (Profile path): the caller's ONE per-group scan feeds every
    // column's bounds. Narrow/wide groups (the r12.2 collapse shape)
    // through the supplied-per-group path must stay bit-identical.
    val rnd = new scala.util.Random(19)
    val rows = (0 until 4000).map { i =>
      if (i % 2 == 0) ("narrow", rnd.nextDouble() * 1e-3)
      else ("wide", rnd.nextDouble() * 1e9)
    }
    val df = rows.toDF("g", "v").repartition(8)
    val vd = col("v").cast("double")
    val gb = df.where(col("v").isNotNull).groupBy(col("g"))
      .agg(min(when(!isnan(vd), vd)).as("__bmn"),
        max(when(!isnan(vd), vd)).as("__bmx"),
        count(lit(1)).as("__bc"))
    val probes = Seq(0.1 -> "10", 0.5 -> "50", 0.9 -> "90")
    val want = df.groupBy(col("g"))
      .agg(percentile(col("v"), array(probes.map(p => lit(p._1)): _*))
        .as("p"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getSeq[Double](1).toIndexedSeq))
    graft.StrategyLog.drain()
    val got = Percentiles.exactWithGroupStats(df, Seq("g"), "v", probes,
        gb, total = Long.MaxValue - 1, nGroups = 2) // force chunked
      .orderBy("g").collect()
      .map(r => (r.getString(0), probes.indices.map(i => r.getDouble(i + 1))))
    val decs = graft.StrategyLog.drain()
      .filter(_.op == "percentiles.exact")
    assert(decs.exists(_.detail.contains("supplied-per-group")),
      s"got: ${decs.map(_.detail)}")
    assert(got.length === want.length)
    got.zip(want).foreach { case ((g1, v1), (g2, v2)) =>
      assert(g1 === g2)
      v1.zip(v2).foreach { case (a, b) =>
        assert(java.lang.Double.doubleToRawLongBits(a)
          === java.lang.Double.doubleToRawLongBits(b),
          s"group $g1: $a vs $b differ at bit level")
      }
    }
  }

  test("subnormal-magnitude spans never salt distinct values (all-tied test is exact mn===mx)") {
    // r13 review: the halved endpoints (overflow fix) can round to
    // EQUAL doubles for distinct subnormal-range bounds (mx/2 − mn/2
    // == 0 with mn != mx below ~4.5e-308). Salting those
    // non-interchangeable rows across chunks would corrupt ranks, so
    // the all-tied decision compares the exact bounds and a collapsed
    // half-span routes to one explicit chunk. Values must stay
    // bit-identical to the aggregate.
    val mp = java.lang.Double.MIN_VALUE // 4.9e-324
    val rows = (0 until 600).map { i =>
      ("sub", if (i % 3 == 0) 4 * mp else 5 * mp)
    } ++ (0 until 600).map(i => ("wide", i.toDouble))
    val df = rows.toDF("g", "v").repartition(8)
    val probes = Seq(0.0 -> "0", 0.5 -> "50", 1.0 -> "100")
    val want = df.groupBy(col("g"))
      .agg(percentile(col("v"), array(probes.map(p => lit(p._1)): _*))
        .as("p"))
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getSeq[Double](1).toIndexedSeq))
    val got = Percentiles.exact(df, Seq("g"), "v", probes, 0L)
      .orderBy("g").collect()
      .map(r => (r.getString(0), probes.indices.map(i => r.getDouble(i + 1))))
    assert(got.length === want.length)
    got.zip(want).foreach { case ((g1, v1), (g2, v2)) =>
      assert(g1 === g2)
      v1.zip(v2).foreach { case (a, b) =>
        assert(java.lang.Double.doubleToRawLongBits(a)
          === java.lang.Double.doubleToRawLongBits(b),
          s"group $g1: $a vs $b differ at bit level")
      }
    }
  }

  test("interpolation between two values uses Spark's weighted form") {
    val df = Seq(("a", 10.0), ("a", 20.0)).toDF("g", "v")
    val got = Percentiles.exact(df, Seq("g"), "v", Seq(0.25 -> "25"))
      .select("p25").as[Double].head()
    // position 0.25: (1 - 0.25)*10 + (0.25 - 0)*20
    assert(got === (0.75 * 10.0 + 0.25 * 20.0))
  }
}
