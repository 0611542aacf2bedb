package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout clustering via Z-order (Morton)
  * interleaving — the storage-locality primitive behind clustered
  * table layouts (Delta/Iceberg `OPTIMIZE ZORDER BY`): rows sorted by
  * the interleaved key keep BOTH dimensions locally dense inside every
  * file, so min/max file statistics prune scans on either predicate
  * column. At 100 TB this is the difference between "filter on a
  * second column reads the whole table" and "reads a few percent".
  *
  * Reference scope note: the reference's sink relies on single-column
  * b-tree indexes (py:76-134); Z-ordering is the lake-native analog
  * for the second and third predicate column.
  *
  * Everything here is exact integer bit algebra (shift/and/or), so an
  * independent engine reproduces every z-value bit-for-bit —
  * [[zValueSql]] emits the same unrolled expression as portable SQL.
  */
object Layout {

  /** Morton z-value: interleave the low `bits` bits of two
    * non-negative integer columns (`a` even positions, `b` odd).
    * Codegen-friendly: unrolls to 2·bits shift/mask terms OR-folded
    * into one whole-stage-codegen expression — no UDF, no loop at
    * runtime.
    */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits $bits outside 1..31")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_ bitwiseOR _)
  }

  /** The identical expression as ANSI/DuckDB SQL text (for oracles and
    * SQL-surface callers): both engines evaluate the same shift/mask
    * terms on the same operands.
    */
  def zValueSql(a: String, b: String, bits: Int): String = {
    require(bits >= 1 && bits <= 31, s"bits $bits outside 1..31")
    (0 until bits).flatMap { i =>
      Seq(
        s"(((CAST($a AS BIGINT) >> $i) & 1) << ${2 * i})",
        s"(((CAST($b AS BIGINT) >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" | ")
  }

  /** Layout-effectiveness report: the z-space is cut into `2^logBuckets`
    * equal z-RANGES (the top `logBuckets` bits of the z-value — each
    * range is a "file" in a z-clustered layout); per bucket, the count
    * and each dimension's min/max span. Tight per-bucket spans on BOTH
    * dimensions are what make file-skipping effective; a row with a
    * wide span marks a region where clustering buys nothing.
    *
    * Bucketing by high bits (not ntile) is deliberate: a global ntile
    * is a single-partition window — the round-1 q48 anti-pattern —
    * while `z >> shift` is embarrassingly parallel (narrow map + one
    * hash aggregate on the bucket id, no sort, no driver state).
    * Equal-z-range buckets also expose data-space skew honestly: a
    * writer balancing file SIZES would range-partition by sampled z
    * quantiles (`repartitionByRange(col("z"))`), the same plan Spark
    * uses for any global sort.
    */
  def zClusterStats(df: DataFrame, aCol: String, bCol: String,
      bits: Int, logBuckets: Int): DataFrame = {
    require(logBuckets >= 1 && logBuckets <= 2 * bits,
      s"logBuckets $logBuckets outside 1..${2 * bits}")
    val z = zValue(col(aCol), col(bCol), bits)
    df.select(col(aCol), col(bCol), z.as("__z"))
      .withColumn("bucket", shiftright(col("__z"), 2 * bits - logBuckets))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n"),
        min(col("__z")).as("z_min"),
        max(col("__z")).as("z_max"),
        min(col(aCol)).as("a_min"),
        max(col(aCol)).as("a_max"),
        min(col(bCol)).as("b_min"),
        max(col(bCol)).as("b_max"))
      .orderBy(col("bucket"))
  }

  /** Column encoding profile: the storage-layout advisor's statistics
    * for ONE integral column under a given total row order — exact run
    * count, distinct count, and the fraction of adjacent deltas that
    * fit int8 — from which RLE / delta / dictionary encodability
    * follows (the decision a lakehouse writer makes per column per
    * file; companion to [[zClusterStats]]'s clustering report).
    *
    * Scale shape: NO global sort. Rows range-partition by the order
    * key; each chunk computes its run breaks and small-delta count
    * under a LOCAL window, plus its (first, last) boundary values via
    * rank-conditional aggregates (long buffers — hash-aggregable); the
    * nChunks-row boundary table then merges cross-chunk runs and
    * boundary deltas. Exactly the q70/q117 chunk decomposition.
    *
    * Returns one row: `(n_rows, n_runs, n_distinct, n_small_delta,
    * encoding)` where `encoding` is the rule-based recommendation
    * (rle when runs <= n/10; delta when >= 90% of deltas fit int8;
    * dict when distinct <= n/20; else plain — first match wins).
    */
  def encodingProfile(df: DataFrame, orderCols: Seq[String],
      valueCol: String): DataFrame = {
    val nChunks = df.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    val ord = orderCols.map(col)
    // spark_partition_id over a sampled range exchange is safe HERE and
    // only here: the chunked frame has exactly ONE consumer chain
    // (local → perChunk → bounded → totals), so a single evaluation
    // produces every derived row and no join can see a second,
    // differently-sampled set of pids. Operators whose chunked frame
    // feeds TWO consumers (q70, q106's shuffleShard, frontier2D) must
    // use value-derived chunk ids instead — exchange reuse is an
    // optimization, not a guarantee (r10; q106 dropped rows at sf0.1).
    val chunked = df.select((orderCols :+ valueCol).distinct.map(col): _*)
      .repartitionByRange(nChunks, ord: _*)
      .withColumn("__pid", spark_partition_id())
    val w = Window.partitionBy(col("__pid")).orderBy(ord: _*)
    val v = col(valueCol).cast("long")
    val local = chunked
      .withColumn("__lag", lag(v, 1).over(w))
      .withColumn("__lead", lead(v, 1).over(w))
      .withColumn("__rk", row_number().over(w))
    val perChunk = local.groupBy(col("__pid")).agg(
      count(lit(1)).as("__n"),
      sum(when(col("__lag").isNotNull && col("__lag") =!= v, 1L)
        .otherwise(0L)).as("__breaks"),
      sum(when(col("__lag").isNotNull &&
        abs(v - col("__lag")) <= 127, 1L).otherwise(0L))
        .as("__small"),
      // boundary values via rank-conditional aggregates over LONG
      // buffers (a struct-max would plan the banned SortAggregate):
      // first = the rank-1 value, last = the value whose lead is null
      max(when(col("__rk") === 1, v)).as("__first"),
      max(when(col("__lead").isNull, v)).as("__last"))
    // nChunks rows: merge runs and deltas across chunk boundaries
    // constant partition key: same one-task execution over the
    // nChunks-row grid, minus the per-execution WindowExec warning
    val wb = Window.partitionBy(lit(0)).orderBy(col("__pid"))
    val bounded = perChunk
      .withColumn("__prevLast", lag(col("__last"), 1).over(wb))
      .select(col("__n"), col("__breaks"), col("__small"),
        when(col("__prevLast").isNotNull &&
          col("__prevLast") === col("__first"), 1L).otherwise(0L)
          .as("__merge"),
        when(col("__prevLast").isNotNull &&
          abs(col("__first") - col("__prevLast")) <= 127, 1L)
          .otherwise(0L).as("__bsmall"))
    val nd = df.agg(countDistinct(col(valueCol)).as("n_distinct"))
    val totals = bounded.agg(
      sum(col("__n")).as("n_rows"),
      (sum(col("__breaks")) + count(lit(1)) - sum(col("__merge")))
        .as("n_runs"),
      (sum(col("__small")) + sum(col("__bsmall"))).as("n_small_delta"))
    totals.crossJoin(broadcast(nd))
      .select(col("n_rows"), col("n_runs"), col("n_distinct"),
        col("n_small_delta"),
        when(col("n_runs") * 10 <= col("n_rows"), lit("rle"))
          .when(col("n_small_delta") * 10 >= (col("n_rows") - 1) * 9,
            lit("delta"))
          .when(col("n_distinct") * 20 <= col("n_rows"), lit("dict"))
          .otherwise(lit("plain")).as("encoding"))
  }

  /** Deterministic pseudo-random shuffle + shard assignment — the
    * training-export step that turns a curated corpus into N shard
    * files in a reproducible random order (every framework's loader
    * assumes pre-shuffled shards; re-running the export must byte-match
    * yesterday's). Two independent salted portable hashes: one picks
    * the shard, one orders rows WITHIN the shard, so the permutation is
    * a pure function of (id, salt) — independent of partitioning, input
    * order, or cluster size.
    *
    * The within-shard sequence number deliberately avoids
    * `row_number() OVER (PARTITION BY shard)` — nShards partitions each
    * funnel 1/nShards of the corpus through a single-task sort (the q70
    * scale trap). Instead the chunked-rank shape: chunk, local
    * row_number per chunk, then add broadcast per-chunk offsets —
    * every task sorts only its chunk, and the result is provably
    * identical for ANY chunk boundaries.
    *
    * The chunk id is VALUE-DERIVED — the top bits of the uniform
    * 60-bit ordering hash — never `spark_partition_id()` over a
    * sampled `repartitionByRange` (r10 fix: the ranked rows and the
    * offset table are two consumers of that exchange, and when AQE
    * plans them as separate exchanges — reuse is an optimization, not
    * a guarantee — each side samples its own range boundaries and
    * coalesces independently, so the (pid, shard) join keys disagree
    * and the inner join silently DROPS rows; q106 lost 28 of 5000 rows
    * at sf0.1 exactly this way). A pure row function cannot disagree
    * with itself: both consumers compute identical chunk ids from the
    * hash alone, chunks are contiguous in (ord, id) order because the
    * bucket is a monotone prefix of ord, and the md5-60 uniformity
    * keeps them balanced at any scale with no sampling pass.
    *
    * Returns the input plus `__shard` (0..nShards-1) and `__seq`
    * (1-based position within the shard's shuffled order).
    */
  def shuffleShard(df: DataFrame, idCol: String, nShards: Int,
      salt: String = "v1"): DataFrame = {
    require(nShards >= 1, s"need at least one shard, got $nShards")
    val id = col(idCol)
    val nChunks = df.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    // smallest k with 2^k >= nChunks; __ord < 2^60 so the top-k-bit
    // bucket is ord >> (60 - k)
    val chunkBits =
      if (nChunks <= 1) 0
      else 32 - java.lang.Integer.numberOfLeadingZeros(nChunks - 1)
    val shiftBits = 60 - chunkBits
    val hashed = df
      .withColumn("__shard",
        pmod(TextDedup.md5Hash60(
          concat(lit(s"shard-$salt:"), id.cast("string"))), lit(nShards)))
      .withColumn("__ord",
        TextDedup.md5Hash60(concat(lit(s"ord-$salt:"), id.cast("string"))))
      .withColumn("__chunk", shiftright(col("__ord"), shiftBits))
    val wLocal = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__chunk"), col("__shard"))
      .orderBy(col("__ord"), id)
    val ranked = hashed
      .withColumn("__lr", row_number().over(wLocal).cast("long"))
    val counts = ranked.groupBy(col("__chunk"), col("__shard"))
      .agg(max(col("__lr")).as("__c"))
    val wOff = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__shard")).orderBy(col("__chunk"))
    val offs = counts
      .withColumn("__off", sum(col("__c")).over(wOff) - col("__c"))
      .select(col("__chunk"), col("__shard"), col("__off"))
    ranked.join(broadcast(offs), Seq("__chunk", "__shard"))
      .withColumn("__seq", col("__off") + col("__lr"))
      .drop("__chunk", "__lr", "__ord", "__off")
  }
}
