package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relational Bloom filter — the runtime-filter primitive for 100 TB
  * semi-joins: build a bit array from the (small) key set once, then
  * pre-filter the big probe side with a broadcast of the bits instead
  * of shuffling every probe row to a join. False positives pass through
  * (and are caught by whatever exact join follows); false negatives
  * are impossible — the invariant the oracle checks.
  *
  * Representation: `m` bits as `m/32` BIGINT words, one row per word
  * that has at least one bit set (`word_idx`, `word`). 32-bit words,
  * not 64 — every mask stays ≤ 2^31, so the word arithmetic is
  * portable to engines whose integer shifts reject 63-bit results.
  *
  * Hashing: `k` independent positions per key via the portable md5-60
  * uniform ([[TextDedup.md5Hash60]] over `"<i>:<key>"`), so an
  * external engine reproduces the EXACT filter — bits, false-positive
  * set and all (q67's oracle does). Production note: md5 is the
  * portability variant; swap [[posXx]] in for xxhash64 positions at a
  * fraction of the hash cost when cross-engine reproducibility is not
  * required.
  *
  * Shapes: build = explode(k positions) + one groupBy(word_idx) with
  * map-side `bit_or` partials → at most m/32 rows regardless of key
  * count. Probe = k position columns, one broadcast join per probe
  * position set against the ≤ m/32-row word table — Catalyst
  * broadcasts it without a hint at any realistic m, and the probe side
  * never shuffles.
  */
object Bloom {

  /** Bit positions `i = 0 until k` for a key (portable md5-60 variant). */
  private def pos(i: Int, key: Column, mBits: Int): Column =
    pmod(TextDedup.md5Hash60(concat_ws(":", lit(i), key.cast("string"))),
      lit(mBits.toLong))

  /** xxhash64 position variant — same shapes, ~10× cheaper hash, not
    * externally reproducible (xxhash64 is Spark-internal).
    */
  def posXx(i: Int, key: Column, mBits: Int): Column =
    pmod(xxhash64(lit(i), key), lit(mBits.toLong))

  private def checkParams(mBits: Int, k: Int): Unit = {
    require(mBits > 0 && mBits % 32 == 0, s"mBits must be a positive multiple of 32, got $mBits")
    require(k >= 1 && k <= 16, s"k hash functions must be in [1, 16], got $k")
  }

  /** Build the word table from `keys` (duplicates are harmless —
    * `bit_or` is idempotent). Output: (`word_idx` LONG, `word` LONG
    * with only the low 32 bits used).
    */
  def build(keys: DataFrame, keyCol: String, mBits: Int, k: Int): DataFrame = {
    checkParams(mBits, k)
    val positions = array((0 until k).map(i => pos(i, col(keyCol), mBits)): _*)
    keys
      .select(explode(positions).as("__pos"))
      .select(expr("__pos div 32").as("word_idx"),
        expr("shiftleft(1L, cast(pmod(__pos, 32) as int))").as("__mask"))
      .groupBy(col("word_idx"))
      .agg(bit_or(col("__mask")).as("word"))
  }

  /** Tag each probe row with `maybe_member`: true iff ALL `k` of its
    * bits are set. Rows whose word has no set bits at all simply miss
    * the join (left join + null word ⇒ bit unset ⇒ false), so the word
    * table stays sparse.
    */
  def probe(df: DataFrame, keyCol: String, bloom: DataFrame,
      mBits: Int, k: Int): DataFrame = {
    checkParams(mBits, k)
    val withHits = (0 until k).foldLeft(df) { (d, i) =>
      val p = pos(i, col(keyCol), mBits)
      val words = broadcast(bloom
        .withColumnRenamed("word_idx", s"__wi_$i")
        .withColumnRenamed("word", s"__w_$i"))
      d.withColumn(s"__pos_$i", p)
        .join(words, expr(s"__pos_$i div 32") === col(s"__wi_$i"), "left")
        .withColumn(s"__hit_$i",
          coalesce(expr(s"(__w_$i & shiftleft(1L, cast(pmod(__pos_$i, 32) as int))) != 0"),
            lit(false)))
    }
    val maybe = (0 until k).map(i => col(s"__hit_$i")).reduce(_ && _)
    withHits
      .withColumn("maybe_member", maybe)
      .drop((0 until k).flatMap(i => Seq(s"__pos_$i", s"__wi_$i", s"__w_$i", s"__hit_$i")): _*)
  }
}
