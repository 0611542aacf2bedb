package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Exact dedup by normalized content hash: deterministic keep-first by
    * tiebreak (pandas-style), one shuffle on the 128-bit fingerprint.
    */
  def exact(df: DataFrame, textCol: String, tiebreak: Seq[Column]): DataFrame =
    Dedup.keepFirst(
      df.withColumn("__fp", TextFunctions.fingerprint(col(textCol))),
      Seq("__fp"), tiebreak).drop("__fp")

  /** Seeded 64-bit token/shingle hash: xxhash64 with the seed mixed in as
    * a literal column — k independent-enough hash families without UDFs.
    */
  private def seededHash(c: Column, seed: Int): Column =
    xxhash64(lit(seed), c)

  /** MinHash signature as an array<long> of length `numHashes`.
    *
    * Single-pass formulation: the shingle array is the AGGREGATE's input,
    * so it is built exactly once per row; each shingle contributes its
    * `numHashes` seeded hashes to a running element-wise minimum. (The
    * naive `transform(seeds, j -> array_min(transform(shingles, ...)))`
    * re-evaluates the shingle construction once per seed after Catalyst
    * inlines it — 32× the string work.)
    */
  def minHashSignature(text: Column, numHashes: Int, shingleSize: Int): Column =
    aggregate(
      TextFunctions.shingles(text, shingleSize),
      array_repeat(lit(Long.MaxValue), numHashes),
      (acc, s) => zip_with(acc,
        transform(sequence(lit(0), lit(numHashes - 1)), j => xxhash64(j, s)),
        (a, h) => least(a, h)))

  /** MinHash + LSH near-duplicate pairs.
    *
    * Plan: per doc compute the `numHashes`-long signature, split into
    * `bands` bands, hash each band to one value, explode → one row per
    * (band, bandSig, id); self-join on equal (band, bandSig) with id<id2
    * (dedup candidates); verify with exact shingle-set Jaccard; keep
    * pairs ≥ `threshold`.
    *
    * Returns (id_a, id_b, jaccard) with id_a < id_b, one row per pair.
    */
  def minHashLsh(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 32,
      bands: Int = 8,
      shingleSize: Int = 3,
      threshold: Double = 0.7): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val sigs = df.select(col(idCol).as("__id"),
      minHashSignature(col(textCol), numHashes, shingleSize).as("__sig"))
    // Band array as `bands` STATIC references to __sig: CollapseProject
    // refuses to inline a non-cheap alias referenced more than once, so
    // the signature materializes once per row instead of once per band.
    val bandArray = array((0 until bands).map(b =>
      xxhash64(slice(col("__sig"), lit(b * rowsPerBand + 1), lit(rowsPerBand))
        .cast("string"), lit(b))): _*)
    val banded = sigs
      .select(col("__id"), posexplode(bandArray).as(Seq("__band", "__bandsig")))
    val left = banded.select(col("__band"), col("__bandsig"),
      col("__id").as("id_a"))
    val right = banded.select(col("__band"), col("__bandsig"),
      col("__id").as("id_b"))
    // candidate pairs carry only ids through the shuffle; texts re-join
    // after the distinct, so document payloads never ride the band join
    val candidates = left.join(right, Seq("__band", "__bandsig"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct() // same pair can collide in several bands
    val texts = df.select(col(idCol), col(textCol))
    candidates
      .join(texts.select(col(idCol).as("id_a"), col(textCol).as("__ta")),
        Seq("id_a"))
      .join(texts.select(col(idCol).as("id_b"), col(textCol).as("__tb")),
        Seq("id_b"))
      .withColumn("jaccard",
        jaccardShingles(col("__ta"), col("__tb"), shingleSize))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
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

  /** SimHash of the token set: per bit, sum +1/-1 votes over tokens by
    * that bit of the token hash; bit set iff the vote is positive. The
    * per-bit shift amounts must be literals (Catalyst lambdas cannot
    * variable-shift), so the bits unroll at expression-build time — one
    * pass per bit over the token hash array, all inside codegen, no
    * shuffle.
    */
  def simHash(text: Column): Column = {
    val hashes = transform(TextFunctions.tokens(text), t => xxhash64(t))
    (0 until simHashBits).map { b =>
      val votes = aggregate(hashes, lit(0L),
        (a, h) => a + when(shiftright(h, b).bitwiseAND(1) === 1, 1L)
          .otherwise(-1L))
      when(votes > 0, lit(1L << b)).otherwise(0L)
    }.reduce(_ + _)
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hammingDist(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: bucket by the four 16-bit chunks (a pair
    * within Hamming distance 3 of a 64-bit hash shares at least one exact
    * chunk — pigeonhole), join within buckets, verify Hamming ≤ maxDist.
    * Same no-O(n²) shape as MinHash LSH.
    */
  def simHashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxDist: Int = 3): DataFrame = {
    val withSig = df.select(col(idCol).as("__id"),
      simHash(col(textCol)).as("__sim"))
    val chunked = withSig.select(col("__id"), col("__sim"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("__sim"), c * 16).bitwiseAND(0xFFFFL)): _*))
        .as(Seq("__chunk", "__chunkval")))
    val left = chunked.select(col("__chunk"), col("__chunkval"),
      col("__id").as("id_a"), col("__sim").as("sim_a"))
    val right = chunked.select(col("__chunk"), col("__chunkval"),
      col("__id").as("id_b"), col("__sim").as("sim_b"))
    left.join(right, Seq("__chunk", "__chunkval"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hammingDist(col("sim_a"), col("sim_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }
}
