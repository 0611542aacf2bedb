package graft.operators

/** Deterministic synthetic-media generators shared by the multimodal
  * near-dup queries (q102/q192/q193) and their distinctness specs.
  *
  * Identity contract — the property the closed-form oracles ride: each
  * generator is INJECTIVE in `id` over `0 <= id < bound`, with the
  * bound the product of pairwise-coprime moduli (CRT). The r10
  * generators derived everything from TWO residues, so clips repeated
  * with period 5963 (audio: 89·67) / 60491 (pixels: 251·241) — below
  * sf1's 10k suppliers and sf10's 100k suppliers / 1.5M customers.
  * Past the period, a query's re-encoded twin ties at cosine 1.0 with
  * a bit-identical LOWER-id duplicate, the (score desc, id asc)
  * tie-break returns the duplicate, and the output diverges from the
  * SQL oracle (r10 ADVICE, both medium findings). Four (audio: five)
  * residues push the bound past 6.7e8 / 3.3e9 — orders of magnitude
  * above any benched SF's key range ([[graft.SynthMediaSpec]] pins
  * payload AND embedding distinctness over the actual benched ranges).
  */
object SynthMedia {

  /** Generator version, folded into the synth queries' quantizer-store
    * fingerprints (q102/q192/q193): their ids-only fingerprint treats
    * id-identity as payload-identity, which holds within one generator
    * version but NOT across versions — r11 changed payloads under
    * unchanged ids, and an ids-only key would silently serve centroids
    * trained on the previous generation's embeddings (harmless for
    * correctness — the argmax-cell argument is centroid-independent —
    * but a stale build artifact all the same). Bump on any generator
    * change.
    */
  val generatorVersion: Long = 2L

  /** Injectivity bound of [[imagePixel]]/[[videoPixel]]:
    * 251·241·239·233 = 3,368,562,317 (pairwise-coprime primes).
    */
  val pixelIdBound: Long = 251L * 241L * 239L * 233L

  /** Injectivity bound of [[audioSamples]]:
    * 29·61·89·67·64 = 675,107,008 (pairwise coprime; 64 = 2^6 is
    * coprime to the four odd primes).
    */
  val audioIdBound: Long = 29L * 61L * 89L * 67L * 64L

  /** Still-image pixel closed form, injective in `id` below
    * [[pixelIdBound]]: the four residues are recoverable from the
    * pixels — at (x,y)=(0,0) the spatial terms vanish, so r=p1, g=p2;
    * at (1,0) r=(3+p3)%256, g=(1+p4)%256. Every residue is < 256, so
    * mod-256 recovery is exact, and CRT determines
    * id mod 3,368,562,317. Distinct ids below the bound therefore
    * yield distinct pixel planes at every benched SF (sf10 customers
    * top out at 1.5M).
    */
  def imagePixel(id: Long, x: Int, y: Int): Int = {
    val p1 = (id % 251).toInt
    val p2 = (id % 241).toInt
    val p3 = (id % 239).toInt
    val p4 = (id % 233).toInt
    val r = (x * 3 + y * 2 + (if ((x & 1) == 0) p1 else p3)) % 256
    val g = (y * 5 + x + (if ((x & 1) == 0) p2 else p4)) % 256
    val b = (x + y + p1 + p2 + p3 + p4) % 256
    (r << 16) | (g << 8) | b
  }

  /** Video frame pixel closed form — [[imagePixel]] plus frame-index
    * terms. Frame 0 has f-terms = 0, so the same (0,0)/(1,0) recovery
    * applies and the clip is injective in `id` below [[pixelIdBound]].
    */
  def videoPixel(id: Long, f: Int, x: Int, y: Int): Int = {
    val p1 = (id % 251).toInt
    val p2 = (id % 241).toInt
    val p3 = (id % 239).toInt
    val p4 = (id % 233).toInt
    val r = (x * 3 + y * 2 + f * 19 + (if ((x & 1) == 0) p1 else p3)) % 256
    val g = (y * 5 + x + f * 7 + (if ((x & 1) == 0) p2 else p4)) % 256
    val b = (x + y + f + p1 + p2 + p3 + p4) % 256
    (r << 16) | (g << 8) | b
  }

  /** Three-tone 16-bit PCM clip (1024 samples), injective in `id`
    * below [[audioIdBound]]:
    *
    *  - tones sit on EXACT DFT bins of the 256-sample analysis frame
    *    (256 divides 1024 — no spectral leakage): bin1 = 5+(id%29) in
    *    [5,33], bin2 = 40+(id%61) in [40,100], bin3 fixed at 120 —
    *    disjoint ranges, so each tone is attributable;
    *  - amplitudes a1 = 4000+14·(id%89), a2 = 3000+14·(id%67),
    *    a3 = 2000+14·(id%64) — step 14 per residue unit.
    *
    * Recovery argument (hence injectivity): the exact 1024-point DFT
    * of the UNtruncated sum reads each tone's (bin, amplitude) with
    * per-bin magnitude a·512; int16 truncation perturbs any DFT bin by
    * at most 1024 (|error| <= 1 per sample), far below both the
    * 14·512 = 7168 spacing between adjacent amplitude values and the
    * 2000·512 minimum tone magnitude — so the residues, and by CRT
    * id mod 675,107,008, remain exactly recoverable from the clip
    * bytes. Peak amplitude 5232+3924+2882 = 12038 < 32767: no
    * clipping.
    */
  def audioSamples(id: Long): Array[Short] = {
    val bin1 = (5 + id % 29).toInt
    val bin2 = (40 + id % 61).toInt
    val bin3 = 120
    val a1 = (4000 + 14 * (id % 89)).toDouble
    val a2 = (3000 + 14 * (id % 67)).toDouble
    val a3 = (2000 + 14 * (id % 64)).toDouble
    Array.tabulate(1024)(i =>
      (a1 * math.sin(2 * math.Pi * bin1 * i / 256.0) +
        a2 * math.sin(2 * math.Pi * bin2 * i / 256.0) +
        a3 * math.sin(2 * math.Pi * bin3 * i / 256.0)).toShort)
  }
}
