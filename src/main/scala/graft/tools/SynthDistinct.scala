package graft.tools

import org.apache.spark.sql.SparkSession

/** One-shot validation that the [[graft.operators.SynthMedia]]
  * generators yield pairwise-DISTINCT embeddings over the FULL benched
  * key ranges — the empirical complement to the CRT payload-injectivity
  * proof (payload distinctness is closed-form; embedding distinctness
  * additionally needs the DCT/DFT feature maps to not collide on these
  * parameter grids, which this sweep certifies for the exact id ranges
  * the queries see). SynthMediaSpec runs a fast slice in-suite; this
  * covers sf10: suppliers 1..100000 (q192 audio, q193 video) and
  * customers 1..1500000 (q102 images).
  *
  * Usage: `sbt "runMain graft.tools.SynthDistinct [maxSupp maxCust]"`.
  * Prints one line per modality: `<modality> n=<N> distinct=<D> OK|FAIL`.
  */
object SynthDistinct {
  /** Serializable kernel holder: the sweep closures reference this
    * module, never the enclosing main's locals.
    */
  object Fns extends Serializable {
    import graft.operators.{AviCodec, Multimodal, SynthMedia}
    import Multimodal.MediaCodec

    def key(e: Array[Float]): String = {
      val bb = java.nio.ByteBuffer.allocate(e.length * 4)
      e.foreach(bb.putFloat)
      java.util.Base64.getEncoder.encodeToString(bb.array)
    }
    def audioKey(id: Long): String =
      key(MediaCodec.audioEmbedding(
        MediaCodec.wavEncode(16000, SynthMedia.audioSamples(id))).get)
    def videoKey(id: Long): String =
      key(MediaCodec.videoEmbedding(
        AviCodec.aviEncode(24, 16, 40000, 6,
          (f, x, y) => SynthMedia.videoPixel(id, f, x, y))).get)
    def imageKey(id: Long): String =
      key(MediaCodec.imageEmbedding(
        MediaCodec.bmpEncode(24, 16,
          (x, y) => SynthMedia.imagePixel(id, x, y))).get)
  }

  def main(args: Array[String]): Unit = {
    val maxSupp = if (args.length > 0) args(0).toLong else 100000L
    val maxCust = if (args.length > 1) args(1).toLong else 1500000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .appName("graft-synthdistinct")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def sweep(name: String, n: Long)(emb: Long => String): Unit = {
      val t0 = System.nanoTime()
      val d = spark.range(1L, n + 1).repartition(64).as[Long]
        .map(emb).distinct().count()
      val ok = if (d == n) "OK" else "FAIL"
      println(f"$name n=$n distinct=$d $ok (${(System.nanoTime() - t0) / 1e9}%.1f s)")
    }
    sweep("audio", maxSupp)(Fns.audioKey _)
    sweep("video", maxSupp)(Fns.videoKey _)
    sweep("image", maxCust)(Fns.imageKey _)
    spark.stop()
  }
}
