package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway cost decomposition for q102 at a given SF: synthesis +
  * feature extraction vs the LSH top-k stage. */
object Q102Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "target/sf1"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.operators.{Multimodal, Similarity}
    val pix: (Long, Int, Int) => Int = (id, x, y) => {
      val p = (id % 251).toInt; val q = (id % 241).toInt
      val r = (x * 3 + y * 2 + p) % 256
      val g = (y * 5 + x + q) % 256
      val b = (x + y + p + q) % 256
      (r << 16) | (g << 8) | b
    }
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[q102probe] $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val ids = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey").cast("long")).as[Long]
    val n = ids.count()
    val dim = Multimodal.MediaCodec.imageEmbeddingDim
    val corpus = Multimodal.extractFeatures(
      ids.map(id => Multimodal.MediaRecord(id, "image",
        Multimodal.MediaCodec.bmpEncode(24, 16, (x, y) => pix(id, x, y)),
        "image/bmp", "synth")), dim)
    val queries = Multimodal.extractFeatures(
      ids.filter(_ % 100 == 0).map(id =>
        Multimodal.MediaRecord(id + 1000000L, "image",
          Multimodal.MediaCodec.pngEncode(24, 16, (x, y) => pix(id, x, y)),
          "image/png", "synth")), dim)
    val planes = Similarity.autoPlanes(n)
    println(s"[q102probe] n=$n planes=$planes")
    time("corpus features")(
      corpus.write.format("noop").mode("overwrite").save())
    time("query features")(
      queries.write.format("noop").mode("overwrite").save())
    time("full lshTopK")(
      Similarity.lshTopK(corpus, queries, "media_id", "embedding", k = 1,
        dim = dim, planes = planes)
        .write.format("noop").mode("overwrite").save())
    // second run: JIT/codegen warm
    time("full lshTopK warm")(
      Similarity.lshTopK(corpus, queries, "media_id", "embedding", k = 1,
        dim = dim, planes = planes)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
