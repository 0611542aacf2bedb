package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway: bucket-occupancy histogram of q102's corpus under
  * [[graft.operators.Similarity.lshBucket]] at a given SF — answers
  * whether the sf10 candidate join exploded because sign-pattern
  * buckets are skewed (synthetic image embeddings concentrate in few
  * orthants) rather than uniform (the autoPlanes assumption).
  */
object Q102Skew {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "target/sf1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
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
    val ids = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey").cast("long")).as[Long]
    val n = ids.count()
    val dim = Multimodal.MediaCodec.imageEmbeddingDim
    val planes = Similarity.autoPlanes(n)
    println(s"[q102skew] n=$n planes=$planes dim=$dim")
    val corpus = Multimodal.extractFeatures(
      ids.map(id => Multimodal.MediaRecord(id, "image",
        Multimodal.MediaCodec.bmpEncode(24, 16, (x, y) => pix(id, x, y)),
        "image/bmp", "synth")), dim)
    val occ = corpus
      .select(Similarity.lshBucket(col("embedding"), planes, dim)
        .as("bucket"))
      .groupBy("bucket").count()
      .agg(count(lit(1)).as("n_buckets"), max("count").as("max_occ"),
        expr("approx_percentile(count, array(0.5, 0.9, 0.99))").as("pct"),
        sum(col("count") * col("count")).as("sum_sq"))
      .head()
    println(s"[q102skew] buckets=${occ.getLong(0)} max=${occ.getLong(1)} " +
      s"p50/p90/p99=${occ.getSeq[Any](2)} candidatePairsPerQueryScan=" +
      s"${occ.getLong(3) / n}")
    spark.stop()
  }
}
