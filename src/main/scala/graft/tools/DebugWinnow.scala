package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.TextDedup

/** Scratch diagnostic for the q77 winnow pipeline cost structure. */
object DebugWinnow {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    def time(name: String)(f: => Any): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val r = f
        println(f"[debug] $name run$i ${(System.nanoTime() - t0) / 1e9}%.3f  ($r)")
      }
    }
    val reparted = docs.repartition(32, col("doc_id"))
    time("tokens-only") {
      reparted.select(size(TextFunctions.tokens(col("text"))).as("n"))
        .agg(sum("n")).collect()(0).getLong(0)
    }
    time("shingles") {
      reparted.select(size(TextFunctions.shinglesFromTokens(
          TextFunctions.tokens(col("text")), 5)).as("n"))
        .agg(sum("n")).collect()(0).getLong(0)
    }
    time("md5-hof") {
      reparted.select(transform(TextFunctions.shinglesFromTokens(
          TextFunctions.tokens(col("text")), 5),
          g => TextDedup.md5Hash60(g)).as("h"))
        .select(size(col("h")).as("n")).agg(sum("n")).collect()(0).getLong(0)
    }
    time("xxhash-hof") {
      reparted.select(transform(TextFunctions.shinglesFromTokens(
          TextFunctions.tokens(col("text")), 5),
          g => xxhash64(g)).as("h"))
        .select(size(col("h")).as("n")).agg(sum("n")).collect()(0).getLong(0)
    }
    // bit_xor, not sum: 250k 60-bit hashes overflow a Long sum under
    // ANSI arithmetic and kill the probe
    time("md5-flat (posexplode, codegen)") {
      reparted.select(posexplode(TextFunctions.shinglesFromTokens(
          TextFunctions.tokens(col("text")), 5)).as(Seq("p", "g")))
        .select(TextDedup.md5Hash60(col("g")).as("h"))
        .agg(expr("bit_xor(h)")).collect()(0).getLong(0)
    }
    time("full-fps") {
      TextDedup.winnowFingerprints(docs, "doc_id", "text", 5, 8)
        .agg(expr("bit_xor(fp)")).collect()(0).getLong(0)
    }
    time("full-q77") {
      graft.Queries.q77Winnow(spark, sfDir).write
        .format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
