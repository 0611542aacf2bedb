package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.BpeTrainer

/** Production-vocabulary BPE training measurement (VERDICT r9 item 10):
  * trains a `merges`-deep merge table on the documents corpus with
  * [[BpeTrainer.trainMergesBatched]] and prints the cumulative cost
  * curve (wall seconds at every `step` merges, batch-size histogram),
  * plus the sequential [[BpeTrainer.trainMerges]] per-merge cost over
  * its first rounds for the driver-loop comparison the verdict asked
  * to put on record.
  *
  * Usage: `sbt "runMain graft.tools.BpeScale [sfDir merges table column]"`
  * (defaults documents/text; the synthetic documents vocabulary
  * saturates in the few-hundreds of merges — TPC-H comment columns
  * carry a richer word list for deeper-vocabulary measurement).
  */
object BpeScale {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val merges = if (args.length > 1) args(1).toInt else 1000
    val table = if (args.length > 2) args(2) else "documents"
    val column = if (args.length > 3) args(3) else "text"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-bpe-scale")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet(s"$sfDir/$table.parquet")
    // augment mode: splice per-row hex words into the text so the merge
    // supply outlives the synthetic corpus's ~400-merge vocabulary —
    // a data-shape knob for the deep-vocabulary measurement, clearly
    // not a claim about the shipped corpus
    val docs =
      if (args.length > 4 && args(4) == "augment")
        base.select(concat(col(column), lit(" m"),
          lower(hex(xxhash64(col(column), monotonically_increasing_id()))),
          lit(" q"), lower(hex(crc32(col(column).cast("string")))))
          .as("text"))
      else base.select(col(column).as("text"))

    // sequential baseline: per-merge driver-loop cost over 32 rounds
    val t0 = System.nanoTime()
    val seq = BpeTrainer.trainMerges(docs, "text", merges = 32)
    val nSeq = seq.count()
    val seqS = (System.nanoTime() - t0) / 1e9
    println(f"[bpescale] sequential: $nSeq merges in $seqS%.1f s " +
      f"(${seqS / nSeq}%.3f s/merge -> ${seqS / nSeq * merges}%.0f s " +
      f"extrapolated to $merges)")

    // batched: full vocabulary with the cost curve
    val t1 = System.nanoTime()
    val learned = BpeTrainer.trainMergesBatched(docs, "text",
        merges = merges)
      .collect()
    val batS = (System.nanoTime() - t1) / 1e9
    println(f"[bpescale] batched: ${learned.length} merges in $batS%.1f s " +
      f"(${batS / math.max(1, learned.length)}%.4f s/merge, " +
      f"${seqS / nSeq * learned.length / batS}%.1f x over sequential)")
    // sanity: prefix equality with the sequential table
    val seqRows = seq.collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._1)
    val batRows = learned.map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._1).take(seqRows.length)
    require(seqRows.sameElements(batRows),
      "batched merge table diverged from the sequential prefix")
    println(s"[bpescale] prefix check: first ${seqRows.length} merges " +
      "identical to the sequential trainer")
    spark.stop()
  }
}
