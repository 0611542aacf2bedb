package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off plan probe for [[SkewBench]]'s adjudication: did AQE's
  * OptimizeSkewedJoin actually split the hot partition at the tuned
  * thresholds? Prints the final adaptive plan's join line (skew splits
  * show as `SortMergeJoin(skew=true)` / `isSkew=true` partition specs).
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "target/sf1"
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        sys.env.getOrElse("SKEW_THRESH", "8m"))
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
      .config("spark.sql.adaptive.forceOptimizeSkewedJoin",
        sys.env.getOrElse("SKEW_FORCE", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.adaptive",
      org.apache.logging.log4j.Level.DEBUG)
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
      .repartition(16) // 16 mappers: see SkewBench — one mapper makes
                       // the hot partition unsplittable by AQE
      .localCheckpoint() // same materialized input shape as SkewBench
      .withColumn("k",
        when(pmod(col("l_orderkey"), lit(10)) < 9, lit(0L))
          .otherwise(col("l_orderkey")))
    val dim = li.select(col("k")).distinct()
      .withColumn("payload", col("k") * 31 + 7)
      // checkpoint = the SkewBench shape; WITHOUT it the distinct's
      // final HashAggregate sits between the dim shuffle stage and the
      // join's Sort, OptimizeSkewedJoin's SMJ(Sort(Stage),Sort(Stage))
      // pattern never matches, and the rule skips the join entirely
      // (measured here: 55 MB hot vs 520 KB median, no split)
      .localCheckpoint()
    val joined = li.join(dim.hint("shuffle_merge"), Seq("k"))
      .groupBy(col("k") % 97)
      .agg(count(lit(1)).as("n"), sum(col("payload")).as("s"),
        sum(col("l_quantity")).as("q"), max(col("l_partkey")).as("p"))
    // execute THIS QueryExecution (a write command would plan its own
    // copy and leave this one's adaptive plan unexecuted/non-final)
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    val finalPlan = joined.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }
    // QueryStageExec is a leaf node (children = Nil): recurse into
    // .plan explicitly or collect never reaches the shuffle stages
    def dumpStats(node: org.apache.spark.sql.execution.SparkPlan): Unit = {
      node match {
        case s: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec =>
          s.mapStats.foreach { ms =>
            val b = ms.bytesByPartitionId
            val sorted = b.sorted
            println(s"[skewprobe] shuffle ${ms.shuffleId}: parts=${b.length} " +
              s"max=${b.max} median=${sorted(b.length / 2)} " +
              s"top3=${sorted.reverse.take(3).mkString(",")}")
          }
          dumpStats(s.plan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          dumpStats(q.plan)
        case other => other.children.foreach(dumpStats)
      }
    }
    dumpStats(finalPlan)
    plan.linesIterator
      .filter(l => l.contains("SortMergeJoin") || l.contains("skew") ||
        l.contains("AQEShuffleRead"))
      .foreach(l => println("[skewprobe] " + l.trim.take(160)))
    spark.stop()
  }
}
