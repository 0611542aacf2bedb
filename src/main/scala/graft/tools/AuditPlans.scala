package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print, for EVERY registry query, which interpreted-eval
  * constructs its optimized plan contains (higher-order lambdas, object
  * or sort aggregates) — the input for PlanAuditSpec's engine-wide
  * whitelist. Run: `sbt "runMain graft.tools.AuditPlans [sfDir]"`.
  */
object AuditPlans {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for ((name, (fn, _)) <- graft.Queries.registry) {
      val flags = try {
        val p = fn(spark, dir).queryExecution.executedPlan.toString
        Seq(
          if (p.contains("lambdafunction(")) Some("LAMBDA") else None,
          if (p.contains("ObjectHashAggregate")) Some("OBJAGG") else None,
          if (p.contains("SortAggregate")) Some("SORTAGG") else None,
          if (p.contains("CartesianProduct")) Some("CARTESIAN") else None,
        ).flatten
      } catch { case e: Throwable => Seq(s"ERR:${e.getClass.getSimpleName}") }
      if (flags.nonEmpty) println(s"[audit] $name: ${flags.mkString(",")}")
    }
    println("[audit] done")
    spark.stop()
  }
}
