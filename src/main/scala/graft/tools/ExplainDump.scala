package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Optimization-round evidence tool: dump `.explain("formatted")` for
  * named queries into a directory as `<query>_<suffix>.txt`, so a plan
  * claim in OPTIMIZATION_r*.md ("2 Exchange → 1", "SMJ → BHJ") is
  * checkable against a committed artifact without running Spark.
  *
  * Run: `sbt "runMain graft.tools.ExplainDump plans/r14 before q100_stream_neardup q119_stream_cc"`
  * (suffix `before`/`after`; query names must match the registry).
  *
  * The dump is the ANALYZED plan's formatted physical explain as
  * `df.explain("formatted")` would print it — the initial adaptive
  * plan, which is what code review can tie to the query's shape
  * (AQE's runtime rewrites are visible in bench.json's strategies and
  * stall evidence instead). Queries whose construction has side
  * effects (streaming replays, store builds) still run them; plans of
  * their RESULT DataFrames are what lands in the file.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: ExplainDump <outDir> <suffix> <query> [<query> ...]")
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val names = args.drop(2).toSeq
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(outDir)
    val registry = graft.Queries.registry.toMap
    names.foreach { name =>
      val df = registry(name)._1(spark, dir)
      val txt = df.queryExecution.explainString(FormattedMode)
      val p = outDir.resolve(s"${name}_$suffix.txt")
      Files.writeString(p,
        s"== $name ($suffix) ==\n== data: $dir  cores: $cpus ==\n\n" + txt)
      println(s"wrote $p")
      graft.Scratch.reap()
    }
    spark.stop()
  }
}
