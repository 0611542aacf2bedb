package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [queryName...] — names, when given, restrict
    // the dump to that subset (dev iteration); the driver passes none.
    val sfDir = args(0)
    val outDir = args(1)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // same guarded tmpfs local-dir routing as Bench (r14) — placement
    // only, results unaffected; spares the correctness dump from the
    // disk tmpdir's degraded-latency windows
    val (localDir, _) = Scratch.sparkLocalDir(sfDir)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", localDir)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Ephemeral replay checkpoints don't need corruption detection;
      // see the Bench builder's r13 note (CheckpointProbe numbers).
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Physical-strategy decisions per query (r12) — see StrategyLog;
    // dumped as strategies.json so a sparse/dense mis-cutover is
    // visible next to the correctness artifacts.
    StrategyLog.drain()
    val strategies = scala.collection.mutable.LinkedHashMap
      .empty[String, Seq[String]]
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
        val decs = StrategyLog.render(StrategyLog.drain())
        if (decs.nonEmpty) strategies(name) = decs
        // r14: reap per query like Bench — Verify JVMs were the main
        // source of orphaned replay/checkpoint scratch (now partly on
        // tmpfs, i.e. RAM, where "cleaned at reboot" never comes). The
        // query's result parquet is fully written above, so its
        // scratch is garbage here by construction.
        Scratch.reap()
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.isEmpty || only(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val stratJson = strategies.map { case (k, ds) =>
      s"${q(k)}: [${ds.map(q).mkString(",")}]"
    }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/strategies.json"), stratJson)
    spark.stop()
  }
}
