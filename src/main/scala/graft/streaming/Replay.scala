package graft.streaming

import org.apache.spark.sql.SparkSession

/** Session-conf scoping for the replay-harness streaming queries.
  *
  * Every graft streaming query is an AvailableNow REPLAY: a bounded
  * local stage, an ephemeral checkpoint that lives for one run and is
  * then reaped. Two session confs make that harness disk-insensitive —
  * the fork-free [[LocalNioCheckpointFileManager]] and checkpoint-file
  * checksums off (r13: the checksum manager doubles every metadata op;
  * corruption detection on a one-run reaped checkpoint buys nothing) —
  * but both are SESSION-wide settings, and a library must not leave a
  * user's session reconfigured: a durable production stream started
  * later on the same session should see Spark's defaults. So the
  * harness scopes them: set, run the replay, restore the previous
  * values in a finally.
  */
object Replay {
  private val MgrKey = "spark.sql.streaming.checkpointFileManagerClass"
  private val CkKey = "spark.sql.streaming.checkpoint.fileChecksum.enabled"

  /** Run `body` with replay-tuned checkpoint confs, handing it a fresh
    * reap-registered checkpoint dir on the fast root; restores the
    * session's previous conf values afterwards. The StrategyLog line
    * makes the harness choice visible per-query in bench.json.
    */
  def withLocalCheckpoints[T](s: SparkSession, prefix: String)(
      body: String => T): T = {
    val oldMgr = s.conf.getOption(MgrKey)
    val oldCk = s.conf.getOption(CkKey)
    s.conf.set(MgrKey, classOf[LocalNioCheckpointFileManager].getName)
    s.conf.set(CkKey, "false")
    graft.StrategyLog.record("replay-cp", "nio-local",
      s"$prefix: fork-free NIO checkpoint manager, checksums off (ephemeral replay)")
    val cp = graft.Scratch.cpDir(prefix).getPath
    try body(cp)
    finally {
      def restore(key: String, v: Option[String]): Unit = v match {
        case Some(x) => s.conf.set(key, x)
        case None => s.conf.unset(key)
      }
      restore(MgrKey, oldMgr)
      restore(CkKey, oldCk)
    }
  }
}
