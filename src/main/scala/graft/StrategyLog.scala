package graft

/** Per-JVM registry of physical-strategy decisions made by operators
  * that pick between execution plans at runtime (today: [[operators.
  * Retrieval.bm25TopK]]'s sparse-inverted-index vs dense-DAAT switch).
  *
  * Why this exists (r12, VERDICT r11 item 5): a strategy cutover chosen
  * from a measured proxy (doc count vs `denseAboveDocs`) is invisible in
  * artifacts — a future corpus that lands on the WRONG side of the
  * boundary would silently run the degenerate plan and the only symptom
  * would be a slow bench row with no explanation. Operators therefore
  * `record` every decision with the proxy values that drove it; `Bench`
  * folds the drained decisions into `bench.json` (`"strategies"`) and
  * `Verify` dumps them next to the oracle SQL, so a mis-cutover is
  * visible (and diffable round over round) from the artifacts alone.
  *
  * Deliberately driver-side only and allocation-trivial: decisions are
  * plan-construction events (a handful per query), never per-row.
  */
object StrategyLog {
  final case class Decision(op: String, strategy: String, detail: String)

  private val buf =
    new java.util.concurrent.ConcurrentLinkedQueue[Decision]()

  def record(op: String, strategy: String, detail: String): Unit =
    buf.add(Decision(op, strategy, detail))

  /** Snapshot and clear — callers own the drained window (Bench drains
    * per query so decisions attribute to the query that made them).
    */
  def drain(): Seq[Decision] = {
    val out = Seq.newBuilder[Decision]
    var d = buf.poll()
    while (d != null) { out += d; d = buf.poll() }
    out.result()
  }
}
