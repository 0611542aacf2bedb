package graft

/** Per-JVM registry of physical-strategy decisions made by operators
  * that pick between execution plans at runtime (today: [[operators.
  * Retrieval.bm25TopK]]'s sparse-inverted-index vs dense-DAAT switch).
  *
  * Why this exists (r12, VERDICT r11 item 5): a strategy cutover chosen
  * from a measured proxy (the sampled BM25 candidate ratio) is invisible in
  * artifacts — a future corpus that lands on the WRONG side of the
  * boundary would silently run the degenerate plan and the only symptom
  * would be a slow bench row with no explanation. Operators therefore
  * `record` every decision with the proxy values that drove it; `Bench`
  * folds the drained decisions into `bench.json` (`"strategies"`) and
  * `Verify` dumps them next to the oracle SQL, so a mis-cutover is
  * visible (and diffable round over round) from the artifacts alone.
  *
  * Deliberately driver-side only and allocation-trivial: decisions are
  * plan-construction events (a handful per query), never per-row. The
  * buffer is BOUNDED (r12 review): a long-lived application calling
  * instrumented operators without ever draining would otherwise leak a
  * Decision per call forever — past [[maxEntries]], new decisions are
  * dropped and counted, and the next drain surfaces the drop count as
  * a synthetic final entry so the truncation is visible in artifacts.
  */
object StrategyLog {
  final case class Decision(op: String, strategy: String, detail: String)

  /** Generous for any drain-per-query consumer (a handful of decisions
    * per query); small enough that an undrained session stays bounded.
    */
  val maxEntries = 8192

  private val buf =
    new java.util.concurrent.ConcurrentLinkedQueue[Decision]()
  private val size = new java.util.concurrent.atomic.AtomicInteger(0)
  private val dropped = new java.util.concurrent.atomic.AtomicLong(0L)

  def record(op: String, strategy: String, detail: String): Unit =
    if (size.incrementAndGet() <= maxEntries)
      buf.add(Decision(op, strategy, detail))
    else {
      size.decrementAndGet()
      dropped.incrementAndGet()
    }

  /** Snapshot and clear — callers own the drained window (Bench drains
    * per query so decisions attribute to the query that made them).
    */
  def drain(): Seq[Decision] = {
    val out = Seq.newBuilder[Decision]
    var d = buf.poll()
    while (d != null) { out += d; size.decrementAndGet(); d = buf.poll() }
    val nDropped = dropped.getAndSet(0L)
    if (nDropped > 0)
      out += Decision("strategy-log", "dropped",
        s"$nDropped decisions dropped past maxEntries=$maxEntries")
    out.result()
  }

  /** The one artifact rendering of a drained window — Bench
    * (bench.json `"strategies"`) and Verify (strategies.json) must
    * agree byte-for-byte or the two artifacts silently diverge.
    */
  def render(decisions: Seq[Decision]): Seq[String] =
    decisions.map(d => s"${d.op}=${d.strategy} [${d.detail}]").distinct
}
