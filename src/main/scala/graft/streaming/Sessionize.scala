package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization: the unbounded-stream counterpart of
  * the batch q37 (gap-split sessions) using
  * `KeyValueGroupedDataset.flatMapGroupsWithState` — the engine's custom
  * per-key state primitive.
  *
  * State per key is one open session (constant size); closed sessions are
  * emitted either when a gap exceeds `gapMs` within a batch or when the
  * processing-time timeout fires with no new events — so state is bounded
  * by active keys, not by history, which is what survives an unbounded
  * 100 TB/day stream.
  */
object Sessionize {

  final case class Event(user_id: Long, ts_ms: Long)

  /** One closed session. */
  final case class Session(
      user_id: Long, start_ms: Long, end_ms: Long, n_events: Long)

  /** Open-session state carried between micro-batches. */
  final case class OpenSession(start_ms: Long, end_ms: Long, n: Long)

  /** @param idleTimeoutMs close sessions for keys idle this long
    *        (processing time). 0 disables timeouts — sessions then close
    *        only when a gap-exceeding event arrives, which keeps
    *        micro-batch scheduling quiescent (a live stream should set
    *        this; a drain-and-stop test must not, or
    *        `processAllAvailable` never settles because every timeout
    *        schedules another batch).
    */
  def sessionize(events: Dataset[Event], gapMs: Long,
      idleTimeoutMs: Long = 0L): Dataset[Session] = {
    implicit val sessionEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val longEnc = Encoders.scalaLong
    val timeoutConf =
      if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, timeoutConf) {
        (userId: Long, batch: Iterator[Event],
         state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // no events for this key since the timeout was set: close out
            val closed = state.getOption
              .map(s => Session(userId, s.start_ms, s.end_ms, s.n)).toList
            state.remove()
            closed.iterator
          } else {
            val sorted = batch.toSeq.sortBy(_.ts_ms)
            val closed = List.newBuilder[Session]
            var open = state.getOption
            // pending session built from out-of-order events that precede
            // the open session by more than the gap: consecutive such
            // events within gapMs of each other form ONE session (batch
            // q37 semantics), not singletons; closed at batch end
            var ooo: Option[OpenSession] = None
            sorted.foreach { e =>
              open match {
                case Some(s) if e.ts_ms < s.start_ms - gapMs =>
                  // older than the open session by more than the gap:
                  // without this bound it would merge (negative distance
                  // to end_ms is trivially <= gapMs) and rewind start_ms
                  // arbitrarily far back
                  ooo = ooo match {
                    case Some(o) if e.ts_ms - o.end_ms <= gapMs =>
                      Some(OpenSession(o.start_ms, e.ts_ms, o.n + 1))
                    case Some(o) =>
                      closed += Session(userId, o.start_ms, o.end_ms, o.n)
                      Some(OpenSession(e.ts_ms, e.ts_ms, 1))
                    case None => Some(OpenSession(e.ts_ms, e.ts_ms, 1))
                  }
                case Some(s) if e.ts_ms - s.end_ms <= gapMs =>
                  // min/max: a late event from a previous micro-batch must
                  // extend the session bounds, never rewind them (bounded
                  // by the gap check above)
                  open = Some(OpenSession(math.min(s.start_ms, e.ts_ms),
                    math.max(s.end_ms, e.ts_ms), s.n + 1))
                case Some(s) =>
                  closed += Session(userId, s.start_ms, s.end_ms, s.n)
                  open = Some(OpenSession(e.ts_ms, e.ts_ms, 1))
                case None =>
                  open = Some(OpenSession(e.ts_ms, e.ts_ms, 1))
              }
            }
            // the pending out-of-order session closes with the batch —
            // an accepted approximation (analogous to a watermark
            // lateness bound): a later batch's even-more-out-of-order
            // event, or an open session whose start later extends back
            // toward it, would merge in exact batch semantics
            ooo.foreach(o => closed += Session(userId, o.start_ms, o.end_ms, o.n))
            open.foreach { s =>
              state.update(s)
              if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
            }
            closed.result().iterator
          }
      }
  }
}
