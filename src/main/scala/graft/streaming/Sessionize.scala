package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via `flatMapGroupsWithState` (SURVEY.md §2.10 /
  * builder mandate): gap-based sessionization of a keyed event stream —
  * the canonical operator Spark's built-in windows cannot express (session
  * boundaries depend on data, not the clock grid).
  *
  * A session closes when the next event of the same key arrives more than
  * `gapMs` after the previous one (deterministic, data-driven); the
  * still-open session per key lives in the state store. Works identically
  * over a batch Dataset (state is per-invocation) and a stream (state
  * persists across micro-batches via the checkpointed state store).
  *
  * 100 TB notes: state is O(active keys) × ~3 longs; the shuffle is the
  * groupByKey on user id. With `EventTimeTimeout` + a watermark, idle
  * sessions are evicted by the engine; kept optional here so batch and
  * deterministic tests share the code path.
  */
object Sessionize {

  final case class Event(user_id: Long, ts_ms: Long, event_type: String)
  final case class SessionState(start: Long, last: Long, events: Long)
  final case class Session(user_id: Long, session_start: Long, session_end: Long, events: Long)

  def sessionStep(gapMs: Long)(
      user: Long,
      incoming: Iterator[Event],
      state: GroupState[SessionState]
  ): Iterator[Session] = {
    val sorted = incoming.toIndexedSeq.sortBy(_.ts_ms)
    var closed = List.empty[Session]
    var cur = state.getOption
    sorted.foreach { e =>
      cur = cur match {
        case Some(s) if e.ts_ms - s.last > gapMs =>
          closed ::= Session(user, s.start, s.last, s.events)
          Some(SessionState(e.ts_ms, e.ts_ms, 1))
        case Some(s) if s.start - e.ts_ms > gapMs =>
          // straggler more than a gap OLDER than the open session: it can
          // never join it — emit it as its own (already-closed) session.
          // Known approximation: multiple stragglers that are mutually
          // within a gap each close as singletons (tracking reopened past
          // sessions would need a session LIST in state; the reference-
          // style no-watermark pipelines route stragglers to sink-side
          // merges instead, see MvPipeline)
          closed ::= Session(user, e.ts_ms, e.ts_ms, 1)
          Some(s)
        case Some(s) =>
          // late events within a gap of the open session extend its bounds
          // monotonically — shrinking `last` would force bogus closes
          Some(SessionState(math.min(s.start, e.ts_ms), math.max(s.last, e.ts_ms), s.events + 1))
        case None =>
          Some(SessionState(e.ts_ms, e.ts_ms, 1))
      }
    }
    cur.foreach(state.update)
    closed.reverse.iterator
  }

  /** Closed sessions of a (batch or streaming) event Dataset. */
  def sessions(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    implicit val se: org.apache.spark.sql.Encoder[SessionState] = Encoders.product[SessionState]
    implicit val so: org.apache.spark.sql.Encoder[Session] = Encoders.product[Session]
    implicit val ke: org.apache.spark.sql.Encoder[Long] = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(sessionStep(gapMs))
  }
}
