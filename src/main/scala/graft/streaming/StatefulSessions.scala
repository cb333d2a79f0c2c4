package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization via flatMapGroupsWithState — the
  * custom-state path the built-in windowed aggregations can't express
  * (arbitrary gap-based sessions; builder brief: "mapGroupsWithState /
  * flatMapGroupsWithState for custom state").
  *
  * State per user = the open session (id, start, last-seen, count). An
  * event later than `gapSeconds` after last-seen CLOSES the open session
  * (emitting it) and opens the next. Batch-parity: on a replayed bounded
  * stream plus [[flushOpenSessions]], output equals the batch e1 query
  * (verified in StatefulSessionsSpec).
  *
  * At scale: state is per-key and O(1) per user; with event-time timeouts
  * + watermark the store evicts idle users, so state size tracks ACTIVE
  * users, not history. (The demo uses ProcessingTimeTimeout-free batch
  * replay, where timeouts never fire.)
  */
object StatefulSessions {

  case class Event(user_id: Long, es: Long, event_id: Long)
  case class OpenSession(sessionId: Long, startEs: Long, lastEs: Long, n: Long)
  case class SessionOut(user_id: Long, session_id: Long, n_events: Long,
      session_start_epoch: Long)

  def sessionize(
      events: Dataset[Event],
      gapSeconds: Long = 1800): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[OpenSession]) =>
          // events within a micro-batch arrive unordered: order like the
          // batch query does (es, then event_id)
          val sorted = batch.toSeq.sortBy(e => (e.es, e.event_id))
          var open = state.getOption.orNull
          val closed = Seq.newBuilder[SessionOut]
          sorted.foreach { e =>
            if (open == null) {
              open = OpenSession(1L, e.es, e.es, 1L)
            } else if (e.es - open.lastEs > gapSeconds) {
              closed += SessionOut(userId, open.sessionId, open.n, open.startEs)
              open = OpenSession(open.sessionId + 1, e.es, e.es, 1L)
            } else {
              // cross-batch late event (e.es < lastEs): merge into the open
              // session WITHOUT regressing lastEs — a regressed watermark
              // would fabricate a session split the batch query never sees.
              // (Events later than the session span by > gap belong to a
              // closed session; bounding that properly is the watermark's
              // job — the engine pairs this with withWatermark upstream.)
              open = open.copy(
                startEs = math.min(open.startEs, e.es),
                lastEs = math.max(open.lastEs, e.es),
                n = open.n + 1)
            }
          }
          if (open != null) state.update(open)
          closed.result().iterator
      }
  }

  /** End-of-stream flush events: one sentinel per user far beyond the gap,
    * forcing each open session to close and emit. The sentinel's own
    * (never-emitted) session is the only state left behind. */
  def flushEvents(users: Seq[Long], afterEs: Long, gapSeconds: Long = 1800): Seq[Event] =
    users.map(u => Event(u, afterEs + 100 * gapSeconds, Long.MaxValue))
}
