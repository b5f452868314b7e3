package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** S3/S4 — arbitrary per-key state with event-time TTL (SURVEY §2.7).
  *
  * The reference's per-session mutable dict (`st.session_state`,
  * app.py:54-67) and its reset buttons (app.py:488-509) map to
  * `flatMapGroupsWithState` keyed by user: a running per-user aggregate
  * that (a) updates on every event, (b) resets on an explicit 'reset'
  * event (the "Clear Chat History" analog), and (c) expires via
  * event-time timeout once the watermark passes last activity + TTL
  * (the "Clear All Data" analog) — at which point the final summary is
  * emitted and state is dropped.
  *
  * State is per-key and O(1)-sized; at 100 TB of events the state store
  * shards by key across executors — nothing here is driver-resident.
  */
object Sessionize {

  case class Ev(ts: java.sql.Timestamp, user_id: Long, event_type: String, value: Double)
  case class UserState(n: Long, total: Double, lastTs: Long)
  case class UserUpdate(user_id: Long, n: Long, total: Double, closed: Boolean)

  val TtlMs: Long = 10 * 60 * 1000 // 10 minutes past last activity

  def updates(events: Dataset[Ev]): Dataset[UserUpdate] = {
    implicit val stateEnc = Encoders.product[UserState]
    implicit val outEnc = Encoders.product[UserUpdate]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(
        (uid: Long, evs: Iterator[Ev], state: GroupState[UserState]) => {
          if (state.hasTimedOut) {
            // S4: TTL fired — emit the closing summary and drop the state.
            val s = state.get
            state.remove()
            Iterator.single(UserUpdate(uid, s.n, s.total, closed = true))
          } else {
            var s = state.getOption.getOrElse(UserState(0L, 0.0, 0L))
            var reset = false
            evs.toSeq.sortBy(e => (e.ts.getTime, e.event_type)).foreach { e =>
              if (e.event_type == "reset") { s = UserState(0L, 0.0, e.ts.getTime); reset = true }
              else s = UserState(s.n + 1, s.total + e.value, math.max(s.lastTs, e.ts.getTime))
            }
            state.update(s)
            // Clamp to just above the watermark: a group fed entirely by
            // LATE events (Spark does not pre-filter late rows for
            // flatMapGroupsWithState) can have lastTs + TTL below the
            // current watermark, and setTimeoutTimestamp throws on past
            // timestamps — crashing the query instead of closing the
            // already-expired session. The clamp arms the earliest legal
            // timer, so such a session closes at the next trigger.
            state.setTimeoutTimestamp(
              math.max(s.lastTs + TtlMs, state.getCurrentWatermarkMs() + 1))
            Iterator.single(UserUpdate(uid, s.n, s.total, closed = false))
          }
        })
  }
}
