package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** S3/S4 on the Spark 4.x arbitrary-state API (`transformWithState`) —
  * the engine's forward path for per-key state at lake scale.
  *
  * Semantics are IDENTICAL to [[Sessionize.updates]] (same running
  * aggregate, same reset event, same event-time TTL closing summary) —
  * the parity is spec-asserted over the same input stream. What changes
  * is the state machinery, and each change matters at 100 TB:
  *
  *   - typed state VARIABLES ([[ValueState]]) instead of one opaque state
  *     object: each variable is its own column family in the store, so a
  *     processor can mix value/list/map state without rewriting one blob
  *     per event — list/map entries update incrementally instead of
  *     read-modify-write of the whole aggregate;
  *   - first-class event-time TIMERS (`registerTimer`/`deleteTimer`)
  *     replacing the single `setTimeoutTimestamp` slot, decoupling "when
  *     to wake" from "what is stored";
  *   - the RocksDB state-store provider: per-key state lives off-heap
  *     and spills to disk, so state size is bounded by local SSD, not
  *     executor heap — the difference between "10M live sessions" and
  *     an OOM on a hot shard. Changelog checkpointing ships deltas, not
  *     full snapshots, per micro-batch.
  *
  * The reference analog is unchanged: `st.session_state` (app.py:54-67)
  * with reset buttons (app.py:488-509).
  */
object SessionizeTws {

  import Sessionize.{Ev, TtlMs, UserState, UserUpdate}

  /** Per-user session processor: running (n, total, lastTs) in a
    * ValueState, one armed event-time timer at lastTs + TTL (re-armed on
    * activity, the stale timer deleted), closing summary on expiry. */
  class SessionProcessor extends StatefulProcessor[Long, Ev, UserUpdate] {
    @transient private var session: ValueState[UserState] = _
    @transient private var deadline: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      session = getHandle.getValueState[UserState](
        "session", Encoders.product[UserState], TTLConfig.NONE)
      deadline = getHandle.getValueState[Long](
        "deadline", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(
        uid: Long, evs: Iterator[Ev], tv: TimerValues): Iterator[UserUpdate] = {
      var s = if (session.exists()) session.get() else UserState(0L, 0.0, 0L)
      evs.toSeq.sortBy(e => (e.ts.getTime, e.event_type)).foreach { e =>
        if (e.event_type == "reset") s = UserState(0L, 0.0, e.ts.getTime)
        else s = UserState(s.n + 1, s.total + e.value, math.max(s.lastTs, e.ts.getTime))
      }
      session.update(s)
      // re-arm the TTL: drop the previously armed timer (if any), arm at
      // the new last activity + TTL — exactly one live timer per key
      if (deadline.exists()) getHandle.deleteTimer(deadline.get())
      getHandle.registerTimer(s.lastTs + TtlMs)
      deadline.update(s.lastTs + TtlMs)
      Iterator.single(UserUpdate(uid, s.n, s.total, closed = false))
    }

    override def handleExpiredTimer(
        uid: Long, tv: TimerValues, info: ExpiredTimerInfo): Iterator[UserUpdate] = {
      // S4: TTL fired — emit the closing summary and drop ALL state
      if (session.exists()) {
        val s = session.get()
        session.clear(); deadline.clear()
        Iterator.single(UserUpdate(uid, s.n, s.total, closed = true))
      } else Iterator.empty
    }
  }

  /** [[Sessionize.updates]] re-expressed on transformWithState; callers
    * must run it on a RocksDB-provider stream (spec does). */
  def updates(events: Dataset[Ev]): Dataset[UserUpdate] = {
    implicit val outEnc = Encoders.product[UserUpdate]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(
        new SessionProcessor, TimeMode.EventTime(), OutputMode.Update())
  }
}
