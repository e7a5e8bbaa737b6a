package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming._

/** The streaming funnel as a `transformWithState` StatefulProcessor —
  * the arbitrary-state v2 API (Spark 4): typed state VARIABLES instead
  * of one opaque state object, and NAMED TIMERS instead of the single
  * implicit timeout slot, backed by the RocksDB state store.
  *
  * Semantics are identical to the flatMapGroupsWithState form
  * ([[EventStream.funnelDepths]] — the spec pins the two equal,
  * including the conversion-window behavior documented there: quietMs
  * bounds each observation, and a user whose events straddle windows
  * emits one row per window): buffer a user's stage events (arrival
  * order irrelevant; depth is computed from timestamps at close), push
  * the close deadline forward as events arrive, and on timer expiry
  * collapse the buffer to one [[FunnelDepth]] row and drop all state. What the v2 API buys at
  * scale: the event buffer is a ListState — appends write ONLY the new
  * rows to the store, where fMGWS rewrites the whole accumulated state
  * object every batch (O(events²) store writes per user lifetime vs
  * O(events)) — and explicit deleteTimer/registerTimer replaces the
  * set-latest-wins timeout slot.
  *
  * State bound: active users inside the quiet horizon × their buffered
  * stage events, same as the fMGWS form. */
class FunnelProcessor(nStages: Int, quietMs: Long)
    extends StatefulProcessor[Long, StageEvent, FunnelDepth] {

  @transient private var buf: ListState[StageEvent] = _
  @transient private var deadline: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    buf = getHandle.getListState("evts", Encoders.product[StageEvent], TTLConfig.NONE)
    deadline = getHandle.getValueState("deadline", Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[StageEvent],
      timerValues: TimerValues): Iterator[FunnelDepth] = {
    val rs = rows.toArray
    buf.appendList(rs)
    val newDeadline = rs.map(_.ts.getTime).max + quietMs
    val old = if (deadline.exists()) deadline.get() else Long.MinValue
    if (newDeadline > old) {
      if (old != Long.MinValue) getHandle.deleteTimer(old)
      getHandle.registerTimer(newDeadline)
      deadline.update(newDeadline)
    }
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[FunnelDepth] = {
    val evts = buf.get().toSeq
    buf.clear()
    deadline.clear()
    EventStream.depthOfEvents(evts, nStages).map(FunnelDepth(key, _)).iterator
  }
}
