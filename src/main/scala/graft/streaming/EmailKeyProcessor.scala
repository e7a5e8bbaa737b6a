package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming._

/** The CCAS email-dedup state machine (O7 lookup + O11 transition,
  * reference index.js:107-141, 448-497) as a `transformWithState`
  * StatefulProcessor — the arbitrary-state v2 twin of
  * [[StreamPipeline.outcomes]]' flatMapGroupsWithState form, exactly as
  * [[FunnelProcessor]] twins the fMGWS funnel. The spec pins all three
  * forms (TWS ≡ fMGWS ≡ batch pipeline) equal.
  *
  * What v2 buys here at scale: the per-key state is ONE ValueState row
  * (updated only on the pending→triggered transition — O(1) store
  * writes per key lifetime), and TTL eviction is an explicit NAMED
  * event-time timer (registerTimer/deleteTimer) instead of fMGWS's
  * single set-latest-wins timeout slot, so a future extension (e.g. a
  * separate re-notify timer per key) composes instead of fighting over
  * one slot. Needs the RocksDB state store provider
  * (`spark.sql.streaming.stateStore.providerClass`).
  *
  * Semantics, matching `stateFn`/`stateFnTtl` exactly: records of one
  * key process in sequence order; the first record whose stateless
  * decision is email_triggered wins and flips the key's state; every
  * later record that reaches the dedup check is duplicate_prevented;
  * stateless outcomes pass through. With `ttlMs > 0` (event-time mode)
  * the key's timer advances to max event time + ttl on each batch and
  * expiry drops the state — the same watermark-driven horizon as
  * [[StreamPipeline.outcomesWithTtl]]. `ttlMs <= 0` registers no
  * timers (TimeMode.None — unbounded retention).
  */
class EmailKeyProcessor(ttlMs: Long)
    extends StatefulProcessor[String, PreDecidedEvt, StreamOutcome] {

  @transient private var st: ValueState[EmailKeyState] = _
  @transient private var deadline: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    st = getHandle.getValueState("emailKey",
      Encoders.product[EmailKeyState], TTLConfig.NONE)
    deadline = getHandle.getValueState("deadline",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: String, rows: Iterator[PreDecidedEvt],
      timerValues: TimerValues): Iterator[StreamOutcome] = {
    val rs = rows.toArray.sortBy(_.seq)
    var cur = if (st.exists()) st.get()
      else EmailKeyState(triggered = false, firstSeq = -1L)
    val wasTriggered = cur.triggered
    val out = rs.map { r =>
      if (r.reachesDupCheck && cur.triggered)
        StreamOutcome(r.recordId, r.eventId, r.guestId, r.emailKey,
          "duplicate_prevented", "Email job already exists for this address")
      else if (r.statelessAction == "email_triggered") {
        cur = EmailKeyState(triggered = true, firstSeq = r.seq)
        StreamOutcome(r.recordId, r.eventId, r.guestId, r.emailKey,
          "email_triggered", "All criteria met")
      } else
        StreamOutcome(r.recordId, r.eventId, r.guestId, r.emailKey,
          r.statelessAction, r.statelessReason)
    }
    // O(1) writes: the ValueState is touched only on the one
    // pending→triggered transition, never per record
    if (cur.triggered && !wasTriggered) st.update(cur)
    if (ttlMs > 0 && cur.triggered) {
      val newDeadline = rs.map(_.evtTime.getTime).max + ttlMs
      val old = if (deadline.exists()) deadline.get() else Long.MinValue
      if (newDeadline > old) {
        if (old != Long.MinValue) getHandle.deleteTimer(old)
        getHandle.registerTimer(newDeadline)
        deadline.update(newDeadline)
      }
    }
    out.iterator
  }

  override def handleExpiredTimer(key: String, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[StreamOutcome] = {
    st.clear()
    deadline.clear()
    Iterator.empty
  }
}
