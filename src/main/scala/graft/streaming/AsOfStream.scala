package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One side-tagged temporal event (side 0 = click / right, 1 = purchase
  * / left); `tsUs` carries the full microsecond event time (the
  * Timestamp column `ts` is kept alongside purely so the event-time
  * attribute survives into the stateful operator for watermarking). */
case class AsOfEvent(userId: Long, side: Int, tsUs: Long, eid: Long,
    ts: java.sql.Timestamp)

/** A buffered right-side (click) reference. */
case class ClickRef(tsUs: Long, eid: Long)

/** A buffered, not-yet-final left-side (purchase) reference. */
case class PurchaseRef(tsUs: Long, eid: Long)

/** Per-key as-of state. `best` is the ONE compacted click at-or-before
  * the watermark (the key's "current version" in Flink temporal-join
  * terms); `clicks` holds only clicks still ahead of the watermark;
  * `pending` holds purchases awaiting finalization; `lastSeenUs` anchors
  * the optional idle-retention timer. */
case class AsOfBuf(best: Option[ClickRef], clicks: List[ClickRef],
    pending: List[PurchaseRef], lastSeenUs: Long)

/** One finalized as-of match (micros; formatting happens in columns). */
case class AsOfRow(user_id: Long, purchase_event_id: Long,
    purchase_ts_us: Long, click_event_id: Option[Long],
    click_ts_us: Option[Long])

/** STREAMING as-of join — the streaming twin of the native batch
  * operator ([[graft.plans.AsOfJoin]]) and its window rewrite
  * ([[graft.ext.TemporalJoins.clickAsOfPurchase]]): each purchase is
  * enriched with the latest click at-or-before it by the same user,
  * NULLs when no prior click exists. This is the Flink
  * event-time-temporal-join shape (left stream probed against
  * versioned right-side state per key); the reference analog is the O7
  * keyed lookup (`index.js:107-141`) generalized to time-ordered state.
  *
  * Mechanics — one keyed state machine under `flatMapGroupsWithState`
  * with an event-time timeout:
  *
  *  - A purchase FINALIZES once the watermark strictly passes its
  *    event time: by the watermark contract no click with an earlier
  *    event time can still be admitted, so the match decided then is
  *    the match the batch join would produce. Finalization happens on
  *    whichever comes first: a new event for the key, or the key's
  *    event-time timer (armed at the earliest pending purchase, so a
  *    user with no further traffic still drains).
  *  - STATE IS BOUNDED, and this is the operator's 100-TB argument:
  *    clicks at-or-before the watermark compact to the single max
  *    (ts, event_id) entry `best` — lossless, because every pending or
  *    future purchase has event time >= watermark >= those clicks, so
  *    only the latest of them can ever win an as-of comparison. Per
  *    key the state is exactly one compacted ClickRef plus the
  *    in-horizon buffers — O(1) + O(events inside the watermark
  *    horizon), never the key's history. The compaction step is a pure
  *    function ([[AsOfStream.step]]) and its losslessness + bound are
  *    spec-pinned directly.
  *  - Ties match both batch engines: a click at exactly the purchase
  *    timestamp is visible (<=), equal-timestamp clicks resolve to the
  *    max event_id.
  *  - `toleranceUs` mirrors the native exec's freshness bound (pandas
  *    merge_asof `tolerance`): a best click older than the bound at
  *    purchase time attributes as NO click. Checked at emit time
  *    against the compacted best — identical to the batch rule, and
  *    compaction stays lossless because staleness only ever grows.
  *  - `idleTtlUs` is Flink's idle-state-retention analog: a key wholly
  *    quiet for the TTL drops its state (including `best`, so a
  *    purchase arriving after the TTL sees no click — the documented
  *    retention trade-off). None (default) retains the one-row `best`
  *    per key indefinitely, exactly like Flink's temporal join.
  *  - Rows with NULL event time cannot be watermarked: Structured
  *    Streaming's late filter drops them before the operator. The
  *    batch twins share the no-null-click contract; a null-ts PURCHASE
  *    (batch: emitted with null click) is dropped here — the one
  *    documented stream/batch divergence, inherent to event-time
  *    processing.
  */
object AsOfStream extends Serializable {

  /** The pure per-key transition: fold new events into the buffer,
    * compact clicks at-or-before the watermark into `best`, finalize
    * pending purchases strictly before the watermark, and propose the
    * next timer. Exposed package-private so eviction/losslessness are
    * unit-testable without a streaming query.
    *
    * @return (new state if any, emitted matches, next timer in event
    *         micros if one is needed)
    */
  private[graft] def step(buf: AsOfBuf, incoming: Seq[AsOfEvent],
      wmUs: Long, toleranceUs: Option[Long], idleTtlUs: Option[Long])
      : (Option[AsOfBuf], Seq[AsOfRow], Option[Long]) = {
    val newClicks = incoming.filter(_.side == 0).map(e => ClickRef(e.tsUs, e.eid))
    val newPurch = incoming.filter(_.side == 1).map(e => PurchaseRef(e.tsUs, e.eid))
    val clicks = buf.clicks ++ newClicks

    // FINALIZE FIRST, COMPACT SECOND — the order is load-bearing. A
    // pending purchase may precede clicks that are themselves behind
    // the watermark by now; folding those clicks into `best` before
    // matching would attribute a FUTURE click to the purchase. Every
    // pending purchase entered the state with ts at-or-after the
    // watermark of its arrival batch, and `best` then held only clicks
    // at-or-before that watermark — so matching against best + the
    // still-unfolded click list (filtered to <= the purchase) is exact.
    val (done, keep) = (buf.pending ++ newPurch).partition(_.tsUs < wmUs)
    val emits = done.sortBy(p => (p.tsUs, p.eid)).map { p =>
      val m = (buf.best.toList ++ clicks.filter(_.tsUs <= p.tsUs)) match {
        case Nil => None
        case cs => Some(cs.maxBy(c => (c.tsUs, c.eid)))
      }
      val fresh = m.filter(c =>
        toleranceUs.forall(tol => p.tsUs - c.tsUs <= tol))
      AsOfRow(0L, p.eid, p.tsUs, fresh.map(_.eid), fresh.map(_.tsUs))
    }

    // compact: clicks at-or-before the watermark fold into the single
    // best (max ts, then max eid) — lossless now that every purchase
    // that could precede them has drained (all remaining have ts >= wm)
    val (oldC, liveC) = clicks.partition(_.tsUs <= wmUs)
    val best = (buf.best.toList ++ oldC) match {
      case Nil => None
      case cs => Some(cs.maxBy(c => (c.tsUs, c.eid)))
    }

    val lastSeen = (buf.lastSeenUs +: incoming.map(_.tsUs)).max
    val idleCutoff = idleTtlUs.map(lastSeen + _)
    val expired = idleCutoff.exists(_ <= wmUs)
    val nextBuf =
      if (expired || (keep.isEmpty && liveC.isEmpty && best.isEmpty &&
          idleTtlUs.isEmpty)) None
      else Some(AsOfBuf(best, liveC, keep, lastSeen))
    // timer: drain the earliest pending purchase; else compact the
    // earliest live click once it ages past the watermark; else (TTL
    // mode) fire at the idle cutoff to drop the key
    val timer = nextBuf.flatMap { _ =>
      val drain = keep.map(_.tsUs).minOption
      val compact = liveC.map(_.tsUs).minOption
      (drain, compact) match {
        case (Some(d), _) => Some(d)
        case (None, Some(c)) => Some(c)
        case (None, None) => idleCutoff
      }
    }
    (nextBuf, emits, timer)
  }

  /** Streaming twin of [[graft.ext.TemporalJoins.clickAsOfPurchase]]:
    * same output schema, same tie rules, rows emitted as their
    * purchases finalize under the watermark. */
  def clickAsOfPurchaseStream(events: DataFrame, lateness: String = "2 hours",
      toleranceUs: Option[Long] = None, idleTtlUs: Option[Long] = None)
      : DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._

    def fn(key: Long, rows: Iterator[AsOfEvent],
        state: GroupState[AsOfBuf]): Iterator[AsOfRow] = {
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val buf = state.getOption.getOrElse(AsOfBuf(None, Nil, Nil, Long.MinValue))
      val (next, emits, timer) =
        step(buf, rows.toSeq, wmUs, toleranceUs, idleTtlUs)
      next match {
        case Some(b) =>
          state.update(b)
          // the timer must sit strictly past the current watermark; +1ms
          // over the event's own millisecond so the watermark strictly
          // passes the event time when it fires
          timer.foreach(t => state.setTimeoutTimestamp(
            math.max(t / 1000L + 1L, state.getCurrentWatermarkMs() + 1L)))
        case None if state.exists => state.remove()
        case None =>
      }
      emits.map(_.copy(user_id = key)).iterator
    }

    events
      .withWatermark("ts", lateness)
      .filter(col("event_type").isin("click", "purchase") &&
        col("ts").isNotNull)
      .select(col("user_id").as("userId"),
        when(col("event_type") === "click", lit(0)).otherwise(lit(1)).as("side"),
        unix_micros(col("ts")).as("tsUs"),
        col("event_id").as("eid"), col("ts"))
      .as[AsOfEvent]
      .groupByKey(_.userId)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
      .select(
        col("user_id"),
        col("purchase_event_id"),
        date_format(timestamp_micros(col("purchase_ts_us")), fmt).as("purchase_ts"),
        col("click_event_id"),
        date_format(timestamp_micros(col("click_ts_us")), fmt).as("click_ts"),
        (col("purchase_ts_us") - col("click_ts_us")).as("gap_us"))
  }

  private val fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
}
