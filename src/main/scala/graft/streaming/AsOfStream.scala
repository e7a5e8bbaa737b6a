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

/** A buffered, not-yet-final left-side (purchase) reference. `cand`
  * is the forward/nearest directions' running successor candidate —
  * the earliest eligible click at-or-after the purchase seen so far
  * (lowest eid on ties); always None under backward. */
case class PurchaseRef(tsUs: Long, eid: Long,
    cand: Option[ClickRef] = None)

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

  /** The forward/nearest per-key transition — the directions' streaming
    * semantics, as a pure function like [[step]].
    *
    * FORWARD finalization: a purchase's running candidate (earliest
    * eligible click at-or-after it) is FINAL once the watermark
    * strictly passes the candidate's event time — no click with an
    * earlier time can still be admitted, so nothing can beat it. A
    * candidateless purchase finalizes as NO MATCH once the watermark
    * passes `p.ts + tolerance`: without the bound it could wait
    * forever (a matching click may always be one batch away), which is
    * why these directions REQUIRE a tolerance — the same boundedness
    * reason [[graft.plans.AsOfPushdown]] derives no right time bound
    * for nearest without one.
    *
    * NEAREST adds the backward compaction ([[step]]'s `best` machinery,
    * identically lossless) and decides per purchase once the watermark
    * passed it (backward match known) AND either the forward side is
    * decided (final candidate, or the tolerance horizon passed) or an
    * eligible backward match at distance d makes waiting pointless
    * (wm ≥ p.ts + d ⇒ any future click has distance ≥ d and backward
    * wins distance ties). Click buffers stay in-horizon-bounded: a
    * click STRICTLY behind the watermark can never serve a future
    * purchase's forward side (future p.ts ≥ wm > c.ts), and its
    * backward role compacts into `best` exactly as in [[step]]. */
  private[graft] def stepDir(direction: graft.plans.AsOfDirection,
      buf: AsOfBuf, incoming: Seq[AsOfEvent],
      wmUs: Long, tolUs: Long, idleTtlUs: Option[Long])
      : (Option[AsOfBuf], Seq[AsOfRow], Option[Long]) = {
    val nearest = direction == graft.plans.AsOfDirection.Nearest
    val newClicks = incoming.filter(_.side == 0).map(e => ClickRef(e.tsUs, e.eid))
    val newPurch = incoming.filter(_.side == 1).map(e => PurchaseRef(e.tsUs, e.eid))
    val clicks = buf.clicks ++ newClicks

    // candidate maintenance: pending purchases fold in the NEW clicks
    // (older buffered ones were folded when they arrived); brand-new
    // purchases fold the whole in-horizon buffer. Eligible = at-or-
    // after within tolerance; better = earlier ts, then lower eid.
    def fold(p: PurchaseRef, cs: Seq[ClickRef]): PurchaseRef =
      cs.foldLeft(p) { (acc, c) =>
        val eligible = c.tsUs >= acc.tsUs && c.tsUs - acc.tsUs <= tolUs
        val better = acc.cand.forall(x =>
          c.tsUs < x.tsUs || (c.tsUs == x.tsUs && c.eid < x.eid))
        if (eligible && better) acc.copy(cand = Some(c)) else acc
      }
    val pending = buf.pending.map(fold(_, newClicks)) ++
      newPurch.map(fold(_, clicks))

    // finalize. Backward-side knowledge requires wm > p.ts (as in
    // step); the forward side is decided when the candidate is final
    // (wm > cand.ts) or the horizon passed (wm > p.ts + tol).
    def backwardMatch(p: PurchaseRef): Option[ClickRef] =
      (buf.best.toList ++ clicks.filter(_.tsUs <= p.tsUs)) match {
        case Nil => None
        case cs => Some(cs.maxBy(c => (c.tsUs, c.eid)))
      }
    def decided(p: PurchaseRef): Boolean = {
      val fwdDecided = p.cand.exists(c => wmUs > c.tsUs) ||
        wmUs > p.tsUs + tolUs
      if (!nearest) fwdDecided
      else wmUs > p.tsUs && (fwdDecided ||
        backwardMatch(p).exists(b =>
          p.tsUs - b.tsUs <= tolUs && wmUs >= p.tsUs + (p.tsUs - b.tsUs)))
    }
    val (done, keep) = pending.partition(decided)
    val emits = done.sortBy(p => (p.tsUs, p.eid)).map { p =>
      val f = p.cand // eligibility (within tolerance) enforced at fold
      val m =
        if (!nearest) f
        else {
          val b = backwardMatch(p).filter(b => p.tsUs - b.tsUs <= tolUs)
          (b, f) match {
            case (Some(bb), Some(ff)) =>
              // distance tie → backward (the batch rule)
              if (p.tsUs - bb.tsUs <= ff.tsUs - p.tsUs) Some(bb) else Some(ff)
            case (bb, ff) => bb.orElse(ff)
          }
        }
      AsOfRow(0L, p.eid, p.tsUs, m.map(_.eid), m.map(_.tsUs))
    }

    // buffer bound: clicks strictly behind the watermark can't serve a
    // future purchase's forward side; for nearest their backward role
    // compacts losslessly into best (pending purchases already folded
    // them into candidates on arrival, and their backward matches are
    // computed from best ∪ the still-buffered list at emit)
    val (oldC, liveC) = clicks.partition(_.tsUs < wmUs)
    val best =
      if (!nearest) None
      else (buf.best.toList ++ oldC) match {
        case Nil => None
        case cs => Some(cs.maxBy(c => (c.tsUs, c.eid)))
      }
    // nearest must NOT compact a click still at-or-ahead of a pending
    // purchase's own time into oblivion — it can't: liveC keeps
    // everything >= wm, and pending purchases have ts >= wm too, so
    // any click between a pending purchase and the watermark... is
    // impossible (clicks < wm are oldC; pending p.ts >= wm > oldC.ts,
    // so oldC are strictly-before matches, exactly best's domain).

    val lastSeen = (buf.lastSeenUs +: incoming.map(_.tsUs)).max
    val idleCutoff = idleTtlUs.map(lastSeen + _)
    val expired = idleCutoff.exists(_ <= wmUs)
    val nextBuf =
      if (expired || (keep.isEmpty && liveC.isEmpty && best.isEmpty &&
          idleTtlUs.isEmpty)) None
      else Some(AsOfBuf(best, liveC, keep, lastSeen))
    // timer: per pending purchase the earliest instant its decision
    // can flip — the candidate's ts (final once wm passes it), else
    // its tolerance horizon; for nearest ALSO the backward
    // early-decide instant p.ts + backward-distance (decided()'s
    // wm ≥ p.ts + d shortcut: a within-tolerance backward match at
    // distance d beats any future click once the wm passes that
    // mirror point — without this instant a purchase with a backward
    // match but no forward candidate waits out the full tolerance
    // horizon). decided()'s wm > p.ts gate needs no instant of its
    // own: every drain above is ≥ p.ts by construction (forward
    // candidates satisfy c.ts ≥ p.ts) and the timer is set strictly
    // past the firing watermark, so the gate holds whenever a drain
    // fires. Plus the earliest live click's ts (ages out of the
    // buffer / into best); else the idle cutoff
    val timer = nextBuf.flatMap { _ =>
      val drains = keep.map { p =>
        val fwd = p.cand.map(_.tsUs).getOrElse(p.tsUs + tolUs)
        if (!nearest) fwd
        else {
          val back = backwardMatch(p)
            .filter(b => p.tsUs - b.tsUs <= tolUs)
            .map(b => p.tsUs + (p.tsUs - b.tsUs))
          (fwd +: back.toSeq).min
        }
      }
      val compact = liveC.map(_.tsUs)
      (drains ++ compact).minOption.orElse(idleCutoff)
    }
    (nextBuf, emits, timer)
  }

  /** Streaming twin of [[graft.ext.TemporalJoins.clickAsOfPurchase]]:
    * same output schema, same tie rules, rows emitted as their
    * purchases finalize under the watermark.
    *
    * `direction` mirrors the batch operator's
    * [[graft.plans.AsOfDirection]]: forward (earliest click at-or-
    * after, lowest eid on ties) and nearest (closer of prior/next,
    * distance ties to prior) REQUIRE `toleranceUs` — a forward-waiting
    * purchase with no bound could never finalize as a miss (the
    * matching click may always be one batch away), the streaming face
    * of the same unboundedness that stops [[graft.plans.AsOfPushdown]]
    * from deriving right time bounds for nearest without a tolerance. */
  def clickAsOfPurchaseStream(events: DataFrame, lateness: String = "2 hours",
      toleranceUs: Option[Long] = None, idleTtlUs: Option[Long] = None,
      direction: String = "backward")
      : DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val dir = graft.plans.AsOfDirection.parse(direction)
    require(dir == graft.plans.AsOfDirection.Backward || toleranceUs.isDefined,
      s"streaming as-of direction '${dir.name}' requires a tolerance " +
        "(an unbounded forward wait can never finalize a miss)")

    def fn(key: Long, rows: Iterator[AsOfEvent],
        state: GroupState[AsOfBuf]): Iterator[AsOfRow] = {
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val buf = state.getOption.getOrElse(AsOfBuf(None, Nil, Nil, Long.MinValue))
      val (next, emits, timer) =
        if (dir == graft.plans.AsOfDirection.Backward)
          step(buf, rows.toSeq, wmUs, toleranceUs, idleTtlUs)
        else stepDir(dir, buf, rows.toSeq, wmUs, toleranceUs.get, idleTtlUs)
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
