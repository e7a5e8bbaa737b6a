package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.ext.{Scored, TopK}
import graft.streaming.EventStream

/** Watermarked streaming windows and the typed top-K Aggregator. */
class StreamingWindowSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("tumbling windows emit once the watermark passes their end") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String, Double)]
    val events = input.toDF().toDF("ts", "user_id", "event_type", "value")
    val q = EventStream.tumblingCounts(events).writeStream
      .outputMode(OutputMode.Append).format("memory").queryName("tumbling_test")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ck").toString)
      .start()
    try {
      input.addData(
        (ts("2024-01-01 10:05:00"), 1L, "click", 1.0),
        (ts("2024-01-01 10:45:00"), 2L, "click", 2.0))
      q.processAllAvailable()
      // nothing emitted yet: watermark is far behind the window end
      assert(spark.table("tumbling_test").count() == 0)
      // jump event time 4 hours ahead → watermark (max ts - 2h) passes
      // the 10:00 window end after the next batch
      input.addData((ts("2024-01-01 14:30:00"), 3L, "view", 3.0))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 14:35:00"), 3L, "view", 3.0))
      q.processAllAvailable()
      val rows = spark.table("tumbling_test")
        .selectExpr("cast(window_start as string)", "event_type", "n_events")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      assert(rows.contains(("2024-01-01 10:00:00", "click", 2L)))
    } finally q.stop()
  }

  test("late events beyond the watermark are dropped") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String, Double)]
    val events = input.toDF().toDF("ts", "user_id", "event_type", "value")
    val q = EventStream.tumblingCounts(events).writeStream
      .outputMode(OutputMode.Append).format("memory").queryName("late_test")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ck").toString)
      .start()
    try {
      input.addData((ts("2024-01-01 10:05:00"), 1L, "click", 1.0))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 20:00:00"), 2L, "view", 1.0))
      q.processAllAvailable()
      // 10:xx arrives hours past the watermark → dropped, not re-emitted
      input.addData((ts("2024-01-01 10:50:00"), 9L, "click", 9.0))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 23:00:00"), 2L, "view", 1.0))
      q.processAllAvailable()
      val clicks = spark.table("late_test")
        .filter("event_type = 'click'").selectExpr("n_events")
        .collect().map(_.getLong(0)).toSeq
      assert(clicks == Seq(1L)) // the late click never counted
    } finally q.stop()
  }

  test("stream-stream interval join emits in-band pairs and evicts state") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val purchases = MemoryStream[(Timestamp, Long, Long)]
    val clicks = MemoryStream[(Timestamp, Long, Long)]
    val pdf = purchases.toDF().toDF("ts", "user_id", "event_id")
    val cdf = clicks.toDF().toDF("ts", "user_id", "event_id")
    val q = EventStream.purchaseClickJoin(pdf, cdf).writeStream
      .outputMode(OutputMode.Append).format("memory").queryName("ss_join_test")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ck").toString)
      .start()
    try {
      purchases.addData((ts("2024-01-01 10:00:00"), 7L, 100L))
      clicks.addData(
        (ts("2024-01-01 10:30:00"), 7L, 200L),  // in band
        (ts("2024-01-01 12:00:00"), 7L, 201L),  // past band
        (ts("2024-01-01 10:15:00"), 8L, 202L))  // other user
      q.processAllAvailable()
      // advance both watermarks so the joined window closes and emits
      purchases.addData((ts("2024-01-01 15:00:00"), 9L, 101L))
      clicks.addData((ts("2024-01-01 15:00:00"), 9L, 203L))
      q.processAllAvailable()
      purchases.addData((ts("2024-01-01 18:00:00"), 9L, 102L))
      clicks.addData((ts("2024-01-01 18:00:00"), 9L, 204L))
      q.processAllAvailable()
      val pairs = spark.table("ss_join_test")
        .select("purchase_event_id", "click_event_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((100L, 200L)))
      assert(!pairs.exists(_._2 == 201L)) // out of band never joins
      assert(!pairs.exists(_._2 == 202L)) // wrong user never joins
    } finally q.stop()
  }

  test("streaming funnel matches the batch funnel once every user closes") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String, Double)]
    val events = input.toDF().toDF("ts", "user_id", "event_type", "value")
    val q = EventStream.funnelDepths(events).writeStream
      .outputMode(OutputMode.Append).format("memory").queryName("funnel_test")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ck").toString)
      .start()
    // depth-3 (u1), depth-1 (u2: click before any view can't advance a
    // funnel that starts at view), depth-2 via OUT-OF-ORDER arrival
    // (u3's view arrives after its click in the stream but precedes it
    // in event time), non-entrant (u4: never views)
    val data = Seq(
      (ts("2024-01-01 10:00:00"), 1L, "view", 1.0),
      (ts("2024-01-01 10:05:00"), 1L, "click", 1.0),
      (ts("2024-01-01 10:10:00"), 1L, "purchase", 1.0),
      (ts("2024-01-01 10:00:00"), 2L, "view", 1.0),
      (ts("2024-01-01 09:55:00"), 2L, "click", 1.0),
      (ts("2024-01-01 10:06:00"), 3L, "click", 1.0),
      (ts("2024-01-01 10:02:00"), 3L, "view", 1.0),
      (ts("2024-01-01 10:00:00"), 4L, "purchase", 1.0))
    try {
      input.addData(data.take(6): _*)
      q.processAllAvailable()
      input.addData(data.drop(6): _*)
      q.processAllAvailable()
      assert(spark.table("funnel_test").count() == 0) // nobody closed yet
      // two far-future batches: first advances the watermark past every
      // user's quiet period, the next fires the event-time timeouts.
      // The sentinel must be a STAGE event: Catalyst pushes the stage
      // filter below the watermark node, so a non-stage event would
      // never advance the watermark. Its user (9) stays OPEN — its own
      // quiet period never passes — so it appears in neither report.
      input.addData((ts("2024-01-02 10:00:00"), 9L, "view", 0.0))
      q.processAllAvailable()
      input.addData((ts("2024-01-02 11:00:00"), 9L, "view", 0.0))
      q.processAllAvailable()
      val streamed = EventStream.funnelCounts(spark.table("funnel_test"))
        .collect().map(r => r.getAs[Int]("funnel_stage") -> r.getAs[Long]("n_users"))
        .toMap
      // batch comparison over the CLOSED users (sentinel user 9 is still
      // inside its quiet period — the streaming report covers closed
      // users by design)
      val batch = graft.ext.EventOps.funnel(data.toDF("ts", "user_id", "event_type", "value"))
        .collect().map(r => r.getAs[Int]("funnel_stage") -> r.getAs[Long]("n_users"))
        .toMap
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
      assert(streamed == Map(3 -> 1L, 2 -> 1L, 1 -> 1L))
    } finally q.stop()
  }

  test("a user whose events straddle the quiet window splits into per-window observations") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String, Double)]
    val events = input.toDF().toDF("ts", "user_id", "event_type", "value")
    val q = EventStream.funnelDepths(events).writeStream
      .outputMode(OutputMode.Append).format("memory").queryName("funnel_split_test")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ck").toString)
      .start()
    try {
      // view at 10:00; the watermark then passes the 12:00 deadline
      // (sentinels at 14:05/14:10 → watermark 12:05) and closes the
      // first observation at depth 1. The user's later view+click at
      // 13:01/13:05 arrive AFTER the close and open a second window,
      // observed at depth 2. The infinite-window batch form would
      // report ONE depth-2 user — the documented divergence when the
      // watermark observes a gap longer than the conversion window.
      // (If the second burst arrives before the watermark passes the
      // deadline, the buffers merge and stream ≡ batch — which is what
      // the previous test exercises.)
      input.addData((ts("2024-01-01 10:00:00"), 1L, "view", 1.0))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 14:05:00"), 9L, "view", 0.0))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 14:10:00"), 9L, "view", 0.0))
      q.processAllAvailable()
      // first observation closed at depth 1; now the second burst
      // (13:01 > watermark 12:10, so not late)
      input.addData(
        (ts("2024-01-01 13:01:00"), 1L, "view", 1.0),
        (ts("2024-01-01 13:05:00"), 1L, "click", 1.0))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 18:00:00"), 9L, "view", 0.0))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 19:00:00"), 9L, "view", 0.0))
      q.processAllAvailable()
      val rows = spark.table("funnel_split_test")
        .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("funnel_stage")))
        .toSeq.sorted
      assert(rows == Seq((1L, 1), (1L, 2)), s"got $rows")
    } finally q.stop()
  }

  test("transformWithState funnel matches the fMGWS funnel and the batch form") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // transformWithState requires the RocksDB state store provider
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[(Timestamp, Long, String, Double)]
    val events = input.toDF().toDF("ts", "user_id", "event_type", "value")
    val q = EventStream.funnelDepthsTws(events).writeStream
      .outputMode(OutputMode.Append).format("memory").queryName("funnel_tws_test")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ck").toString)
      .start()
    val data = Seq(
      (ts("2024-01-01 10:00:00"), 1L, "view", 1.0),
      (ts("2024-01-01 10:05:00"), 1L, "click", 1.0),
      (ts("2024-01-01 10:10:00"), 1L, "purchase", 1.0),
      (ts("2024-01-01 10:00:00"), 2L, "view", 1.0),
      (ts("2024-01-01 09:55:00"), 2L, "click", 1.0),
      (ts("2024-01-01 10:06:00"), 3L, "click", 1.0),
      (ts("2024-01-01 10:02:00"), 3L, "view", 1.0),
      (ts("2024-01-01 10:00:00"), 4L, "purchase", 1.0))
    try {
      input.addData(data.take(6): _*)
      q.processAllAvailable()
      input.addData(data.drop(6): _*)
      q.processAllAvailable()
      input.addData((ts("2024-01-02 10:00:00"), 9L, "view", 0.0))
      q.processAllAvailable()
      input.addData((ts("2024-01-02 11:00:00"), 9L, "view", 0.0))
      q.processAllAvailable()
      val streamed = EventStream.funnelCounts(spark.table("funnel_tws_test"))
        .collect().map(r => r.getAs[Int]("funnel_stage") -> r.getAs[Long]("n_users"))
        .toMap
      val batch = graft.ext.EventOps.funnel(data.toDF("ts", "user_id", "event_type", "value"))
        .collect().map(r => r.getAs[Int]("funnel_stage") -> r.getAs[Long]("n_users"))
        .toMap
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
      assert(streamed == Map(3 -> 1L, 2 -> 1L, 1 -> 1L))
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming weekly activity feeds the batch retention tail exactly") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String, Double)]
    val events = input.toDF().toDF("ts", "user_id", "event_type", "value")
    val q = EventStream.weeklyActivity(events).writeStream
      .outputMode(OutputMode.Append).format("memory").queryName("weekly_test")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ck").toString)
      .start()
    // u1 active weeks 0,1,2 (with an intra-week duplicate); u2 active
    // week 0 only; u3 joins in week 1 and returns in week 2. Batches
    // arrive in CHRONOLOGICAL order — the 8-day watermark horizon
    // covers one week of event time, so feeding a week-2 event before
    // week-0 ones would (correctly) drop the latter as late.
    val data = Seq(
      (ts("2024-01-01 10:00:00"), 1L, "view", 1.0),
      (ts("2024-01-02 11:00:00"), 1L, "view", 1.0), // same week dup
      (ts("2024-01-01 12:00:00"), 2L, "view", 1.0),
      (ts("2024-01-08 10:00:00"), 1L, "view", 1.0),
      (ts("2024-01-08 12:00:00"), 3L, "view", 1.0),
      (ts("2024-01-15 10:00:00"), 1L, "view", 1.0),
      (ts("2024-01-16 12:00:00"), 3L, "view", 1.0))
    try {
      input.addData(data.take(3): _*)
      q.processAllAvailable()
      input.addData(data.slice(3, 5): _*)
      q.processAllAvailable()
      input.addData(data.drop(5): _*)
      q.processAllAvailable()
      // snapshot the memory sink before the tail's self-join: a real
      // deployment reads the sink back from storage (fresh attribute
      // ids); the in-memory View keeps one set and trips Spark's
      // conflicting-reference check when joined with itself
      val weekly = spark.table("weekly_test").localCheckpoint(true)
      val streamed = graft.ext.EventOps.retentionFromWeekly(weekly)
        .collect().map(r => (r.getAs[Long]("cohort_week"), r.getAs[Long]("week_offset"),
          r.getAs[Long]("n_active"), r.getAs[Long]("cohort_size"),
          r.getAs[Double]("retention"))).toSet
      val batch = graft.ext.EventOps.retentionCohorts(
        data.toDF("ts", "user_id", "event_type", "value"))
        .collect().map(r => (r.getAs[Long]("cohort_week"), r.getAs[Long]("week_offset"),
          r.getAs[Long]("n_active"), r.getAs[Long]("cohort_size"),
          r.getAs[Double]("retention"))).toSet
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming as-of join matches the batch as-of frame once purchases finalize") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String, Long)]
    val events = input.toDF().toDF("ts", "user_id", "event_type", "event_id")
    val q = graft.streaming.AsOfStream.clickAsOfPurchaseStream(events)
      .writeStream
      .outputMode(OutputMode.Append).format("memory").queryName("asof_stream_test")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ck").toString)
      .start()
    // u1: at-ts tie (click 5/6 at exactly the purchase ts — max eid 6
    // wins, and the at-ts click IS visible); u2: purchase with no prior
    // click (nulls), later purchase sees the in-between click; u3:
    // OUT-OF-ORDER — its purchase arrives a batch before its earlier
    // click, which must still attribute (the watermark hasn't passed)
    val data = Seq(
      (ts("2024-01-01 10:00:00"), 1L, "click", 1L),
      (ts("2024-01-01 10:00:10"), 1L, "click", 5L),
      (ts("2024-01-01 10:00:10"), 1L, "click", 6L),
      (ts("2024-01-01 10:00:10"), 1L, "purchase", 100L),
      (ts("2024-01-01 10:05:00"), 1L, "purchase", 101L),
      (ts("2024-01-01 10:02:00"), 2L, "purchase", 200L),
      (ts("2024-01-01 10:30:00"), 2L, "click", 7L),
      (ts("2024-01-01 10:31:00"), 2L, "purchase", 201L),
      (ts("2024-01-01 10:20:00"), 3L, "purchase", 300L))
    val late = (ts("2024-01-01 10:10:00"), 3L, "click", 8L)
    try {
      input.addData(data: _*)
      q.processAllAvailable()
      // u3's earlier click arrives in a LATER batch but inside the
      // watermark horizon — the as-of result must still see it
      input.addData(late)
      q.processAllAvailable()
      assert(spark.table("asof_stream_test").count() == 0) // nothing final yet
      // sentinel clicks push the watermark past every purchase; the
      // second batch fires the event-time drain timers
      input.addData((ts("2024-01-01 20:00:00"), 999L, "click", 900L))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 21:00:00"), 999L, "click", 901L))
      q.processAllAvailable()
      val cols = Seq("user_id", "purchase_event_id", "purchase_ts",
        "click_event_id", "click_ts", "gap_us")
      def toSet(df: org.apache.spark.sql.DataFrame) =
        df.select(cols.head, cols.tail: _*).collect()
          .map(r => cols.indices.map(i =>
            if (r.isNullAt(i)) null else r.get(i).toString)).toSet
      val streamed = toSet(spark.table("asof_stream_test"))
      val batch = toSet(graft.ext.TemporalJoins.clickAsOfPurchase(
        (data :+ late).toDF("ts", "user_id", "event_type", "event_id")))
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
      assert(streamed.size == 5)
      // the at-ts equal-timestamp tie resolved to max event_id (6)
      assert(spark.table("asof_stream_test")
        .filter("purchase_event_id = 100").head().getAs[Long]("click_event_id") == 6L)
    } finally q.stop()
  }

  test("as-of step: clicks behind the watermark compact losslessly to one entry") {
    import graft.streaming.{AsOfBuf, AsOfEvent, AsOfStream, ClickRef, PurchaseRef}
    def click(us: Long, eid: Long) = AsOfEvent(1L, 0, us, eid, null)
    def purchase(us: Long, eid: Long) = AsOfEvent(1L, 1, us, eid, null)
    val empty = AsOfBuf(None, Nil, Nil, Long.MinValue)
    // five clicks, watermark passes the first four → state holds ONE
    // compacted best (max ts, then max eid) + the single live click
    val (s1, e1, _) = AsOfStream.step(empty,
      Seq(click(100L, 1), click(200L, 2), click(200L, 9), click(150L, 3),
        click(900L, 4)),
      wmUs = 500L, toleranceUs = None, idleTtlUs = None)
    assert(e1.isEmpty)
    assert(s1.get.best.contains(ClickRef(200L, 9))) // ts tie → max eid
    assert(s1.get.clicks == List(ClickRef(900L, 4)))
    // losslessness: a purchase finalizing after compaction attributes
    // exactly as the uncompacted history would (200/9 at ts 600, the
    // live 900-click invisible at-or-before 600)
    val (s2, e2, _) = AsOfStream.step(s1.get, Seq(purchase(600L, 50)),
      wmUs = 1000L, toleranceUs = None, idleTtlUs = None)
    assert(e2.map(r => (r.purchase_event_id, r.click_event_id, r.click_ts_us)) ==
      Seq((50L, Some(9L), Some(200L))))
    // ...and a purchase at-or-after the live click sees it
    val (_, e3, _) = AsOfStream.step(s2.get, Seq(purchase(950L, 51)),
      wmUs = 2000L, toleranceUs = None, idleTtlUs = None)
    assert(e3.map(r => (r.purchase_event_id, r.click_event_id)) ==
      Seq((51L, Some(4L))))
    // pending purchases ahead of the watermark stay buffered with a
    // drain timer at the earliest one
    val (s4, e4, t4) = AsOfStream.step(empty,
      Seq(purchase(800L, 60), purchase(400L, 61)), wmUs = 100L,
      toleranceUs = None, idleTtlUs = None)
    assert(e4.isEmpty && s4.get.pending.map(_.eid).toSet == Set(60L, 61L))
    assert(t4.contains(400L))
  }

  test("as-of stepDir: forward finalizes candidates under the watermark, misses at the horizon") {
    import graft.streaming.{AsOfBuf, AsOfEvent, AsOfStream, ClickRef}
    import graft.plans.AsOfDirection.{Forward, Nearest}
    def click(us: Long, eid: Long) = AsOfEvent(1L, 0, us, eid, null)
    def purchase(us: Long, eid: Long) = AsOfEvent(1L, 1, us, eid, null)
    val empty = AsOfBuf(None, Nil, Nil, Long.MinValue)
    // purchase at 500; clicks at 400 (before: ineligible), 700 and 700
    // with two eids (tie → LOWEST), 600 arriving later (earlier ts must
    // replace the 700 candidate while it is not yet final)
    val (s1, e1, t1) = AsOfStream.stepDir(Forward, empty,
      Seq(purchase(500L, 50), click(400L, 1), click(700L, 9), click(700L, 2)),
      wmUs = 450L, tolUs = 1000L, idleTtlUs = None)
    assert(e1.isEmpty) // candidate 700 not final: wm hasn't passed it
    assert(s1.get.pending.head.cand.contains(ClickRef(700L, 2))) // low eid
    // the 400 click is already behind wm=450 → dropped now (forward
    // keeps no `best`); the timer waits on the candidate's own ts
    assert(s1.get.clicks.map(_.tsUs).toSet == Set(700L))
    assert(t1.contains(700L))
    val (s2, e2, _) = AsOfStream.stepDir(Forward, s1.get,
      Seq(click(600L, 3)), wmUs = 650L, tolUs = 1000L, idleTtlUs = None)
    assert(e2.map(r => (r.purchase_event_id, r.click_event_id, r.click_ts_us)) ==
      Seq((50L, Some(3L), Some(600L)))) // 600 replaced 700, wm > 600 → final
    assert(s2.isEmpty || s2.get.pending.isEmpty)
    // a candidateless purchase emits a MISS once wm passes ts + tol
    val (_, e3, _) = AsOfStream.stepDir(Forward, empty,
      Seq(purchase(100L, 60)), wmUs = 1200L, tolUs = 1000L, idleTtlUs = None)
    assert(e3.map(r => (r.purchase_event_id, r.click_event_id)) ==
      Seq((60L, None)))
    // a click beyond the tolerance never becomes a candidate
    val (_, e4, _) = AsOfStream.stepDir(Forward, empty,
      Seq(purchase(100L, 61), click(1200L, 5)), wmUs = 1500L,
      tolUs = 1000L, idleTtlUs = None)
    assert(e4.map(r => (r.purchase_event_id, r.click_event_id)) ==
      Seq((61L, None)))
    // NEAREST: distance tie resolves backward, and an eligible backward
    // match at distance d decides WITHOUT waiting out the tolerance
    // horizon once wm >= p + d (any later click loses)
    val (_, e5, _) = AsOfStream.stepDir(Nearest, empty,
      Seq(click(400L, 7), purchase(500L, 70), click(600L, 8)),
      wmUs = 650L, tolUs = 100000L, idleTtlUs = None)
    // backward dist 100 vs forward dist 100 → tie → backward (eid 7)
    assert(e5.map(r => (r.purchase_event_id, r.click_event_id)) ==
      Seq((70L, Some(7L))))
    val (s6, e6, _) = AsOfStream.stepDir(Nearest, empty,
      Seq(click(450L, 9), purchase(500L, 71)),
      wmUs = 560L, tolUs = 100000L, idleTtlUs = None)
    // wm 560 >= p + d = 550: decided with the backward match — no
    // waiting for the 100000-us horizon
    assert(e6.map(r => (r.purchase_event_id, r.click_event_id)) ==
      Seq((71L, Some(9L))))
    assert(s6.forall(_.pending.isEmpty))
    // forward candidate closer than the backward match wins
    val (_, e7, _) = AsOfStream.stepDir(Nearest, empty,
      Seq(click(100L, 10), purchase(500L, 72), click(520L, 11)),
      wmUs = 600L, tolUs = 100000L, idleTtlUs = None)
    assert(e7.map(r => (r.purchase_event_id, r.click_event_id)) ==
      Seq((72L, Some(11L))))
    // NEAREST timer: a purchase with an eligible backward match but no
    // forward candidate drains at the early-decide instant p + d (here
    // 500 + 60 = 560), NOT the 100000-us tolerance horizon — a large
    // tolerance must not delay an already-decided emission
    val (s8, e8, t8) = AsOfStream.stepDir(Nearest, empty,
      Seq(click(440L, 12), purchase(500L, 73)),
      wmUs = 510L, tolUs = 100000L, idleTtlUs = None)
    assert(e8.isEmpty && s8.get.pending.map(_.eid) == Seq(73L))
    assert(t8.contains(560L), t8)
    // ...and once the watermark passes it, the backward match emits
    val (_, e9, _) = AsOfStream.stepDir(Nearest, s8.get, Nil,
      wmUs = 561L, tolUs = 100000L, idleTtlUs = None)
    assert(e9.map(r => (r.purchase_event_id, r.click_event_id)) ==
      Seq((73L, Some(12L))))
  }

  test("streaming as-of forward/nearest match the batch native directions") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // the same fixture as the backward stream≡batch pin (ties,
    // no-prior-click, out-of-order late click), driven through both
    // non-default directions with a 2h tolerance
    val data = Seq(
      (ts("2024-01-01 10:00:00"), 1L, "click", 1L),
      (ts("2024-01-01 10:00:10"), 1L, "click", 5L),
      (ts("2024-01-01 10:00:10"), 1L, "click", 6L),
      (ts("2024-01-01 10:00:10"), 1L, "purchase", 100L),
      (ts("2024-01-01 10:05:00"), 1L, "purchase", 101L),
      (ts("2024-01-01 10:02:00"), 2L, "purchase", 200L),
      (ts("2024-01-01 10:30:00"), 2L, "click", 7L),
      (ts("2024-01-01 10:31:00"), 2L, "purchase", 201L),
      (ts("2024-01-01 10:20:00"), 3L, "purchase", 300L),
      (ts("2024-01-01 10:10:00"), 3L, "click", 8L))
    val tol = 7200000000L // 2h in micros
    val cols = Seq("user_id", "purchase_event_id", "purchase_ts",
      "click_event_id", "click_ts", "gap_us")
    def toSet(df: org.apache.spark.sql.DataFrame) =
      df.select(cols.head, cols.tail: _*).collect()
        .map(r => cols.indices.map(i =>
          if (r.isNullAt(i)) null else r.get(i).toString)).toSet
    for (dir <- Seq("forward", "nearest")) {
      val input = MemoryStream[(Timestamp, Long, String, Long)]
      val events = input.toDF().toDF("ts", "user_id", "event_type", "event_id")
      val q = graft.streaming.AsOfStream.clickAsOfPurchaseStream(
        events, toleranceUs = Some(tol), direction = dir)
        .writeStream
        .outputMode(OutputMode.Append).format("memory")
        .queryName(s"asof_stream_$dir")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-ck").toString)
        .start()
      try {
        data.grouped(4).foreach { chunk =>
          input.addData(chunk: _*); q.processAllAvailable()
        }
        // sentinels: watermark past every purchase's horizon, then the
        // timer-drain batch
        input.addData((ts("2024-01-02 20:00:00"), 999L, "click", 900L))
        q.processAllAvailable()
        input.addData((ts("2024-01-02 21:00:00"), 999L, "click", 901L))
        q.processAllAvailable()
        val streamed = toSet(spark.table(s"asof_stream_$dir"))
        val batch = toSet(graft.ext.TemporalJoins.clickAsOfPurchaseNative(
          data.toDF("ts", "user_id", "event_type", "event_id"),
          Some(tol), broadcastRight = false, dir))
        assert(streamed == batch, s"dir=$dir\n streamed=$streamed\n batch=$batch")
        assert(streamed.size == 5)
      } finally q.stop()
    }
  }

  test("as-of step: tolerance rejects stale matches; idle TTL drops the key") {
    import graft.streaming.{AsOfBuf, AsOfEvent, AsOfStream, ClickRef}
    def purchase(us: Long, eid: Long) = AsOfEvent(1L, 1, us, eid, null)
    val withBest = AsOfBuf(Some(ClickRef(100L, 1)), Nil, Nil, 100L)
    // gap 900us > tolerance 500us → no attribution; inside → attributes
    val (_, stale, _) = AsOfStream.step(withBest, Seq(purchase(1000L, 70)),
      wmUs = 2000L, toleranceUs = Some(500L), idleTtlUs = None)
    assert(stale.map(r => (r.purchase_event_id, r.click_event_id)) ==
      Seq((70L, None)))
    val (_, fresh, _) = AsOfStream.step(withBest, Seq(purchase(550L, 71)),
      wmUs = 2000L, toleranceUs = Some(500L), idleTtlUs = None)
    assert(fresh.map(_.click_event_id) == Seq(Some(1L)))
    // without a TTL the one-row best persists (Flink temporal-join
    // default); with a TTL the key drops once the watermark passes
    // lastSeen + ttl — the idle-retention trade-off, made explicit
    val (keep, _, _) = AsOfStream.step(withBest, Nil, wmUs = 1_000_000L,
      toleranceUs = None, idleTtlUs = None)
    assert(keep.contains(withBest))
    val (dropped, _, _) = AsOfStream.step(withBest, Nil, wmUs = 1_000_000L,
      toleranceUs = None, idleTtlUs = Some(1000L))
    assert(dropped.isEmpty)
    // ...but a key still inside its TTL survives, with the TTL timer armed
    val (alive, _, timer) = AsOfStream.step(withBest, Nil, wmUs = 500L,
      toleranceUs = None, idleTtlUs = Some(1000L))
    assert(alive.nonEmpty && timer.contains(1100L))
  }

  test("nearest early-decide: emission once wm passes p.ts + d, far below the tolerance horizon") {
    // end-to-end twin of the step-level t8 pin: a purchase with a
    // backward match at distance d (60 s) but NO forward candidate
    // must drain through the REAL query's timer once the watermark
    // passes p.ts + d — with a 2 h tolerance, an implementation that
    // waited out the horizon would emit nothing here, because the
    // sentinels only push the watermark ~90 s past the purchase
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String, Long)]
    val events = input.toDF().toDF("ts", "user_id", "event_type", "event_id")
    val q = graft.streaming.AsOfStream.clickAsOfPurchaseStream(
      events, lateness = "1 minute",
      toleranceUs = Some(7200000000L), direction = "nearest")
      .writeStream
      .outputMode(OutputMode.Append).format("memory")
      .queryName("asof_nearest_early")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ck").toString)
      .start()
    try {
      input.addData(
        (ts("2024-01-01 10:00:00"), 1L, "click", 1L),
        (ts("2024-01-01 10:01:00"), 1L, "purchase", 100L))
      q.processAllAvailable()
      assert(spark.table("asof_nearest_early").count() == 0)
      // early-decide instant = 10:01:00 + 60 s = 10:02:00; sentinels
      // lift the watermark to 10:02:30/31 (max ts − 1 min) — past the
      // instant, 2 h short of the 12:01:00 horizon
      input.addData((ts("2024-01-01 10:03:30"), 999L, "click", 900L))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 10:03:31"), 999L, "click", 901L))
      q.processAllAvailable()
      val rows = spark.table("asof_nearest_early")
        .select("purchase_event_id", "click_event_id", "gap_us").collect()
        .map(r => (r.getLong(0), Option(r.get(1)).map(_.toString.toLong),
          Option(r.get(2)).map(_.toString.toLong)))
      assert(rows.toSeq == Seq((100L, Some(1L), Some(60000000L))), rows.toSeq)
    } finally q.stop()
  }

  test("typed top-K aggregator keeps K best with deterministic ties") {
    import spark.implicits._
    val ds = Seq(
      Scored("g1", "a", 0.9), Scored("g1", "b", 0.8), Scored("g1", "c", 0.95),
      Scored("g1", "d", 0.8), Scored("g2", "x", 0.1)).toDS()
    val out = TopK.topKPerKey(ds, 3).collect().toMap
    assert(out("g1") == Seq("c", "a", "b")) // 0.8 tie: "b" beats "d"
    assert(out("g2") == Seq("x"))
  }
}
