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
