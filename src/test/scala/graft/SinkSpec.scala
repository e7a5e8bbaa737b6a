package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.pipeline.{MatchFixture, MatchPipeline}
import graft.sink.EmailJobSink
import graft.streaming.StreamPipeline

/** Idempotent sink behavior: replay cannot double-send; status merge is
  * last-write-wins. */
class SinkSpec extends SparkSpec {

  private def decidedFor(ks: Long*) = {
    import spark.implicits._
    MatchPipeline.decide(MatchFixture.envelope(
      ks.map(k => (k, s"Customer#$k")).toDF("c_custkey", "c_name")))
  }

  test("appendJobs is idempotent under batch replay") {
    val dir = Files.createTempDirectory("graft-jobs").toString + "/jobs"
    val jobs = MatchPipeline.emailJobs(decidedFor(18L, 32L))
    assert(EmailJobSink.appendJobs(jobs, dir) == 2L)
    // replay the same batch: nothing new lands
    assert(EmailJobSink.appendJobs(jobs, dir) == 0L)
    assert(spark.read.parquet(dir).count() == 2L)
    // a later batch with one overlapping dedup key writes only the new row
    val jobs2 = MatchPipeline.emailJobs(decidedFor(32L, 42L))
    assert(EmailJobSink.appendJobs(jobs2, dir) == 1L)
    assert(spark.read.parquet(dir).select("dedup_id").distinct().count() == 3L)
  }

  test("mergeStatus is last-write-wins by (event_id, guest_id)") {
    val dir = Files.createTempDirectory("graft-status").toString + "/status"
    EmailJobSink.mergeStatus(
      MatchPipeline.statusUpdates(decidedFor(18L)), dir)
    val first = spark.read.parquet(dir).collect()
    assert(first.length == 1 &&
      first.head.getAs[String]("delivery_status") == "processing")
    // same key reappears as a duplicate in a later batch → delivered wins
    import spark.implicits._
    val manual = Seq(("ev18", "g18", "delivered"))
      .toDF("event_id", "guest_id", "new_delivery_status")
    EmailJobSink.mergeStatus(manual, dir)
    val after = spark.read.parquet(dir).collect()
    assert(after.length == 1 &&
      after.head.getAs[String]("delivery_status") == "delivered")
  }

  test("txn log runs a batch once and skips its replay") {
    val log = Files.createTempDirectory("graft-txn").toString
    var runs = 0
    assert(graft.sink.EmailJobSink.TxnLog.runOnce(log, 7L) { runs += 1 })
    assert(!graft.sink.EmailJobSink.TxnLog.runOnce(log, 7L) { runs += 1 })
    assert(graft.sink.EmailJobSink.TxnLog.runOnce(log, 8L) { runs += 1 })
    assert(runs == 2)
    // a write that THROWS must not commit - the retry executes it
    intercept[RuntimeException] {
      graft.sink.EmailJobSink.TxnLog.runOnce(log, 9L) {
        throw new RuntimeException("sink down")
      }
    }
    assert(graft.sink.EmailJobSink.TxnLog.runOnce(log, 9L) { runs += 1 })
    assert(runs == 3)
  }

  test("streaming foreachBatch sink: triggered jobs land once, status merges") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val base = Files.createTempDirectory("graft-stream-sink").toString
    val input =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val envelope = MatchFixture.envelope(
      input.toDF().toDF("c_custkey", "c_name"))
    val q = StreamPipeline.startWithSink(envelope, s"$base/ck",
      s"$base/jobs", s"$base/status")
    try {
      input.addData((28L, "Customer#28"), (578L, "Customer#578"))
      q.processAllAvailable()
      // same email key again in a later batch: no new job, status stays
      input.addData((1128L, "Customer#1128"))
      q.processAllAvailable()
      val jobs = spark.read.parquet(s"$base/jobs")
      assert(jobs.count() == 1L)
      assert(jobs.head.getAs[String]("dedup_id").startsWith("ev28-"))
      val status = spark.read.parquet(s"$base/status").collect()
      // g28 processing (triggered); g578 & g1128 delivered (duplicates)
      val byGuest = status.map(r => r.getAs[String]("guest_id") ->
        r.getAs[String]("delivery_status")).toMap
      assert(byGuest("g28") == "processing")
      assert(byGuest("g578") == "delivered")
      assert(byGuest("g1128") == "delivered")
    } finally q.stop()
  }
}
