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

  // ---- cross-process CCAS (StatusStore) ------------------------------

  private def casUpdate(ev: String, g: String, expected: Option[String],
      next: String, errorAt: Option[String] = None) = {
    import spark.implicits._
    Seq((ev, g, expected.orNull, next, errorAt.orNull))
      .toDF("event_id", "guest_id", "expected_status", "new_status", "error_at")
  }

  test("casMerge applies only when the current status matches the expectation") {
    import graft.sink.StatusStore
    val dir = Files.createTempDirectory("graft-cas").toString + "/status"
    // absent key reads as 'pending' (attribute_not_exists semantics)
    val r1 = StatusStore.casMerge(casUpdate("e1", "g1", Some("pending"), "processing"), dir)
    assert(r1.applied == 1L && r1.rejected == 0L && r1.version == 1L)
    // same transition again: current is now 'processing' → condition fails
    val r2 = StatusStore.casMerge(casUpdate("e1", "g1", Some("pending"), "processing"), dir)
    assert(r2.applied == 0L && r2.rejected == 1L)
    // NULL expectation is unconditional (the duplicate→delivered marker)
    val r3 = StatusStore.casMerge(casUpdate("e1", "g1", None, "delivered"), dir)
    assert(r3.applied == 1L)
    val row = StatusStore.read(spark, dir).get.collect()
    assert(row.length == 1 && row.head.getAs[String]("delivery_status") == "delivered")
  }

  test("two concurrent writers race one key: exactly one CAS wins") {
    import graft.sink.StatusStore
    val dir = Files.createTempDirectory("graft-cas-race").toString + "/status"
    val results = new java.util.concurrent.ConcurrentLinkedQueue[StatusStore.CasResult]()
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val gate = new java.util.concurrent.CountDownLatch(1)
    val threads = (1 to 2).map { _ =>
      new Thread(() => {
        try {
          gate.await()
          results.add(StatusStore.casMerge(
            casUpdate("e1", "g1", Some("pending"), "processing"), dir))
        } catch { case t: Throwable => errors.add(t) }
      })
    }
    threads.foreach(_.start()); gate.countDown(); threads.foreach(_.join(120000))
    assert(errors.isEmpty, s"writer threw: ${errors.peek()}")
    val rs = results.toArray(Array.empty[StatusStore.CasResult])
    assert(rs.length == 2)
    // exactly one winner — the loser's retry re-read the winner's commit
    // and saw 'processing' ≠ 'pending', the lost conditional write
    assert(rs.map(_.applied).sum == 1L)
    assert(rs.map(_.rejected).sum == 1L)
    val st = StatusStore.read(spark, dir).get.collect()
    assert(st.length == 1 && st.head.getAs[String]("delivery_status") == "processing")
  }

  test("revert path: processing → pending + email_error_at, only while owned") {
    import graft.sink.StatusStore
    val dir = Files.createTempDirectory("graft-cas-revert").toString + "/status"
    import spark.implicits._
    val keys = Seq(("e1", "g1")).toDF("event_id", "guest_id")
    assert(StatusStore.casMerge(StatusStore.markProcessing(keys), dir).applied == 1L)
    // the send fails → compensate (index.js:509-522)
    val rv = StatusStore.casMerge(
      StatusStore.revertToPending(keys, "1970-01-01T00:00:00Z"), dir)
    assert(rv.applied == 1L)
    val row = StatusStore.read(spark, dir).get.collect().head
    assert(row.getAs[String]("delivery_status") == "pending")
    assert(row.getAs[String]("email_error_at") == "1970-01-01T00:00:00Z")
    // a second revert finds 'pending', not 'processing' → rejected
    assert(StatusStore.casMerge(
      StatusStore.revertToPending(keys, "x"), dir).applied == 0L)
    // and the key can be re-acquired (the retry after a revert converges)
    assert(StatusStore.casMerge(StatusStore.markProcessing(keys), dir).applied == 1L)
  }

  test("batch replay through the CAS store produces no duplicate email intent") {
    import graft.sink.StatusStore
    val base = Files.createTempDirectory("graft-cas-replay").toString
    val statusDir = s"$base/status"
    val jobsDir = s"$base/jobs"
    import spark.implicits._
    val triggered = Seq(("r1", "e1", "g1", "e1-a@b.co"))
      .toDF("record_id", "event_id", "guest_id", "dedup_id")

    def runBatch(): Long = {
      val cas = StatusStore.casMerge(
        StatusStore.markProcessing(triggered.select("event_id", "guest_id")), statusDir)
      val winners = triggered.join(cas.appliedKeys,
        Seq("event_id", "guest_id"), "left_semi")
      EmailJobSink.appendJobs(winners, jobsDir)
    }
    assert(runBatch() == 1L) // first delivery: job written
    // replay of the same batch by a recovered worker WITHOUT a txn log:
    // the CAS rejects (key already 'processing') → zero winners → no job
    assert(runBatch() == 0L)
    assert(spark.read.parquet(jobsDir).count() == 1L)
    val st = StatusStore.read(spark, statusDir).get.collect()
    assert(st.length == 1 && st.head.getAs[String]("delivery_status") == "processing")
  }

  test("streaming CAS sink: injected send failure reverts, restart converges") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val base = Files.createTempDirectory("graft-cas-stream").toString
    val fail = new java.util.concurrent.atomic.AtomicBoolean(true)
    val input =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val envelope = MatchFixture.envelope(input.toDF().toDF("c_custkey", "c_name"))
    val q1 = StreamPipeline.startWithCasSink(envelope, s"$base/ck",
      s"$base/jobs", s"$base/status", failSend = () => fail.get())
    input.addData((28L, "Customer#28"))
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
    }
    q1.stop()
    // the failed send compensated: status back to 'pending' with the
    // error timestamp, and NO email intent landed
    val reverted = graft.sink.StatusStore.read(spark, s"$base/status").get.collect()
    assert(reverted.length == 1)
    assert(reverted.head.getAs[String]("delivery_status") == "pending")
    assert(reverted.head.getAs[String]("email_error_at") != null)
    assert(!Files.exists(java.nio.file.Paths.get(s"$base/jobs"))
      || spark.read.parquet(s"$base/jobs").count() == 0L)

    // restart: offsets were never committed, the batch replays, the CAS
    // re-acquires the reverted key, the send succeeds exactly once
    fail.set(false)
    val q2 = StreamPipeline.startWithCasSink(envelope, s"$base/ck",
      s"$base/jobs", s"$base/status")
    try {
      q2.processAllAvailable()
      assert(spark.read.parquet(s"$base/jobs").count() == 1L)
      val st = graft.sink.StatusStore.read(spark, s"$base/status").get.collect()
      assert(st.length == 1 && st.head.getAs[String]("delivery_status") == "processing")
    } finally q2.stop()
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
