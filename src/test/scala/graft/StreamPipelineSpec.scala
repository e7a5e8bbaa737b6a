package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.pipeline.MatchFixture
import graft.streaming.StreamPipeline

/** Micro-batch-driven tests of the keyed state machine: in-batch dedup,
  * cross-batch dedup (state persistence), and pass-through of stateless
  * skips. */
class StreamPipelineSpec extends SparkSpec {

  private def envelopeFor(ks: Seq[Long]) = {
    import spark.implicits._
    MatchFixture.envelope(
      ks.map(k => (k, s"Customer#$k")).toDF("c_custkey", "c_name"))
  }

  test("state machine dedups within and across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // feed raw customer keys; build the envelope on the stream
    val input = MemoryStream[(Long, String)]
    val envelope = MatchFixture.envelope(
      input.toDF().toDF("c_custkey", "c_name"))
    val checkpoint = Files.createTempDirectory("graft-ck").toString
    val q = StreamPipeline.start(envelope, "outcomes_test", checkpoint)
    try {
      // batch 0: k=28 triggers; k=578 same (event, email) → in-batch dup
      input.addData((28L, "Customer#28"), (578L, "Customer#578"))
      q.processAllAvailable()
      // batch 1: k=1128 ≡ 28 (mod 550), same key again → cross-batch dup
      input.addData((1128L, "Customer#1128"))
      q.processAllAvailable()

      val out = spark.table("outcomes_test")
        .select("recordId", "action").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(out("r28") == "email_triggered")
      assert(out("r578") == "duplicate_prevented")
      assert(out("r1128") == "duplicate_prevented")
    } finally q.stop()
  }

  test("stateless skips flow through unchanged (REMOVE, no image, error)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val envelope = MatchFixture.envelope(
      input.toDF().toDF("c_custkey", "c_name"))
    val checkpoint = Files.createTempDirectory("graft-ck").toString
    val q = StreamPipeline.start(envelope, "outcomes_test2", checkpoint)
    try {
      input.addData((19L, "Customer#19"), (20L, "Customer#20"),
        (17L, "Customer#17"))
      q.processAllAvailable()
      val out = spark.table("outcomes_test2")
        .select("recordId", "action").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(out("r19") == "skipped")
      assert(out("r20") == "skipped")
      assert(out("r17") == "error")
    } finally q.stop()
  }

  test("batch mode gives the same outcomes as the batch pipeline") {
    val env = envelopeFor(Seq(18L, 568L, 17L, 19L))
    val streamed = StreamPipeline.outcomes(env)
      .select(col("recordId"), col("action")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(streamed("r18") == "email_triggered")
    assert(streamed("r568") == "duplicate_prevented")
    assert(streamed("r17") == "error")
    assert(streamed("r19") == "skipped")
  }
}
