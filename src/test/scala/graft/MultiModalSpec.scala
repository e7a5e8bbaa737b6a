package graft

import org.apache.spark.sql.functions._

import graft.ext.MultiModal
import graft.metrics.Observability
import graft.pipeline.{EmailJobs, MatchFixture, MatchPipeline}

/** Multimodal plumbing, observe() metrics, and the SQS envelope body. */
class MultiModalSpec extends SparkSpec {

  private def docs() = {
    import spark.implicits._
    Seq((0L, "abcd efgh ijkl", "en", "s", 14L),
      (1L, "zz yy xx ww vv uu", "en", "s", 17L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("feature extraction: hash, length, leading-byte features") {
    val f = MultiModal.features(docs()).orderBy("doc_id").collect()
    assert(f(0).getAs[String]("media_type") == "image/jpeg")
    assert(f(0).getAs[Int]("byte_len") == 14)
    // md5("abcd efgh ijkl")
    assert(f(0).getAs[String]("content_hash") ==
      java.security.MessageDigest.getInstance("MD5")
        .digest("abcd efgh ijkl".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
    assert(f(0).getAs[Double]("f0") == 'a'.toInt / 255.0)
    assert(f(1).getAs[String]("media_type") == "audio/wav")
  }

  test("resize plan preserves aspect ratio toward 224") {
    val r = MultiModal.resizePlan(docs()).orderBy("doc_id").head
    val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
    val (tw, th) = (r.getAs[Int]("target_w"), r.getAs[Int]("target_h"))
    if (w >= h) { assert(tw == 224); assert(th == h * 224 / w) }
    else { assert(th == 224); assert(tw == w * 224 / h) }
  }

  test("frame sampling emits every k-th index") {
    import spark.implicits._
    val vids = Seq((2L, "x" * 25, "en", "s", 25L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val idx = MultiModal.frameSamplePlan(vids, everyK = 10)
      .select("frame_idx").collect().map(_.getInt(0)).sorted
    assert(idx.toSeq == Seq(0, 10, 20))
  }

  test("observe() publishes the six counters through the listener") {
    @volatile var seen: Option[org.apache.spark.sql.Row] = None
    val listener = new Observability.MetricsListener((_, row) => seen = Some(row))
    spark.listenerManager.register(listener)
    try {
      import spark.implicits._
      val env = MatchFixture.envelope(
        Seq((18L, "Customer#18"), (19L, "Customer#19"))
          .toDF("c_custkey", "c_name"))
      Observability.observed(MatchPipeline.decide(env)).collect()
      // listener delivery is async on the listener bus — poll briefly
      val deadline = System.currentTimeMillis() + 10000
      while (seen.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(seen.isDefined)
      val m = seen.get
      assert(m.getAs[Long]("total_records") == 2L)
      assert(m.getAs[Long]("emails_triggered") == 1L)
      assert(m.getAs[Long]("skipped_records") == 1L)
    } finally spark.listenerManager.unregister(listener)
  }

  test("sqs envelope body is the reference's nested JSON shape") {
    import spark.implicits._
    val env = MatchFixture.envelope(
      Seq((18L, "Customer#18")).toDF("c_custkey", "c_name"))
    val trig = MatchPipeline.decide(env).filter(col("action") === "email_triggered")
    val row = EmailJobs.sqsEnvelope(trig,
      lit("2024-01-20T00:00:00.000Z"), lit(1705708800000L)).head
    assert(row.getAs[String]("id") == "email_ev18_g18_1705708800000")
    val body = row.getAs[String]("body")
    assert(body.contains(""""type":"photo_match_notification""""))
    assert(body.contains(""""dedupId":"ev18-guest7@hapzea.com""""))
    assert(body.contains(""""guestInfo":{"name":"Customer#18""""))
    assert(body.contains(""""galleryUrl":"https://hapzea.com/gallery/ev18/g18""""))
    assert(row.getAs[Int]("delay_seconds") == 5)
  }
}
