package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.pipeline.{MatchFixture, MatchPipeline, Tombstones}
import graft.sink.StatusStore

/** The r19 REMOVE-event tombstone extension: decisions, key fallback
  * (new → old image), CAS propagation into the status table, corpus
  * excision markers, and the stream≡batch pin. */
class TombstonesSpec extends SparkSpec {
  import spark.implicits._

  private def decidedFor(ks: Seq[Long]) =
    MatchPipeline.decide(MatchFixture.envelope(
      ks.map(k => (k, s"Customer#$k")).toDF("c_custkey", "c_name")))

  // fixture REMOVE rows: k % 10 == 9
  test("decisions: REMOVE rows only, keys present → tombstoned, missing keys → skipped with reason") {
    // k=29: REMOVE with full image; k=139: REMOVE with no image
    // (139%17==3 → NewImage null, no OldImage) → no keys
    val d = Tombstones.decisions(decidedFor(Seq(29L, 139L, 28L)))
      .collect().map(r => r.getAs[String]("record_id") -> r).toMap
    assert(d.size == 2) // the INSERT row (28) is not a tombstone
    assert(d("r29").getAs[String]("action") == "tombstoned")
    assert(d("r29").getAs[String]("event_id") == "ev29")
    assert(d("r29").getAs[String]("guest_id") == "g29")
    assert(d("r29").getAs[String]("guest_email") == "guest7@hapzea.com")
    assert(d("r139").getAs[String]("action") == "tombstone_skipped")
    assert(d("r139").getAs[String]("reason") ==
      "No key data on REMOVE image")
  }

  test("key fallback: a REMOVE carrying only OldImage (the real stream shape) still tombstones") {
    // hand-build a decoded-shaped frame: new-image keys null, old keys set
    val dec = Seq(("rX", "REMOVE")).toDF("record_id", "event_name")
      .select(col("record_id"), col("event_name"),
        lit(null).cast("string").as("event_id"),
        lit(null).cast("string").as("guest_id"),
        lit(null).cast("string").as("guest_email"),
        lit("evOld").as("old_event_id"),
        lit("gOld").as("old_guest_id"),
        lit("Old@Hapzea.com").as("old_guest_email"))
    val r = Tombstones.decisions(dec).collect().head
    assert(r.getAs[String]("action") == "tombstoned")
    assert(r.getAs[String]("event_id") == "evOld")
    assert(r.getAs[String]("guest_id") == "gOld")
    assert(r.getAs[String]("guest_email") == "old@hapzea.com") // lowered
  }

  test("status propagation: markDeleted CAS-merges 'deleted' over any prior state") {
    val dir = Files.createTempDirectory("graft-tomb-status").toString
    // seed: one key mid-flight ('processing'), one absent
    StatusStore.casMerge(StatusStore.markProcessing(
      Seq(("ev1", "g1")).toDF("event_id", "guest_id")), dir)
    val dec = Tombstones.decisions(decidedFor(Seq(29L)))
      .unionByName(Seq(
        ("rY", "ev1", "g1", "x@y.zz", "tombstoned", "Record deleted upstream - tombstone propagated"))
        .toDF("record_id", "event_id", "guest_id", "guest_email",
          "action", "reason"))
    val res = StatusStore.casMerge(
      StatusStore.markDeleted(Tombstones.statusUpdates(dec)), dir)
    assert(res.applied == 2 && res.rejected == 0)
    val st = StatusStore.read(spark, dir).get.collect()
      .map(r => (r.getAs[String]("event_id"), r.getAs[String]("guest_id")) ->
        r.getAs[String]("delivery_status")).toMap
    assert(st(("ev1", "g1")) == "deleted")   // overwrote 'processing'
    assert(st(("ev29", "g29")) == "deleted") // created
  }

  test("excision markers: doc identity + lowercased email, deduplicated") {
    val dec = Tombstones.decisions(decidedFor(Seq(29L, 29L)))
    val m = Tombstones.excisionMarkers(dec).collect()
    assert(m.length == 1)
    assert(m.head.getAs[String]("doc_id") == "ev29-g29")
    assert(m.head.getAs[String]("guest_email") == "guest7@hapzea.com")
  }

  test("corpus excision: markers tombstone the ingest corpus logically; the active view excludes them; replays converge") {
    import graft.streaming.CorpusIngest
    val dir = Files.createTempDirectory("graft-tomb-corpus").toString
    val docs = Seq(
      ("ev1-g1", "alpha text one"),
      ("ev2-g2", "beta text two"),
      ("ev3-g3", "gamma text three")).toDF("doc_id", "text")
    assert(CorpusIngest.ingestBatch(docs, 0L, dir) == 3L)
    // the Tombstones.excisionMarkers shape feeds straight in
    val markers = Seq(("ev2-g2", "g2@x.yy")).toDF("doc_id", "guest_email")
    assert(CorpusIngest.tombstoneDocs(markers, 0L, dir) == 1L)
    assert(CorpusIngest.activeCorpus(spark, dir)
      .select("doc_id").as[String].collect().toSet ==
      Set("ev1-g1", "ev3-g3"))
    // data/ is untouched (logical delete, no write amplification)
    assert(spark.read.parquet(s"$dir/data").count() == 3L)
    // replayed marker batch: skipped by its txn marker AND drained by
    // doc_id even without it
    assert(CorpusIngest.tombstoneDocs(markers, 0L, dir) == 0L)
    assert(CorpusIngest.tombstoneDocs(markers, 1L, dir) == 0L)
    assert(spark.read.parquet(s"$dir/tombs").count() == 1L)
    // a second, different excision composes
    assert(CorpusIngest.tombstoneDocs(
      Seq(("ev1-g1", "g1@x.yy")).toDF("doc_id", "guest_email"), 2L, dir) == 1L)
    assert(CorpusIngest.activeCorpus(spark, dir)
      .select("doc_id").as[String].collect().toSet == Set("ev3-g3"))
    // a corpus with no tombstones reads straight through
    val dir2 = Files.createTempDirectory("graft-tomb-corpus2").toString
    assert(CorpusIngest.ingestBatch(docs, 0L, dir2) == 3L)
    assert(CorpusIngest.activeCorpus(spark, dir2).count() == 3L)
  }

  test("stream equals batch: tombstones CAS-applied per micro-batch converge to the batch application") {
    implicit val sqlCtx = spark.sqlContext
    val ks = Seq(9L, 19L, 29L, 39L, 139L, 28L, 59L)
    // batch reference
    val batchDir = Files.createTempDirectory("graft-tomb-b").toString
    StatusStore.casMerge(StatusStore.markDeleted(
      Tombstones.statusUpdates(Tombstones.decisions(decidedFor(ks)))),
      batchDir)
    // streaming: same keys over three micro-batches, foreachBatch CAS
    val streamDir = Files.createTempDirectory("graft-tomb-s").toString
    val input = MemoryStream[(Long, String)]
    val envelope = MatchFixture.envelope(
      input.toDF().toDF("c_custkey", "c_name"))
    val q = envelope.writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("graft-tomb-ck").toString)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        StatusStore.casMerge(StatusStore.markDeleted(
          Tombstones.statusUpdates(Tombstones.decisions(
            MatchPipeline.decide(b)))), streamDir)
        ()
      }
      .start()
    try {
      input.addData((9L, "Customer#9"), (19L, "Customer#19"))
      q.processAllAvailable()
      input.addData((29L, "Customer#29"), (39L, "Customer#39"),
        (139L, "Customer#1049"))
      q.processAllAvailable()
      input.addData((28L, "Customer#28"), (59L, "Customer#59"))
      q.processAllAvailable()
    } finally q.stop()
    def snap(dir: String) = StatusStore.read(spark, dir).get
      .select("event_id", "guest_id", "delivery_status").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(snap(streamDir) == snap(batchDir))
    assert(snap(batchDir).nonEmpty &&
      snap(batchDir).forall(_._3 == "deleted"))
  }
}
