package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.CorpusIngest

/** Streaming incremental corpus ingestion: intra-batch dedup,
  * cross-batch digest suppression, and replay idempotency (TxnLog). */
class CorpusIngestSpec extends SparkSpec {
  import spark.implicits._

  test("stream ingestion appends each content exactly once across batches") {
    implicit val sqlCtx = spark.sqlContext
    val corpusDir = Files.createTempDirectory("graft-corpus").toString
    val checkpoint = Files.createTempDirectory("graft-corpus-ck").toString
    val input = MemoryStream[(Long, String)]
    val q = CorpusIngest.start(
      input.toDF().toDF("doc_id", "text"), corpusDir, checkpoint)
    try {
      // batch 0: two distinct contents; 11 duplicates 1's content
      // intra-batch → canonical survivor is min doc_id
      input.addData((1L, "alpha content"), (2L, "beta content"),
        (11L, "alpha content"))
      q.processAllAvailable()
      val after0 = spark.read.parquet(s"$corpusDir/data")
      assert(after0.count() == 2)
      assert(after0.select("doc_id").as[Long].collect().toSet == Set(1L, 2L))

      // batch 1: known content (suppressed) + genuinely new content
      input.addData((3L, "alpha content"), (4L, "gamma content"))
      q.processAllAvailable()
      val after1 = spark.read.parquet(s"$corpusDir/data")
      assert(after1.count() == 3)
      assert(after1.select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 4L))
    } finally q.stop()
  }

  test("a replayed micro-batch is skipped by the txn log and changes nothing") {
    val corpusDir = Files.createTempDirectory("graft-corpus-replay").toString
    val batch = Seq((1L, "doc one"), (2L, "doc two")).toDF("doc_id", "text")
    assert(CorpusIngest.ingestBatch(batch, 0L, corpusDir) == 2L)
    // crash-replay of the same batch id: marker exists → no work
    assert(CorpusIngest.ingestBatch(batch, 0L, corpusDir) == 0L)
    // same CONTENT under a new batch id: anti-join layer suppresses it
    assert(CorpusIngest.ingestBatch(batch, 1L, corpusDir) == 0L)
    assert(spark.read.parquet(s"$corpusDir/data").count() == 2)
  }
}
