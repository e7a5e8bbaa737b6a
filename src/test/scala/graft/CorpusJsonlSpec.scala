package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.sources.CorpusJsonl

/** JSONL ingestion: PERMISSIVE parse, corrupt-record quarantine with
  * raw-line capture, invariant validation, and write round-trip. */
class CorpusJsonlSpec extends SparkSpec {

  private def writeLines(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft-jsonl")
    Files.write(dir.resolve("part-000.jsonl"),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    dir.toString
  }

  test("clean lines parse, corrupt and invalid lines quarantine with raw bytes") {
    val dir = writeLines(Seq(
      """{"doc_id": 1, "text": "alpha beta", "lang": "en", "source": "web", "n_chars": 10}""",
      """{"doc_id": 2, "text": "gamma", "lang": "de", "source": "web", "n_chars": 5}""",
      """{"doc_id": 3, "text": "trunca""", // malformed JSON
      """{"doc_id": 4, "lang": "en", "source": "web", "n_chars": 0}""")) // no text
    val (clean, quarantine) = CorpusJsonl.read(spark, dir)

    val ids = clean.collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(ids == Seq(1L, 2L))
    assert(clean.columns.toSeq ==
      Seq("doc_id", "text", "lang", "source", "n_chars"))

    val q = quarantine.collect()
      .map(r => r.getAs[String]("reason") -> r.getAs[String]("raw_line"))
    assert(q.length == 2)
    val byReason = q.toMap
    // BOTH quarantine classes preserve the input line BYTE-FOR-BYTE
    assert(byReason("malformed_json") == """{"doc_id": 3, "text": "trunca""")
    assert(byReason("missing_required_field") ==
      """{"doc_id": 4, "lang": "en", "source": "web", "n_chars": 0}""")
  }

  test("write/read round-trips the documents frame") {
    import spark.implicits._
    val docs = Seq(
      (10L, "one two", "en", "web", 7L),
      (11L, "drei vier", "de", "books", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = Files.createTempDirectory("graft-jsonl-rt").toString + "/out"
    CorpusJsonl.write(docs, dir)
    val (clean, quarantine) = CorpusJsonl.read(spark, dir)
    assert(quarantine.count() == 0)
    val back = clean.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
        r.getAs[String]("lang"), r.getAs[String]("source"),
        r.getAs[Long]("n_chars"))).sortBy(_._1).toSeq
    assert(back == Seq(
      (10L, "one two", "en", "web", 7L),
      (11L, "drei vier", "de", "books", 9L)))
  }
}
