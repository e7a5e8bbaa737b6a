package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** JSONL corpus ingestion — the wire format web-scale text corpora
  * actually arrive in (one JSON document per line, splittable at
  * newlines), with the PERMISSIVE corrupt-record contract the
  * pipeline's typed decode also follows (SURVEY §1.3: tolerate
  * missing, fail only on corrupt, quarantine loudly): a malformed OR
  * invalid line becomes a quarantine row carrying the ORIGINAL line
  * byte-for-byte for repair — never silently dropped, never lossily
  * re-serialized, never a job failure.
  *
  * Design: read as TEXT, then `from_json` — not `spark.read.json` —
  * for two load-bearing reasons. (1) The raw line stays a column, so
  * EVERY quarantine row (malformed and parse-but-invalid alike)
  * carries the true input bytes, including fields outside the schema
  * that a schema'd JSON reader would silently drop. (2) One scan:
  * the parsed frame is pinned (lazy localCheckpoint), and the
  * clean/quarantine split is two narrow filters over that one
  * computed RDD — a `spark.read.json` with two downstream filters
  * parses the corpus twice. Schema is EXPLICIT — inference is a full
  * extra pass over 100 TB before the first real read.
  */
object CorpusJsonl {

  /** documents schema; `from_json` in PERMISSIVE mode yields a null
    * struct (all-null fields) for unparseable lines. */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Read a JSONL directory/file into (clean, quarantine): clean rows
    * carry the documents columns; quarantine rows carry (raw_line,
    * reason). A line that parses but violates basic invariants
    * (null doc_id / null text) is quarantined too — parseability is
    * not validity. Both frames are filters of one pinned parse pass. */
  def read(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val parsed = spark.read.text(path)
      .select(col("value").as("raw_line"),
        from_json(col("value"), schema,
          Map("mode" -> "PERMISSIVE")).as("r"))
      .localCheckpoint(false) // pin: both split branches share one parse
    val clean = parsed
      .filter(col("r.doc_id").isNotNull && col("r.text").isNotNull)
      .select(col("r.doc_id").as("doc_id"), col("r.text").as("text"),
        col("r.lang").as("lang"), col("r.source").as("source"),
        col("r.n_chars").as("n_chars"))
    val quarantine = parsed
      .filter(col("r.doc_id").isNull || col("r.text").isNull)
      .select(col("raw_line"),
        // all-fields-null ⇒ nothing in the line matched the schema:
        // malformed JSON (or an empty object — same repair queue);
        // otherwise it parsed and a required field is missing
        when(col("r.doc_id").isNull && col("r.text").isNull &&
          col("r.lang").isNull && col("r.source").isNull &&
          col("r.n_chars").isNull, "malformed_json")
          .otherwise("missing_required_field").as("reason"))
    (clean, quarantine)
  }

  /** Write a documents frame as JSONL (one `text`-file line per doc). */
  def write(df: DataFrame, path: String): Unit =
    df.select(to_json(struct(col("doc_id"), col("text"), col("lang"),
      col("source"), col("n_chars"))).as("value"))
      .write.mode("overwrite").text(path)
}
