package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** JSONL corpus ingestion — the wire format web-scale text corpora
  * actually arrive in (one JSON document per line, gzip-splittable at
  * the file level), with the PERMISSIVE corrupt-record contract the
  * pipeline's typed decode also follows (SURVEY §1.3: tolerate
  * missing, fail only on corrupt, quarantine loudly): a malformed
  * line becomes a quarantine row carrying the RAW bytes for repair —
  * it is never silently dropped and never kills the job.
  *
  * Scale posture: `spark.read.json` with an EXPLICIT schema — never
  * schema inference, which is a full extra pass over 100 TB before
  * the first real read. Line-delimited JSON splits at newlines, so a
  * large file still fans out across tasks ("multiLine" JSON does
  * not — documented trap). The quarantine split is two narrow
  * filters over one scan.
  */
object CorpusJsonl {

  /** documents schema + the corrupt-record capture column. The capture
    * column must be in the read schema (Spark routes unparseable lines
    * there only if present) and must be nullable StringType. */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField("_corrupt_record", StringType)))

  /** Read a JSONL directory/file into (clean, quarantine): clean rows
    * carry the documents columns; quarantine rows carry (raw_line,
    * reason). A line that parses but violates basic invariants
    * (null doc_id / null text) is quarantined too — parseability is
    * not validity. */
  def read(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val raw = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
    val clean = raw
      .filter(col("_corrupt_record").isNull &&
        col("doc_id").isNotNull && col("text").isNotNull)
      .drop("_corrupt_record")
    val quarantine = raw
      .filter(col("_corrupt_record").isNotNull ||
        col("doc_id").isNull || col("text").isNull)
      .select(
        coalesce(col("_corrupt_record"),
          to_json(struct(col("doc_id"), col("text"), col("lang"),
            col("source"), col("n_chars")))).as("raw_line"),
        when(col("_corrupt_record").isNotNull, "malformed_json")
          .otherwise("missing_required_field").as("reason"))
    (clean, quarantine)
  }

  /** Write a documents frame as JSONL (one `text`-file line per doc). */
  def write(df: DataFrame, path: String): Unit =
    df.select(to_json(struct(col("doc_id"), col("text"), col("lang"),
      col("source"), col("n_chars"))).as("value"))
      .write.mode("overwrite").text(path)
}
