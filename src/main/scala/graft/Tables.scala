package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-provided parquet tables (TESTDATA.md).
  *
  * All tables are read lazily; Catalyst prunes columns and pushes filters
  * into the parquet scan, so callers should select/filter on the returned
  * DataFrame rather than materializing it.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Normalize `events.ts` to TIMESTAMP (LTZ) regardless of how the
    * driver generated the parquet — the type has varied across rounds:
    *  - TIMESTAMP(NANOS), which Spark 4 only reads as a raw long
    *    (spark.sql.legacy.parquet.nanosAsLong — set by the session
    *    builders): convert ns→µs (exact; driver data is µs-grained);
    *  - TIMESTAMP_NTZ: cast to TIMESTAMP. Sessions pin the time zone
    *    to UTC, so the wall-clock fields are preserved bit-for-bit and
    *    `unix_micros`/`window`/`date_trunc` all behave as in the LTZ
    *    rounds (r8 passed all event queries under this semantics). */
  private def withTsFromNanos(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(
            org.apache.spark.sql.types.TimestampType))
      case _ => df
    }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     =
    withTsFromNanos(load(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
