package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins [[Tables.events]]' ts normalization across the physical types the
  * driver's generator has actually emitted: TIMESTAMP(NANOS) (read as a
  * raw long under nanosAsLong) in early rounds, TIMESTAMP_NTZ from round
  * 9 on. Either way callers must see TIMESTAMP (LTZ) with the same UTC
  * wall-clock instant, or every unix_micros()-based event query breaks. */
class TablesSpec extends SparkSpec {

  private val microsUtc = 820454400000000L // 1996-01-01T00:00:00Z

  private def writeEvents(df: org.apache.spark.sql.DataFrame): String = {
    val dir = Files.createTempDirectory("tables_spec").toString
    df.coalesce(1).write.parquet(s"$dir/events.parquet")
    dir
  }

  test("events.ts: TIMESTAMP_NTZ parquet normalizes to TIMESTAMP, same UTC wall clock") {
    import spark.implicits._
    val dir = writeEvents(
      Seq((1L, microsUtc)).toDF("event_id", "us")
        .select(col("event_id"),
          timestamp_micros(col("us")).cast(TimestampNTZType).as("ts")))
    val got = Tables.events(spark, dir)
    assert(got.schema("ts").dataType == TimestampType)
    assert(got.select(unix_micros(col("ts"))).head.getLong(0) == microsUtc)
  }

  test("events.ts: raw-long nanos (legacy TIMESTAMP(NANOS) read) converts exactly") {
    import spark.implicits._
    val dir = writeEvents(
      Seq((1L, microsUtc * 1000L)).toDF("event_id", "ts"))
    val got = Tables.events(spark, dir)
    assert(got.schema("ts").dataType == TimestampType)
    assert(got.select(unix_micros(col("ts"))).head.getLong(0) == microsUtc)
  }

  test("events.ts: already-TIMESTAMP parquet passes through untouched") {
    import spark.implicits._
    val dir = writeEvents(
      Seq((1L, microsUtc)).toDF("event_id", "us")
        .select(col("event_id"), timestamp_micros(col("us")).as("ts")))
    val got = Tables.events(spark, dir)
    assert(got.schema("ts").dataType == TimestampType)
    assert(got.select(unix_micros(col("ts"))).head.getLong(0) == microsUtc)
  }
}
