package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.ext.Layout

/** Z-order layout: bit-exact parity with a reference Morton encoder,
  * and the two-sided per-file locality that single-column sorting
  * cannot give (the property parquet footer-stat pruning feeds on). */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton encoder: interleave bit-by-bit. */
  private def morton(a: Long, b: Long): Long =
    (0 until 16).map { i =>
      (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }.reduce(_ | _)

  test("zvalue2 equals the bit-by-bit reference on a spread of keys") {
    val keys = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (40000L, 7L), (0x10000L + 5L, 3L)) // >16 bits masked
    val got = keys.toDF("a", "b")
      .select(Layout.zvalue2($"a", $"b").as("z")).as[Long].collect()
    val want = keys.map { case (a, b) => morton(a & 0xFFFFL, b & 0xFFFFL) }
    assert(got.toSeq == want)
  }

  test("z-ordered files bound BOTH key ranges; x-sorted files bound only x") {
    // 64x64 grid of (x, y) keys, written 16 ways both layouts.
    val grid = (for { x <- 0L until 64L; y <- 0L until 64L }
      yield (x * 64 + y, x, y)).toDF("id", "x", "y")

    def spans(dir: String): Seq[(Long, Long)] =
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
        .toSeq.map { f =>
          val r = spark.read.parquet(f.getAbsolutePath)
            .agg(max($"x") - min($"x"), max($"y") - min($"y")).head()
          (r.getLong(0), r.getLong(1))
        }

    val zDir = Files.createTempDirectory("graft-zorder").toString
    Layout.writeZOrdered(grid, zDir, $"x", $"y", numFiles = 16)
    val zSpans = spans(zDir)
    assert(zSpans.size > 8)
    // Every curve segment is a compact tile: both dims well under the
    // global range (63); a 16-way split of a 64x64 grid gives tiles of
    // at most a quarter of the range per side.
    assert(zSpans.forall { case (sx, sy) => sx <= 31 && sy <= 31 },
      s"z spans not tile-bounded: $zSpans")

    val xDir = Files.createTempDirectory("graft-xsort").toString
    grid.repartitionByRange(16, $"x").sortWithinPartitions($"x")
      .write.mode("overwrite").parquet(xDir)
    val xSpans = spans(xDir)
    // x-sorted layout: x is tightly bounded but y spans the full range
    // in every file — no pruning for y predicates.
    assert(xSpans.forall { case (_, sy) => sy == 63 },
      s"x-sorted layout unexpectedly bounded y: $xSpans")
  }

  test("eventZValues is deterministic and within 32 bits") {
    val events = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:05:00"), 7L),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:06:00"), 9L))
      .toDF("event_id", "ts", "user_id")
    val out = Layout.eventZValues(events).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.values.forall(z => z >= 0 && z < (1L << 32)))
    val again = Layout.eventZValues(events).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == again)
  }
}
