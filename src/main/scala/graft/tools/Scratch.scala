package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only timing harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.wholeStage", sys.env.getOrElse("SCRATCH_WSCG", "true"))
      .config("spark.sql.codegen.factoryMode", sys.env.getOrElse("SCRATCH_FACTORY", "FALLBACK"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val only = sys.env.get("SCRATCH_ONLY")
    graft.SparkEntry.queries
      .filter { case (n, _) => only.forall(_.split(",").contains(n)) }
      .foreach { case (name, fn) =>
        time(name)(println("rows=" + fn(spark, sfDir).count()))
      }
    spark.stop()
  }
}
