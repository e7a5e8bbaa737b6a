package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time named SparkEntry queries (comma-separated) at a data
  * dir, Bench-style (count() action, best of n). Run:
  *   runMain graft.tools.QueryTime <dir> <query,query,...> [iters]
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).headOption.map(_.split(",").toSet)
      .getOrElse(graft.SparkEntry.queries.keySet)
    val iters = args.drop(2).headOption.map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries.filter(q => names(q._1)).toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        val times = (1 to iters).map { _ =>
          val t0 = System.nanoTime()
          val n = fn(spark, dir).count()
          ((System.nanoTime() - t0) / 1e9, n)
        }
        println(f"$name%-24s rows=${times.head._2}%-8d " +
          times.map(t => f"${t._1}%.2fs").mkString(" "))
      }
    spark.stop()
  }
}
