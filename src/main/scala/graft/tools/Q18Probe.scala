package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.Analytics

/** Dev probe for the r15 `q18_large_orders` 100×-rung knee
  * (scale_ladder_100x.json: 3.46 s at 30× → 30.14 s at 100×, segment
  * α ≈ 1.8): times the shipped plan against candidate shapes at a
  * replica dir and dumps the spill/peak-memory metrics of each run's
  * final adaptive plan, so the knee is attributed to a measured
  * operator rather than a guess.
  *
  * Run: runMain graft.tools.Q18Probe <dir> [iters]
  */
object Q18Probe {

  /** All SparkPlan nodes including those behind AQE wrappers. */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val inner = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case _ => p.children
    }
    p +: inner.flatMap(allNodes)
  }

  private def metricSummary(df: DataFrame): String = {
    val nodes = allNodes(df.queryExecution.executedPlan)
    val rows = nodes.flatMap { n =>
      n.metrics.collect {
        case (k, m) if (k.toLowerCase.contains("spill") ||
            k == "peakMemory" || k == "numOutputRows") && m.value > 0 =>
          (n.nodeName, k, m.value)
      }
    }
    rows.groupBy(r => (r._1, r._2)).toSeq
      .map { case ((node, k), vs) => (node, k, vs.map(_._3).sum) }
      .filter { case (_, k, v) =>
        !(k == "numOutputRows" && v < 1000000L) } // only fact-sized flows
      .sortBy(-_._3)
      .map { case (node, k, v) =>
        val h = if (k.toLowerCase.contains("size") || k == "peakMemory")
          f"${v / 1024.0 / 1024.0}%.0f MB" else v.toString
        s"  $node.$k = $h" }
      .mkString("\n")
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf100")
    val iters = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def customer = Tables.customer(spark, dir)
    def orders = Tables.orders(spark, dir)
    def lineitem = Tables.lineitem(spark, dir)
    def dec(c: String) = col(c).cast("decimal(18,2)")

    // shipped shape (Analytics.largeVolumeOrders)
    def current(): DataFrame =
      Analytics.largeVolumeOrders(customer, orders, lineitem)

    // candidate: repartition-first — move the one exchange BELOW the
    // aggregate so the partial map is bounded by the partition's key
    // share instead of the scan split's
    def repartFirst(): DataFrame = {
      val big = lineitem.select(col("l_orderkey"), col("l_quantity"))
        .repartition(col("l_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(sum(dec("l_quantity")).as("qty_d"))
        .filter(col("qty_d") > lit(300.0).cast("decimal(18,2)"))
      orders
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(customer, col("o_custkey") === col("c_custkey"))
        .select(
          col("c_name"), col("c_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          col("o_totalprice").as("total_price"),
          col("qty_d").cast("string").as("total_qty"))
        .orderBy(col("total_price").desc, col("o_orderkey"))
        .limit(20)
    }

    val variants = Seq("current" -> (() => current()),
      "repart_first" -> (() => repartFirst()))
    for ((name, mk) <- variants) {
      val walls = (1 to iters).map { _ =>
        val df = mk()
        val t0 = System.nanoTime()
        val n = df.count()
        val w = (System.nanoTime() - t0) / 1e9
        (w, n, df)
      }
      val best = walls.minBy(_._1)
      println(f"[q18probe] $name%-14s rows=${best._2} walls=" +
        walls.map(w => f"${w._1}%.2fs").mkString(","))
      println(metricSummary(best._3))
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
