package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Dev probe for orders_basket's 100×-rung cost (r16 watch: top
  * segment α 1.142, 37 s at the 100× rung — heaviest query there):
  * times the plan's phases in isolation so optimization effort lands
  * on the measured bottleneck, and A/Bs candidate pair-count shapes.
  *
  * Run: runMain graft.tools.BasketProbe <dir> [iters]
  */
object BasketProbe {
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
    import org.apache.spark.sql.expressions.Window

    def time[A](name: String)(f: => A): A = {
      val walls = (1 to iters).map { _ =>
        val t0 = System.nanoTime(); val r = f
        ((System.nanoTime() - t0) / 1e9, r)
      }
      println(f"[basket] $name%-28s " +
        walls.map(w => f"${w._1}%.2fs").mkString(" "))
      walls.last._2
    }

    def lineitem = Tables.lineitem(spark, dir)

    // phase 1: the sized frame (repartition + distinct + window)
    def sized() = lineitem
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("part"))
      .repartition(col("okey"))
      .distinct()
      .withColumn("basket_n", count(lit(1)).over(
        Window.partitionBy(col("okey"))))
    time("sized (dist+window)") { sized().count() }
    // phase 1b: distinct only (how much the window adds)
    time("distinct only") {
      lineitem.select(col("l_orderkey").as("okey"), col("l_partkey").as("part"))
        .repartition(col("okey")).distinct().count()
    }
    // phase 2: everything up to the raw pair emission (no aggregate)
    val s = sized().localCheckpoint(false)
    val items = s.filter(col("basket_n") <= 1024)
      .select(col("okey"), col("part"))
    val freq = items.groupBy(col("part"))
      .agg(count(lit(1)).as("n_part"))
      .filter(col("n_part") >= 3L)
      .localCheckpoint(false)
    time("freq (vocab agg)") { freq.count() }
    val pruned = items.join(freq, Seq("part"))
    time("pair emission (no agg)") {
      pruned.select(col("okey"), col("part").as("part_a"))
        .join(pruned.select(col("okey"), col("part").as("part_b")), Seq("okey"))
        .filter(col("part_a") < col("part_b"))
        .count()
    }
    // phase 3: pair-count aggregate, shipped shape (partial+final)
    time("pair agg (shipped)") {
      pruned.select(col("okey"), col("part").as("part_a"), col("n_part").as("n_a"))
        .join(pruned.select(col("okey"), col("part").as("part_b"),
          col("n_part").as("n_b")), Seq("okey"))
        .filter(col("part_a") < col("part_b"))
        .groupBy(col("part_a"), col("part_b"), col("n_a"), col("n_b"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= 3L)
        .count()
    }
    // phase 3b: repartition-first pair aggregate (the q18 discipline —
    // near-unique pair keys make the map-side partial pure overhead)
    time("pair agg (repart-first)") {
      pruned.select(col("okey"), col("part").as("part_a"), col("n_part").as("n_a"))
        .join(pruned.select(col("okey"), col("part").as("part_b"),
          col("n_part").as("n_b")), Seq("okey"))
        .filter(col("part_a") < col("part_b"))
        .repartition(col("part_a"), col("part_b"))
        .groupBy(col("part_a"), col("part_b"), col("n_a"), col("n_b"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= 3L)
        .count()
    }
    // full shipped query for reference
    time("full orders_basket") {
      graft.ext.Analytics.basketPairs(lineitem).count()
    }

    // ARRAY-BASED candidate: one groupBy(okey) collect_set replaces
    // distinct + window + the okey self-join; pairs (i < j over the
    // sorted array) explode inline from each basket
    def arrayPipeline(): DataFrame = {
      val minSupport = 3L; val k = 10; val maxBasket = 1024
      val baskets = lineitem
        .select(col("l_orderkey").as("okey"), col("l_partkey").as("part"))
        .repartition(col("okey"))
        .groupBy(col("okey"))
        .agg(sort_array(collect_set(col("part"))).as("parts"))
        .localCheckpoint(false)
      val dropped = baskets.filter(size(col("parts")) > maxBasket)
        .agg(count(lit(1)).as("orders_dropped"))
      val kept = baskets.filter(size(col("parts")) <= maxBasket)
      val items = kept.select(col("okey"),
        explode(col("parts")).as("part"))
      val freq = items.groupBy(col("part"))
        .agg(count(lit(1)).as("n_part"))
        .filter(col("n_part") >= minSupport)
        .localCheckpoint(false)
      // prune arrays to frequent items WITH their counts attached,
      // re-collected per order (still hash(okey): no new exchange)
      val prunedB = items.join(freq, Seq("part"))
        .groupBy(col("okey"))
        .agg(sort_array(collect_list(struct(col("part"), col("n_part"))))
          .as("ps"))
      val total = items.agg(countDistinct(col("okey")).as("n_orders"))
      val pairs = prunedB.select(explode(flatten(expr(
        """transform(ps, (x, i) ->
          |  transform(slice(ps, i + 2, size(ps)), y ->
          |    struct(x.part AS part_a, y.part AS part_b,
          |           x.n_part AS n_a, y.n_part AS n_b)))"""
          .stripMargin))).as("p"))
        .select(col("p.part_a"), col("p.part_b"), col("p.n_a"), col("p.n_b"))
      val ranked = pairs
        .groupBy(col("part_a"), col("part_b"), col("n_a"), col("n_b"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= minSupport)
        .crossJoin(broadcast(total))
        .withColumn("lift_milli",
          expr("(support * n_orders * 1000) div (n_a * n_b)"))
        .withColumn("rank", expr("row_number() over (order by support desc, " +
          "part_a, part_b)"))
        .filter(col("rank") <= k)
      dropped.join(broadcast(ranked), lit(true), "left")
        .filter(col("part_a").isNotNull || col("orders_dropped") > 0)
        .select(col("part_a"), col("part_b"), col("support"),
          col("n_a"), col("n_b"), col("lift_milli"), col("rank"),
          col("orders_dropped"))
    }
    time("full array-based") { arrayPipeline().count() }
    // value identity against the shipped form
    val a = arrayPipeline().collect().map(_.toSeq).toSet
    val b = graft.ext.Analytics.basketPairs(lineitem).collect()
      .map(_.toSeq).toSet
    println(s"[basket] identical=${a == b} rows=${a.size}")
    spark.stop()
  }
}
