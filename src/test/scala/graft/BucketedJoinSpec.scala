package graft

import org.apache.spark.sql.functions._

/** Bucketing as the co-located-join strategy: two tables bucketed by the
  * join key join WITHOUT any shuffle exchange — at 100 TB this is the
  * difference between an all-to-all network move of both fact tables and
  * a purely local merge per bucket. Local[n] proves the plan shape; the
  * same DDL carries to a real warehouse. */
class BucketedJoinSpec extends SparkSpec {

  test("join of tables bucketed by the key plans with no shuffle exchange") {
    import spark.implicits._
    val orders = (1L to 1000L).map(k => (k, k % 7)).toDF("o_orderkey", "o_status")
    val items = (1L to 3000L).map(i => (i % 1000 + 1, i)).toDF("l_orderkey", "l_item")

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_items")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    items.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_items")

    val joined = spark.table("b_orders").join(
      spark.table("b_items"),
      col("o_orderkey") === col("l_orderkey"))
    // force a sort-merge plan so co-location matters (broadcast would
    // hide the exchange question entirely at this size)
    val smj = joined.hint("merge")
    val plan = smj.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    assert(smj.count() == 3000L)

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_items")
  }

  test("q3's join strategy is size-driven: broadcast while small, shuffle when broadcast is off") {
    val d = "/root/testdata/sf0.001"
    def plan() = graft.ext.Analytics.shippingPriority(
      Tables.customer(spark, d), Tables.orders(spark, d), Tables.lineitem(spark, d))
      .queryExecution.executedPlan.toString
    // small SF + default threshold: size estimation picks broadcast
    val p1 = plan()
    assert(p1.contains("BroadcastHashJoin"))
    assert(!p1.contains("SortMergeJoin"))
    // threshold off (the 100x proxy: estimated sizes exceed any bound):
    // the SAME query plans a shuffle join — no forced hint pins it
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p2 = plan()
      assert(p2.contains("SortMergeJoin") || p2.contains("ShuffledHashJoin"), p2.linesIterator.filter(_.contains("Join")).mkString("\n"))
      assert(!p2.contains("BroadcastHashJoin"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
