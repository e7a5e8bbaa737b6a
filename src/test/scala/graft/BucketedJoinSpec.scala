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
}
