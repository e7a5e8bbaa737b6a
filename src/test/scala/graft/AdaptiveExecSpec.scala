package graft

/** Plan-level proof of the two runtime re-optimizations the 100-TB
  * posture leans on (PLANS.md): AQE splitting a skewed shuffle join,
  * and the runtime bloom filter pruning a shuffle join's streamed side.
  * The bench pins static plans (AQE off — codegen latency dominates at
  * test SF); these tests document that the same queries re-plan under
  * the cluster configuration.
  *
  * Confs are set on an isolated newSession() so the shared test session
  * keeps its static-plan behavior.
  */
class AdaptiveExecSpec extends SparkSpec {

  test("AQE splits the hot partition of a skewed sort-merge join") {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    import s.implicits._
    // one Zipf-hot key carrying ~5 MB against a uniform dimension side;
    // payload is pseudo-random (shuffle sizes are COMPRESSED bytes — a
    // constant string deflates below the skew threshold)
    val rnd = new scala.util.Random(42)
    val left = (0 until 60000)
      .map(i => (if (i < 50000) 0L else (i % 15000).toLong + 1L,
        rnd.alphanumeric.take(100).mkString))
      .toDF("k", "pay").repartition(8)
    val right = (0L until 20000L).map(k => (k, k * 2)).toDF("k", "v")
    val joined = left.join(right, "k")
    // collect() drives THIS queryExecution to its final adaptive plan
    // (count() would plan a separate query and leave this one unexecuted)
    assert(joined.collect().length == 60000)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"expected AQE skew-split SMJ in:\n$plan")
  }

  test("runtime bloom filter from a selective dim prunes the fact side") {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s.conf.set("spark.sql.optimizer.runtimeFilter.number.threshold", "10")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom").toString
    (0L until 50000L).map(i => (i, s"pay$i")).toDF("k", "pay")
      .write.mode("overwrite").parquet(s"$dir/fact")
    (0L until 5000L).map(i => (i, i % 7)).toDF("k", "grp")
      .write.mode("overwrite").parquet(s"$dir/dim")
    val fact = s.read.parquet(s"$dir/fact")
    val dim = s.read.parquet(s"$dir/dim").filter($"grp" === 3)
    val joined = fact.join(dim, "k")
    val n = joined.count()
    assert(n > 0)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"expected a runtime bloom filter (might_contain) in:\n$plan")
  }
}
