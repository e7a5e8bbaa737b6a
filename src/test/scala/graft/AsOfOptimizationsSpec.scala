package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.AsOfJoin

/** Catalyst integration of the native as-of: filter pushdown, key
  * transitivity, column pruning ([[graft.plans.AsOfPushdown]]) and the
  * stats-driven broadcast/merge auto-selection. Plan-shape asserts run
  * against real parquet scans so PushedFilters / ReadSchema are the
  * genuine artifacts, and every rewrite is gated by a result-identity
  * check against the rule's kill switch. */
class AsOfOptimizationsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  override protected def beforeAll(): Unit = {
    super.beforeAll()
    // FileScan metadata (PushedFilters / ReadSchema) truncates at 100
    // chars by default, which would blind the string asserts below
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
  }

  private def purchases: DataFrame =
    Tables.events(spark, dir).filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
  private def clicks: DataFrame =
    Tables.events(spark, dir).filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"),
        col("event_id").as("c_eid"), col("props").as("c_props"))

  private def asOfAll: DataFrame =
    AsOfJoin.asOf(purchases, clicks, Seq("user_id"), "ts", "c_ts",
      Seq("c_eid"), None, broadcastRight = Some(false))

  /** The FINAL plan section only — AQE's toString also prints the
    * Initial Plan, which would double every scan-level count. */
  private def finalPlan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head

  test("left-only filters push below the as-of and reach the parquet scan, keys clone to the right scan") {
    val df = asOfAll.filter(col("user_id") === 7L && col("value") > 0.5)
    df.collect()
    val plan = finalPlan(df)
    // the key predicate reaches BOTH scans (left directly, right via
    // the leftKey -> rightKey transitive clone); the non-key left
    // predicate reaches the left scan
    val pushed = "PushedFilters: \\[[^\\]]*".r.findAllIn(plan).toList
    assert(pushed.count(_.contains("EqualTo(user_id,7)")) == 2, plan)
    assert(pushed.exists(_.contains("GreaterThan(value,0.5)")), plan)
    // nothing is filtered above the join anymore
    assert(!plan.contains("Filter (user_id"), plan)
  }

  test("right-referencing filters stay above the join (null-extension semantics)") {
    // click_event_id IS NULL keeps the MISS rows — pushing it to the
    // right child would be the classic outer-join-filter unsoundness
    val df = asOfAll.filter(col("c_eid").isNull && col("user_id") < 50L)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Any]("c_eid") == null))
    val plan = finalPlan(df)
    val pushed = "PushedFilters: \\[[^\\]]*".r.findAllIn(plan).toList
    // the left-only half still pushed to both scans (key transitivity)
    assert(pushed.count(_.contains("LessThan(user_id,50)")) == 2, plan)
    // the right-referencing half did NOT reach any scan
    assert(!pushed.exists(_.contains("IsNull")), plan)
  }

  test("a narrow projection prunes both scan schemas through the as-of") {
    val df = asOfAll.select(col("user_id"), col("c_eid"))
    df.collect()
    val plan = finalPlan(df)
    val schemas = "ReadSchema: [^\\n]*".r.findAllIn(plan).toList
    assert(schemas.size == 2, plan)
    // neither scan reads the columns the projection dropped: value
    // (left payload) and c_props (right payload renamed from props)
    assert(!schemas.exists(_.contains("value")), plan)
    assert(!schemas.exists(_.contains("props")), plan)
    // keys and timestamps survive for the merge itself
    assert(schemas.forall(_.contains("user_id")), plan)
  }

  test("a left time range derives right time bounds; a ts-partitioned right side partition-prunes") {
    import spark.implicits._
    val base = 1700000000000L
    def ts(h: Long) = new Timestamp(base + h * 3600L * 1000L)
    // right side partitioned BY its timestamp column: 6 hourly
    // partitions — the layout a rates/reference table keeps at scale
    val rdir = java.nio.file.Files.createTempDirectory("asof_tpart").toString
    (0L until 6L).flatMap(h => Seq((h % 2, ts(h), h * 10)))
      .toDF("k", "c_ts", "rate")
      .write.mode("overwrite").partitionBy("c_ts").parquet(rdir)
    val right = spark.read.parquet(rdir)
    val left = (0L until 40L).map(i => (i % 2, ts(i % 6), i))
      .toDF("k", "ts", "lid")
    def query() = AsOfJoin.asOf(left, right, Seq("k"), "ts", "c_ts",
      toleranceUs = Some(3600L * 1000L * 1000L), // 1h in µs
      broadcastRight = Some(false))
      .filter(col("ts") >= lit(ts(2)) && col("ts") <= lit(ts(4)))
    val df = query()
    val withRule = df.collect().map(_.toSeq).toSet
    val plan = finalPlan(df)
    // the derived bounds reach the right scan's PARTITION filters:
    // upper bound c_ts <= T from ts <= T, lower bound c_ts >= T0 - 1h
    // from ts >= T0 with the 1h tolerance
    val pf = "PartitionFilters: \\[[^\\]]*".r.findAllIn(plan).toList
    assert(pf.exists(s => s.contains("c_ts") && s.contains("<=")), plan)
    assert(pf.exists(s => s.contains("c_ts") && s.contains(">=")), plan)
    // and the rewrite is answer-preserving vs the kill-switched plan
    spark.conf.set("spark.graft.optimizer.asofPushdown", "false")
    try {
      val without = query().collect().map(_.toSeq).toSet
      assert(withRule.nonEmpty && withRule == without)
    } finally spark.conf.unset("spark.graft.optimizer.asofPushdown")
    // without tolerance no LOWER bound derives (an arbitrarily old
    // right row can still be somebody's latest match) — upper only
    val noTol = AsOfJoin.asOf(left, right, Seq("k"), "ts", "c_ts",
      broadcastRight = Some(false)).filter(col("ts") <= lit(ts(4)))
    noTol.collect()
    val pf2 = "PartitionFilters: \\[[^\\]]*".r.findAllIn(finalPlan(noTol)).toList
    assert(pf2.exists(s => s.contains("c_ts") && s.contains("<=")), finalPlan(noTol))
    assert(!pf2.exists(s => s.contains("c_ts") && s.contains(">=")), finalPlan(noTol))
  }

  test("an overflowing tolerance shift derives NO right bound — sentinel-extreme timestamps keep their matches") {
    import spark.implicits._
    // long-typed timestamps at the ends of the domain: a saturated
    // literal bound (rts < Long.MaxValue) would wrongly exclude a
    // right row whose timestamp IS Long.MaxValue; the correct
    // derivation for an overflowing shift is no predicate at all
    val ldir = java.nio.file.Files.createTempDirectory("asof_sat_l").toString
    val rdir = java.nio.file.Files.createTempDirectory("asof_sat_r").toString
    Seq((1L, Long.MaxValue - 1L, 100L), (1L, Long.MinValue + 1L, 101L))
      .toDF("k", "lts", "lid").write.mode("overwrite").parquet(ldir)
    Seq((1L, Long.MaxValue, 10L), (1L, Long.MinValue, 11L))
      .toDF("k", "rts", "rid").write.mode("overwrite").parquet(rdir)
    val left = spark.read.parquet(ldir)
    val right = spark.read.parquet(rdir)
    def run(direction: String, flt: org.apache.spark.sql.Column)
        : Set[Seq[Any]] =
      AsOfJoin.asOf(left, right, Seq("k"), "lts", "rts", Seq("rid"),
        toleranceUs = Some(10L), broadcastRight = Some(false),
        direction = direction)
        .filter(flt).select(col("lid"), col("rid"))
        .collect().map(_.toSeq).toSet
    // forward upper bound: lts < MaxValue shifts up by tolerance →
    // overflow; the MaxValue right row must still match lid=100 (gap 1)
    val fwd = run("forward", col("lts") < lit(Long.MaxValue))
    assert(fwd.contains(Seq(100L, 10L)), fwd)
    // backward lower bound: lts > MinValue shifts down by tolerance →
    // overflow; the MinValue right row must still match lid=101 (gap 1)
    val bwd = run("backward", col("lts") > lit(Long.MinValue))
    assert(bwd.contains(Seq(101L, 11L)), bwd)
    // both identical to the kill-switched plan
    spark.conf.set("spark.graft.optimizer.asofPushdown", "false")
    try {
      assert(run("forward", col("lts") < lit(Long.MaxValue)) == fwd)
      assert(run("backward", col("lts") > lit(Long.MinValue)) == bwd)
    } finally spark.conf.unset("spark.graft.optimizer.asofPushdown")
  }

  test("pushdown rewrites are result-identical to the kill-switched plan") {
    def run(): Set[Seq[Any]] =
      asOfAll.filter(col("user_id") % 3 === 0)
        .select(col("user_id"), col("event_id"), col("c_eid"))
        .collect().map(_.toSeq).toSet
    val withRule = run()
    spark.conf.set("spark.graft.optimizer.asofPushdown", "false")
    try {
      val without = run()
      assert(withRule.nonEmpty && withRule == without)
    } finally spark.conf.unset("spark.graft.optimizer.asofPushdown")
  }

  test("floating-point as-of keys are rejected at construction") {
    // the merge exec's compiled ordering groups 0.0 with -0.0; the
    // broadcast prober's byte-wise hash map would not, and our node
    // never receives the planner's NormalizeFloatingNumbers rewrite —
    // so float keys are a construction-time error, not a latent
    // engine-dependent divergence
    import spark.implicits._
    val l = Seq((1.0, new Timestamp(1L), 1L)).toDF("k", "ts", "lid")
    val r = Seq((1.0, new Timestamp(1L), 2L)).toDF("k", "r_ts", "rid")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(l, r, Seq("k"), "ts", "r_ts")
    }
    assert(e.getMessage.contains("floating-point"))
  }

  test("unhinted as-of picks broadcast for a dim-sized right and merge above threshold") {
    import spark.implicits._
    val left = (1L to 100L).map(i =>
      (i % 5, new Timestamp(1700000000000L + i * 1000), i))
      .toDF("k", "ts", "lid")
    val right = Seq((1L, new Timestamp(1700000000000L), 10L))
      .toDF("k", "r_ts", "rid")
    val auto = AsOfJoin.asOf(left, right, Seq("k"), "ts", "r_ts")
    assert(auto.queryExecution.executedPlan.toString
      .contains("BroadcastAsOfJoin"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val merge = AsOfJoin.asOf(left, right, Seq("k"), "ts", "r_ts")
      val plan = merge.queryExecution.executedPlan.toString
      assert(plan.contains("AsOfJoin") && !plan.contains("BroadcastAsOfJoin"),
        plan)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
