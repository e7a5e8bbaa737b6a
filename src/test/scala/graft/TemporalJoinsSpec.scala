package graft

import java.sql.Timestamp

import graft.ext.{EmbedOps, TemporalJoins}

/** Semantics of the as-of / range temporal joins and the exact cosine
  * near-dup on tiny controlled frames. */
class TemporalJoinsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def events(rows: (Long, String, Long, String)*) = {
    import spark.implicits._
    rows.map { case (id, t, u, typ) => (id, ts(t), u, typ) }
      .toDF("event_id", "ts", "user_id", "event_type")
  }

  test("as-of join picks the latest click at-or-before each purchase") {
    val r = TemporalJoins.clickAsOfPurchase(events(
      (1L, "2024-01-01 10:00:00", 7L, "click"),
      (2L, "2024-01-01 10:05:00", 7L, "click"),
      (3L, "2024-01-01 10:07:00", 7L, "purchase"),
      (4L, "2024-01-01 10:09:00", 7L, "click"),     // after: must not attach
      (5L, "2024-01-01 09:00:00", 8L, "purchase"))) // no prior click
      .collect().map(r => r.getAs[Long]("purchase_event_id") ->
        Option(r.getAs[java.lang.Long]("click_event_id"))).toMap
    assert(r(3L).contains(2L))
    assert(r(5L).isEmpty)
  }

  test("as-of join sees a click at exactly the purchase timestamp and breaks ts ties on max event_id") {
    val r = TemporalJoins.clickAsOfPurchase(events(
      (1L, "2024-01-01 10:00:00", 7L, "click"),
      (6L, "2024-01-01 10:00:00", 7L, "click"),     // same ts, higher id wins
      (9L, "2024-01-01 10:00:00", 7L, "purchase"))).head
    assert(r.getAs[Long]("click_event_id") == 6L)
    assert(r.getAs[Long]("gap_us") == 0L)
  }

  test("range join keeps only clicks strictly inside the band after the purchase") {
    val r = TemporalJoins.clicksAfterPurchase(events(
      (1L, "2024-01-01 10:00:00", 7L, "purchase"),
      (2L, "2024-01-01 10:00:00", 7L, "click"),  // not strictly after
      (3L, "2024-01-01 10:03:00", 7L, "click"),  // in band
      (4L, "2024-01-01 10:05:00", 7L, "click"),  // inclusive upper edge
      (5L, "2024-01-01 10:06:00", 7L, "click"),  // past band
      (6L, "2024-01-01 10:03:00", 8L, "click")), // other user
      bandMinutes = 5)
      .collect().map(_.getAs[Long]("click_event_id")).toSet
    assert(r == Set(3L, 4L))
  }

  test("exact near-dup emits same-label pairs above the cosine threshold") {
    import spark.implicits._
    val e = Seq(
      (1L, 0, Array(1.0f, 0.0f, 0.0f)),
      (2L, 0, Array(1.0f, 0.001f, 0.0f)),  // ~identical to 1
      (3L, 0, Array(0.0f, 1.0f, 0.0f)),    // orthogonal
      (4L, 1, Array(1.0f, 0.0f, 0.0f)))    // same direction, other label
      .toDF("vec_id", "label", "embedding")
    val pairs = EmbedOps.exactNearDups(e, threshold = 0.9)
      .collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")))
    assert(pairs.toSet == Set((1L, 2L)))
  }

  test("topKNearDups returns the k best pairs per label with output bounded at k") {
    import spark.implicits._
    // label 0 has 4 vectors → 6 pairs; k=2 must keep only the best two,
    // ranked by cosine desc with (vec_a, vec_b) tie-break
    val e = Seq(
      (1L, 0, Array(1.0f, 0.0f, 0.0f)),
      (2L, 0, Array(1.0f, 0.001f, 0.0f)),  // ~identical to 1 → rank 1
      (3L, 0, Array(1.0f, 0.3f, 0.0f)),    // close to 1/2 → rank 2 region
      (4L, 0, Array(0.0f, 1.0f, 0.0f)),    // orthogonal
      (5L, 1, Array(1.0f, 0.0f, 0.0f)),
      (6L, 1, Array(0.9f, 0.1f, 0.0f)))    // label 1's single best pair
      .toDF("vec_id", "label", "embedding")
    val out = EmbedOps.topKNearDups(e, k = 2).collect()
      .map(r => (r.getAs[Int]("label"), r.getAs[Int]("rank")) ->
        (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toMap
    assert(out.count(_._1._1 == 0) == 2) // 6 pairs in block → only k out
    assert(out((0, 1)) == ((1L, 2L)))
    assert(out((1, 1)) == ((5L, 6L)))
  }

  test("native as-of exec matches the window twin's semantics on ties and misses") {
    val r = TemporalJoins.clickAsOfPurchaseNative(events(
      (1L, "2024-01-01 10:00:00", 7L, "click"),
      (2L, "2024-01-01 10:05:00", 7L, "click"),
      (3L, "2024-01-01 10:07:00", 7L, "purchase"),
      (4L, "2024-01-01 10:09:00", 7L, "click"),     // after: must not attach
      (6L, "2024-01-01 10:07:00", 7L, "click"),     // at the purchase ts: visible
      (5L, "2024-01-01 09:00:00", 8L, "purchase"))) // no prior click
      .collect().map(r => r.getAs[Long]("purchase_event_id") ->
        Option(r.getAs[java.lang.Long]("click_event_id"))).toMap
    assert(r(3L).contains(6L)) // the at-ts click wins (<= and newest)
    assert(r(5L).isEmpty)
  }

  test("native as-of plans as AsOfJoinExec with one exchange per side") {
    val df = TemporalJoins.clickAsOfPurchaseNative(events(
      (1L, "2024-01-01 10:00:00", 7L, "click"),
      (2L, "2024-01-01 10:05:00", 7L, "purchase")))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("NestedLoop"))
    // one hash exchange per side, nothing else moves data
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2, plan)
  }

  test("native as-of tolerance nulls stale matches without touching fresh ones") {
    val e = events(
      (1L, "2024-01-01 09:40:00", 7L, "click"),    // 27 min before: stale
      (3L, "2024-01-01 10:07:00", 7L, "purchase"),
      (2L, "2024-01-01 10:00:00", 8L, "click"),    // 7 min before: fresh
      (4L, "2024-01-01 10:07:00", 8L, "purchase"))
    val r = TemporalJoins.clickAsOfPurchaseNative(e, Some(600000000L)) // 10 min
      .collect().map(r => r.getAs[Long]("purchase_event_id") ->
        Option(r.getAs[java.lang.Long]("click_event_id"))).toMap
    assert(r(3L).isEmpty)        // beyond tolerance: attributes nothing
    assert(r(4L).contains(2L))   // inside tolerance: unchanged
    // unbounded form must keep the stale match
    val u = TemporalJoins.clickAsOfPurchaseNative(e)
      .collect().map(r => r.getAs[Long]("purchase_event_id") ->
        Option(r.getAs[java.lang.Long]("click_event_id"))).toMap
    assert(u(3L).contains(1L))
  }

  test("native as-of equals the window twin on a seeded adversarial fixture") {
    // 60 users x dense timestamp collisions across 8 shuffle partitions:
    // every merge-edge at once — equal-ts click+purchase, several equal-ts
    // clicks (tie on event_id), users with no clicks, clicks-only users,
    // multiple purchases sharing one prior click, and purchases at the
    // partition's first row. The window twin is the executable spec.
    // ~2.5% of rows get a NULL timestamp (both clicks and purchases):
    // the contract says a null-ts click never attributes and a null-ts
    // purchase never matches — pinned here against the window twin, so
    // neither engine may rely on implicit NULLS FIRST reasoning alone.
    val rnd = new scala.util.Random(42)
    val rows = (1L to 2000L).map { id =>
      val user = rnd.nextInt(60).toLong
      val t = if (rnd.nextInt(40) == 0) null
        else new Timestamp(1700000000000L + rnd.nextInt(500) * 1000L)
      val typ = if (rnd.nextInt(3) == 0) "purchase" else "click"
      (id, t, user, typ)
    }
    import spark.implicits._
    val e = rows.toDF("event_id", "ts", "user_id", "event_type")
      .repartition(8)
    val native = TemporalJoins.clickAsOfPurchaseNative(e)
      .collect().map(_.toSeq).toSet
    val twin = TemporalJoins.clickAsOfPurchase(e)
      .collect().map(_.toSeq).toSet
    assert(native.size > 100 && native == twin)
    // null-ts purchases are present and all of them attribute nothing
    val nullTs = native.filter(_(2) == null)
    assert(nullTs.nonEmpty && nullTs.forall(_(3) == null))
    // same contract under a tolerance bound (the emit-check null guard):
    // a null-ts purchase must not inherit a carried same-key match
    val tol = TemporalJoins.clickAsOfPurchaseNative(e, Some(500000000000L))
      .collect().map(_.toSeq).toSet
    assert(tol == native) // tolerance covers the whole fixture span
    val tight = TemporalJoins.clickAsOfPurchaseNative(e, Some(10000000L))
      .collect().map(_.toSeq)
    assert(tight.filter(_(2) == null).forall(_(3) == null))
    assert(tight.forall(r => r(5) == null || r(5).asInstanceOf[Long] <= 10000000L))
  }

  test("native as-of is row-identical to the window twin on real data") {
    val d = "/root/testdata/sf0.001"
    val native = SparkEntry.queries("events_asof_native")(spark, d)
      .collect().map(_.toSeq).toSet
    val twin = SparkEntry.queries("events_asof")(spark, d)
      .collect().map(_.toSeq).toSet
    assert(native.nonEmpty && native == twin)
  }

  test("broadcast as-of equals the merge exec on the seeded adversarial fixture") {
    // same fixture class as the native-vs-twin pin: dense ts collisions,
    // null timestamps both sides, no-click users, equal-ts tie breaks —
    // the binary-search prober must pick exactly the row the sorted
    // merge carries, under both tolerance regimes
    val rnd = new scala.util.Random(43)
    val rows = (1L to 2000L).map { id =>
      val user = rnd.nextInt(60).toLong
      val t = if (rnd.nextInt(40) == 0) null
        else new Timestamp(1700000000000L + rnd.nextInt(500) * 1000L)
      val typ = if (rnd.nextInt(3) == 0) "purchase" else "click"
      (id, t, user, typ)
    }
    import spark.implicits._
    val e = rows.toDF("event_id", "ts", "user_id", "event_type")
      .repartition(8)
    val bcast = TemporalJoins
      .clickAsOfPurchaseNative(e, None, broadcastRight = true)
      .collect().map(_.toSeq).toSet
    val merge = TemporalJoins.clickAsOfPurchaseNative(e, None)
      .collect().map(_.toSeq).toSet
    assert(bcast.size > 100 && bcast == merge)
    val bcastTol = TemporalJoins
      .clickAsOfPurchaseNative(e, Some(10000000L), broadcastRight = true)
      .collect().map(_.toSeq).toSet
    val mergeTol = TemporalJoins
      .clickAsOfPurchaseNative(e, Some(10000000L))
      .collect().map(_.toSeq).toSet
    assert(bcastTol == mergeTol)
    // direction sweep on the same fixture: the forward mirror scan and
    // nearest's two-candidate pick must agree across both physical
    // forms, with and without a tolerance bound, and the sign of
    // gap_us must audit the direction (backward >= 0, forward <= 0)
    for (dir <- Seq("forward", "nearest"); tol <- Seq(None, Some(10000000L))) {
      val b = TemporalJoins
        .clickAsOfPurchaseNative(e, tol, broadcastRight = true, dir)
        .collect().map(_.toSeq).toSet
      val m = TemporalJoins
        .clickAsOfPurchaseNative(e, tol, broadcastRight = false, dir)
        .collect().map(_.toSeq).toSet
      assert(b == m, s"dir=$dir tol=$tol: broadcast vs merge diverged")
      if (dir == "forward")
        assert(b.forall(r => r(5) == null || r(5).asInstanceOf[Long] <= 0L))
      tol.foreach(t => assert(b.forall(r =>
        r(5) == null || math.abs(r(5).asInstanceOf[Long]) <= t)))
      assert(b.count(_(3) != null) > 100) // the sweep matched something
    }
    // forward ∪ backward bound nearest: every nearest match is one of
    // the two directional candidates for that purchase
    val fwd = TemporalJoins
      .clickAsOfPurchaseNative(e, None, broadcastRight = false, "forward")
      .collect().map(r => r.getAs[Long]("purchase_event_id") ->
        Option(r.getAs[java.lang.Long]("click_event_id"))).toMap
    val near = TemporalJoins
      .clickAsOfPurchaseNative(e, None, broadcastRight = false, "nearest")
      .collect().map(r => r.getAs[Long]("purchase_event_id") ->
        Option(r.getAs[java.lang.Long]("click_event_id"))).toMap
    val bwd = merge.map(r => r(1).asInstanceOf[Long] ->
      Option(r(3).asInstanceOf[java.lang.Long])).toMap
    assert(near.forall { case (pid, c) =>
      c == bwd(pid) || c == fwd(pid) })
    // and nearest only goes forward when backward is absent or farther
    assert(near.exists { case (pid, c) => c != bwd(pid) })
  }

  test("broadcast as-of plans with zero shuffles and fuses into codegen") {
    val df = TemporalJoins.clickAsOfPurchaseNative(events(
      (1L, "2024-01-01 10:00:00", 7L, "click"),
      (2L, "2024-01-01 10:05:00", 7L, "purchase")), None,
      broadcastRight = true)
    df.collect() // finalize AQE so codegen spans are visible in the plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastAsOfJoin"), plan)
    // the point of the physical form: one broadcast, ZERO shuffles,
    // no sort on either side
    assert(plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(!plan.contains("Sort "), plan)
    // fused into whole-stage codegen (no silent volcano fallback)
    assert("""\*\(\d+\) BroadcastAsOfJoin""".r.findFirstIn(plan).isDefined, plan)
  }

  test("broadcast as-of is row-identical to the window twin on real data, AQE both ways") {
    val d = "/root/testdata/sf0.001"
    val twin = SparkEntry.queries("events_asof")(spark, d)
      .collect().map(_.toSeq).toSet
    val bcast = SparkEntry.queries("events_asof_broadcast")(spark, d)
      .collect().map(_.toSeq).toSet
    assert(bcast.nonEmpty && bcast == twin)
    val prev = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try {
      val aqe = SparkEntry.queries("events_asof_broadcast")(spark, d)
        .collect().map(_.toSeq).toSet
      assert(aqe == twin)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.adaptive.enabled", v)
      case None => spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("sql_asof SQL twin is row-identical to the window-merge as-of join") {
    // the SQL text spells the same union + ordered-window merge the
    // DataFrame twin uses (the correlated LATERAL ... LIMIT 1 form was
    // abandoned: Spark 4.1 plans it as a quadratic
    // BroadcastNestedLoopJoin — see BENCH_TREND r12) — same rows out
    val d = "/root/testdata/sf0.001"
    val sqlRows = SparkEntry.queries("sql_asof")(spark, d)
      .collect().map(_.toSeq).toSet
    val dfRows = SparkEntry.queries("events_asof")(spark, d)
      .collect().map(_.toSeq).toSet
    assert(sqlRows.nonEmpty && sqlRows == dfRows)
  }

  test("broadcast as-of index memo: one build per (broadcast rows, index spec)") {
    import graft.plans.GraftAsOfIndex
    var builds = 0
    def build(): GraftAsOfIndex = {
      builds += 1
      new GraftAsOfIndex(new java.util.HashMap())
    }
    val rows = new Array[org.apache.spark.sql.catalyst.InternalRow](0)
    val a = GraftAsOfIndex.getOrBuild(rows, "specA")(() => build())
    val b = GraftAsOfIndex.getOrBuild(rows, "specA")(() => build())
    assert((a eq b) && builds == 1, "same rows+spec must reuse the index")
    // a DIFFERENT index spec on the SAME broadcast (a reused exchange
    // probed by two as-of joins with different key/ts columns) builds
    // its own index
    val c = GraftAsOfIndex.getOrBuild(rows, "specB")(() => build())
    assert(!(c eq a) && builds == 2)
    // a different row array identity (fresh broadcast / re-deserialized
    // value) rebuilds once
    val rows2 = new Array[org.apache.spark.sql.catalyst.InternalRow](0)
    val d = GraftAsOfIndex.getOrBuild(rows2, "specA")(() => build())
    assert(!(d eq a) && builds == 3)
  }

  test("asof_join TVF reaches the NATIVE operator from SQL text") {
    // the table-valued function (plans/AsOfSql.scala) must plan the
    // custom exec — not the union+window rewrite — and produce exactly
    // the native DataFrame entry's rows
    val d = "/root/testdata/sf0.001"
    val df = SparkEntry.queries("sql_asof_native")(spark, d)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("AsOfJoin"), physical)
    val sqlRows = df.collect().map(_.toSeq).toSet
    val dfRows = SparkEntry.queries("events_asof_native")(spark, d)
      .collect().map(_.toSeq).toSet
    assert(sqlRows.nonEmpty && sqlRows == dfRows)
    // argument validation fails loudly with the argument named
    graft.GraftSql.attach(spark, d)
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM asof_join('purchases_v', 'clicks_v', " +
        "'user_id', 'ts')").collect()
    }
    assert(e.getMessage.contains("asof_join"), e.getMessage)
    // self-join through the TVF: fresh right-side expr ids, no
    // ambiguous-attribute analysis failure
    val self = spark.sql(
      "SELECT * FROM asof_join('purchases_v', 'purchases_v', " +
        "'user_id', 'ts', 'ts')")
    assert(self.collect().nonEmpty)
    // COMPOSABILITY: the name arguments resolve through spark.table,
    // so ANY catalog-resolvable temp view works — including a DERIVED
    // one a user registers over a filtered/projected subquery. Pin it:
    // a filtered view through the TVF equals the DataFrame form over
    // the same filtered frame.
    val purchases = spark.table("purchases_v")
      .filter(org.apache.spark.sql.functions.col("user_id") % 3 === 0)
    purchases.createOrReplaceTempView("purchases_mod3_v")
    val viaView = spark.sql(
      "SELECT * FROM asof_join('purchases_mod3_v', 'clicks_v', " +
        "'user_id', 'ts', 'c_ts')")
    val viaDf = graft.plans.AsOfJoin.asOf(purchases,
      spark.table("clicks_v"), Seq("user_id"), "ts", "c_ts")
    assert(viaView.columns.toSeq == viaDf.columns.toSeq)
    val vRows = viaView.collect().map(_.toSeq).toSet
    assert(vRows.nonEmpty && vRows == viaDf.collect().map(_.toSeq).toSet)
    // ...and the same subquery INLINE via a TABLE(...) argument — no
    // view registration needed (TvfArgs resolves the shipped plan)
    val viaTable = spark.sql(
      "SELECT * FROM asof_join(" +
        "TABLE(SELECT * FROM purchases_v WHERE user_id % 3 = 0), " +
        "'clicks_v', 'user_id', 'ts', 'c_ts')")
    assert(viaTable.collect().map(_.toSeq).toSet == vRows)
    // TABLE-clause decorations are rejected loudly, not ignored — a
    // PARTITION BY the join wouldn't honor must not silently vanish
    val ep = intercept[Exception] {
      spark.sql("SELECT * FROM asof_join(" +
        "TABLE(SELECT * FROM purchases_v) PARTITION BY user_id, " +
        "'clicks_v', 'user_id', 'ts', 'c_ts')").collect()
    }
    assert(ep.getMessage.contains("PARTITION BY"), ep.getMessage)
    spark.catalog.dropTempView("purchases_mod3_v")
  }

  test("range_join TVF plans an equi join with the band as residual, never a cross product") {
    val d = "/root/testdata/sf0.001"
    val df = SparkEntry.queries("sql_range")(spark, d)
    val physical = df.queryExecution.executedPlan
    // an equi join node must carry the key; no cartesian/BNLJ anywhere
    val s = physical.toString
    assert(!s.contains("CartesianProduct") &&
      !s.contains("BroadcastNestedLoopJoin"), s)
    assert(s.contains("Join") && s.contains("user_id"), s)
    // row-identical to the DataFrame range join (same oracle)
    val sqlRows = df.collect().map(_.toSeq).toSet
    val dfRows = SparkEntry.queries("events_range")(spark, d)
      .collect().map(_.toSeq).toSet
    assert(sqlRows.nonEmpty && sqlRows == dfRows)
    // validation: a keyless band join is rejected loudly
    graft.GraftSql.attach(spark, d)
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM range_join('purchases_v', 'clicks_v', '', " +
        "'ts', 'c_ts', 0, 10)").collect()
    }
    assert(e.getMessage.contains("equi key"), e.getMessage)
    // an empty band is rejected too
    val e2 = intercept[Exception] {
      spark.sql("SELECT * FROM range_join('purchases_v', 'clicks_v', " +
        "'user_id', 'ts', 'c_ts', 10, 0)").collect()
    }
    assert(e2.getMessage.contains("empty band"), e2.getMessage)
    // lo == hi is the degenerate band (lo, hi] = ∅ — rejected loudly,
    // not a silently empty join
    val e3 = intercept[Exception] {
      spark.sql("SELECT * FROM range_join('purchases_v', 'clicks_v', " +
        "'user_id', 'ts', 'c_ts', 10, 10)").collect()
    }
    assert(e3.getMessage.contains("empty band"), e3.getMessage)
    // inline TABLE(subquery) arguments compose here too
    val viaTable = spark.sql("SELECT * FROM range_join(" +
      "TABLE(SELECT * FROM purchases_v), 'clicks_v', " +
      "'user_id', 'ts', 'c_ts', 0, 3600000000)")
    assert(viaTable.collect().map(_.toSeq).toSet ==
      spark.sql("SELECT * FROM range_join('purchases_v', 'clicks_v', " +
        "'user_id', 'ts', 'c_ts', 0, 3600000000)")
        .collect().map(_.toSeq).toSet)
  }

  test("asof_join TVF direction argument reaches both non-default probes") {
    val d = "/root/testdata/sf0.001"
    graft.GraftSql.attach(spark, d)
    // 8-arg form: NULL tolerance (unbounded) + a direction literal —
    // must be row-identical to the DataFrame entry of the same direction
    for (dir <- Seq("forward", "nearest")) {
      val sqlRows = spark.sql(
        "SELECT * FROM asof_join('purchases_v', 'clicks_v', 'user_id', " +
          s"'ts', 'c_ts', 'c_eid', NULL, '$dir')")
        .collect().map(_.toSeq).toSet
      val dfRows = graft.plans.AsOfJoin.asOf(
        spark.table("purchases_v"), spark.table("clicks_v"),
        Seq("user_id"), "ts", "c_ts", Seq("c_eid"), None, None, dir)
        .collect().map(_.toSeq).toSet
      assert(sqlRows.nonEmpty && sqlRows == dfRows, s"dir=$dir")
    }
    // a bad direction names the offending value
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM asof_join('purchases_v', 'clicks_v', " +
        "'user_id', 'ts', 'c_ts', 'c_eid', NULL, 'sideways')").collect()
    }
    assert(e.getMessage.contains("sideways"), e.getMessage)
  }
}
