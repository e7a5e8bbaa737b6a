package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.AsOfJoin

/** Seeded randomized equivalence harness for the native as-of join
  * and its Catalyst integration: random key/timestamp/null shapes,
  * random tolerance and tie configuration, random deterministic
  * filters above the join (left bounds, key predicates, right
  * null-tests — the surface [[graft.plans.AsOfPushdown]] rewrites,
  * including the r14 right-time-bound derivation), checked three ways
  * on every shape:
  *
  *  1. pushdown ON ≡ pushdown OFF (the optimizer rule is
  *     answer-preserving under arbitrary predicate mixes);
  *  2. merge exec ≡ broadcast exec (two physical forms, one
  *     contract);
  *  3. both ≡ the union+window reference rewrite computed per shape
  *     (an independent oracle, not the operator under test).
  *
  * Timestamps are longs (the merge compares raw micros), payloads are
  * integers — all comparisons exact. Seeded: a failure reproduces. */
class AsOfPropertySpec extends SparkSpec {

  private def windowTwin(left: DataFrame, right: DataFrame): DataFrame = {
    // union + ordered window reference: last right row at-or-before,
    // ties to max tie column — TemporalJoins' spelling, generic cols
    import org.apache.spark.sql.expressions.Window
    val l = left.select(col("k"), col("ts"), col("lid"),
      lit(0L).as("side"), lit(null).cast("long").as("m_ts"),
      lit(null).cast("long").as("m_tie"), lit(null).cast("long").as("m_pay"))
    val r = right.filter(col("r_ts").isNotNull)
      .select(col("k"), col("r_ts").as("ts"), lit(null).cast("long").as("lid"),
        lit(-1L).as("side"), col("r_ts").as("m_ts"), col("tie").as("m_tie"),
        col("pay").as("m_pay"))
    val w = Window.partitionBy(col("k"))
      .orderBy(col("ts"), col("side"), col("m_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn("w_ts", last(col("m_ts"), ignoreNulls = true).over(w))
      .withColumn("w_tie", last(col("m_tie"), ignoreNulls = true).over(w))
      .withColumn("w_pay", last(col("m_pay"), ignoreNulls = true).over(w))
      .filter(col("side") === 0L)
      .select(col("k"), col("ts"), col("lid"),
        col("w_ts").as("r_ts"), col("w_tie").as("tie"), col("w_pay").as("pay"))
  }

  test("18 seeded shapes x 3 directions: execs, pushdown and a JVM reference agree") {
    import spark.implicits._
    val rnd = new scala.util.Random(1502L)
    for (i <- 0 until 18; dirName <- Seq("backward", "forward", "nearest")) {
      val nulls = rnd.nextBoolean()
      val tol = if (rnd.nextBoolean()) Some(5L + rnd.nextInt(20)) else None
      val nl = 20 + rnd.nextInt(40)
      val nr = 10 + rnd.nextInt(30)
      def key(): Option[Long] =
        if (nulls && rnd.nextInt(8) == 0) None else Some(rnd.nextInt(5).toLong)
      def ts(): Option[Long] =
        if (nulls && rnd.nextInt(10) == 0) None else Some(rnd.nextInt(60).toLong)
      val lRows = Seq.tabulate(nl)(j => (key(), ts(), j.toLong))
      val rRows = Seq.tabulate(nr)(j =>
        (key(), ts(), j.toLong, (j * 7 % 100).toLong))
      val left = lRows.toDF("k", "ts", "lid")
      val right = rRows.toDF("k", "r_ts", "tie", "pay")

      // random deterministic filters above the join — the pushdown
      // rule's direction-aware time-bound derivations fire here
      val preds = Seq(
        () => col("ts") <= lit(20L + rnd.nextInt(30).toLong),
        () => col("ts") >= lit(rnd.nextInt(20).toLong),
        () => col("k") === lit(rnd.nextInt(5).toLong),
        () => col("pay").isNull || col("pay") >= 0L,
        () => col("lid") % 3 =!= 0)
      val chosen = Seq.fill(rnd.nextInt(3))(preds(rnd.nextInt(preds.length))())
      def filtered(df: DataFrame): DataFrame =
        chosen.foldLeft(df)((d, p) => d.filter(p))

      def native(bcast: Boolean): Set[Seq[Any]] =
        filtered(AsOfJoin.asOf(left, right, Seq("k"), "ts", "r_ts",
          Seq("tie"), tol, Some(bcast), dirName))
          .collect().map(_.toSeq).toSet

      // plain-JVM reference: independent of every Spark code path.
      // Null keys cluster (None == None); null timestamps never match.
      // backward = max (r_ts, tie) among r_ts <= ts; forward = min
      // (r_ts, tie) among r_ts >= ts; nearest compares the backward
      // candidate with the min STRICTLY-after row (an equal-ts row is
      // backward's, at distance 0) and hands distance ties backward.
      val refRows = lRows.map { case (k, lts, lid) =>
        val cands = rRows.filter(r => r._1 == k && r._2.isDefined)
        val m: Option[(Long, Long, Long)] = lts.flatMap { t =>
          def within(d: Long) = tol.forall(d <= _)
          val b = cands.filter(_._2.get <= t)
            .sortBy(r => (r._2.get, r._3)).lastOption
            .filter(r => within(t - r._2.get))
          val fPool =
            if (dirName == "forward") cands.filter(_._2.get >= t)
            else cands.filter(_._2.get > t)
          val f = fPool.sortBy(r => (r._2.get, r._3)).headOption
            .filter(r => within(r._2.get - t))
          val pick = dirName match {
            case "backward" => b
            case "forward" => f
            case "nearest" => (b, f) match {
              case (Some(rb), Some(rf)) =>
                if (t - rb._2.get <= rf._2.get - t) Some(rb) else Some(rf)
              case (bb, ff) => bb.orElse(ff)
            }
          }
          pick.map(r => (r._2.get, r._3, r._4))
        }
        (k, lts, lid, m.map(_._1), m.map(_._2), m.map(_._3))
      }
      val reference = filtered(
        refRows.toDF("k", "ts", "lid", "r_ts", "tie", "pay"))
        .collect().map(_.toSeq).toSet

      val merge = native(bcast = false)
      val broadcast = native(bcast = true)
      assert(merge == broadcast,
        s"shape $i dir=$dirName: merge vs broadcast diverged (tol=$tol " +
          s"nulls=$nulls)")
      assert(merge == reference,
        s"shape $i dir=$dirName: native diverged from the JVM reference " +
          s"(tol=$tol nulls=$nulls):\n native=$merge\n ref=$reference")
      spark.conf.set("spark.graft.optimizer.asofPushdown", "false")
      try assert(native(bcast = false) == merge,
        s"shape $i dir=$dirName: pushdown changed the answer")
      finally spark.conf.unset("spark.graft.optimizer.asofPushdown")
    }
  }

  test("30 seeded as-of shapes: pushdown/merge/broadcast/window all agree") {
    import spark.implicits._
    val rnd = new scala.util.Random(1402L)
    for (i <- 0 until 30) {
      val nulls = rnd.nextBoolean()
      val tol = if (rnd.nextBoolean()) Some(5L + rnd.nextInt(20)) else None
      val nl = 20 + rnd.nextInt(40)
      val nr = 10 + rnd.nextInt(30)
      def key(): Option[Long] =
        if (nulls && rnd.nextInt(8) == 0) None else Some(rnd.nextInt(5).toLong)
      def ts(): Option[Long] =
        if (nulls && rnd.nextInt(10) == 0) None else Some(rnd.nextInt(60).toLong)
      val left = Seq.tabulate(nl)(j => (key(), ts(), j.toLong))
        .toDF("k", "ts", "lid")
      val right = Seq.tabulate(nr)(j =>
        (key(), ts(), j.toLong, (j * 7 % 100).toLong))
        .toDF("k", "r_ts", "tie", "pay")

      // random deterministic filter above the join, from the pushdown
      // rule's whole surface (left bounds derive right time bounds
      // when tolerance is set)
      val preds = Seq(
        () => col("ts") <= lit(20L + rnd.nextInt(30).toLong),
        () => col("ts") >= lit(rnd.nextInt(20).toLong),
        () => col("k") === lit(rnd.nextInt(5).toLong),
        () => col("k") < lit(1L + rnd.nextInt(4).toLong),
        () => col("pay").isNull || col("pay") >= 0L, // right-referencing
        () => col("lid") % 3 =!= 0)
      val nPred = rnd.nextInt(3)
      val chosen = Seq.fill(nPred)(preds(rnd.nextInt(preds.length))())
      def filtered(df: DataFrame): DataFrame =
        chosen.foldLeft(df)((d, p) => d.filter(p))

      def native(bcast: Boolean): Set[Seq[Any]] =
        filtered(AsOfJoin.asOf(left, right, Seq("k"), "ts", "r_ts",
          Seq("tie"), tol, Some(bcast)))
          .collect().map(_.toSeq).toSet

      val merge = native(bcast = false)
      val broadcast = native(bcast = true)
      assert(merge == broadcast,
        s"shape $i: merge vs broadcast diverged (tol=$tol nulls=$nulls " +
          s"preds=$nPred)")
      spark.conf.set("spark.graft.optimizer.asofPushdown", "false")
      try {
        val noPush = native(bcast = false)
        assert(merge == noPush, s"shape $i: pushdown changed the answer")
      } finally spark.conf.unset("spark.graft.optimizer.asofPushdown")
      // independent union+window oracle (tolerance applied after — the
      // twin carries the matched ts, so the freshness bound is a plain
      // column comparison)
      val twin = filtered(windowTwin(left, right)
        .withColumn("stale", tol.map(t =>
          col("r_ts").isNull || col("ts") - col("r_ts") > t)
          .getOrElse(lit(false)))
        .select(col("k"), col("ts"), col("lid"),
          when(col("stale"), lit(null)).otherwise(col("r_ts")).as("r_ts"),
          when(col("stale"), lit(null)).otherwise(col("tie")).as("tie"),
          when(col("stale"), lit(null)).otherwise(col("pay")).as("pay")))
        .collect().map(_.toSeq).toSet
      assert(merge == twin,
        s"shape $i: native diverged from the window oracle (tol=$tol " +
          s"nulls=$nulls preds=$nPred):\n native=$merge\n twin=$twin")
    }
  }
}
