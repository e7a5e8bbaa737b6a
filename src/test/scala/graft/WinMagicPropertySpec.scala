package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.functions._

/** Seeded randomized equivalence harness for the WinMagic rewrite:
  * generate join-back shapes across the rule's whole decision surface
  * — join type, 1/2 grouping keys, nullable keys, aggregate subsets,
  * residual join predicates, shared vs left-only upstream filters —
  * and require the rewrite-on answer to equal the kill-switched
  * (join-back) answer EXACTLY on every shape, whether the rule fired
  * or declined. Values are integer-valued doubles, so sums are exact
  * in IEEE754 and set equality is legitimate.
  *
  * The generator is seeded (no library randomness at plan time — the
  * data is materialized before any plan is built), so a failure
  * reproduces; the fire-count floor guards against the generator
  * drifting into always-declining shapes, which would make the
  * equivalence check vacuous. */
class WinMagicPropertySpec extends SparkSpec {

  private def joins(df: DataFrame) =
    df.queryExecution.optimizedPlan.collect { case j: Join => j }

  test("40 seeded random join-back shapes: rewrite-on equals kill-switch") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)
    var fired = 0
    for (i <- 0 until 40) {
      val n = 30 + rnd.nextInt(50)
      val nullKeys = rnd.nextBoolean()
      val twoKeys = rnd.nextBoolean()
      val rows = Seq.tabulate(n) { _ =>
        val k: Option[Long] =
          if (nullKeys && rnd.nextInt(10) == 0) None
          else Some(rnd.nextInt(8).toLong)
        (k, rnd.nextInt(100).toDouble, rnd.nextInt(3))
      }
      val base = rows.toDF("k", "x", "g")
      val keys: Seq[String] = if (twoKeys) Seq("k", "g") else Seq("k")
      val joinType = if (rnd.nextBoolean()) "inner" else "left"
      // upstream filters: shared (both sides see it) and/or left-only
      val shared = rnd.nextBoolean()
      val leftOnly = rnd.nextBoolean()
      val residual = rnd.nextBoolean()
      // aggregate subset — always include sum so a residual can bind
      val aggCols = Seq(
        sum("x").as("s"),
        count(lit(1)).as("c"),
        min("x").as("mn"),
        max("x").as("mx"),
        avg("x").as("a")).take(1 + rnd.nextInt(5))

      def build(): DataFrame = {
        val src = if (shared) base.filter(col("x") > 5.0) else base
        val agg = src.groupBy(keys.map(col): _*).agg(aggCols.head,
          aggCols.tail: _*)
        val left = if (leftOnly) src.filter(col("g") < 2) else src
        val joined = left.join(agg, keys, joinType)
        if (residual && joinType == "inner")
          joined.filter(col("x") * 2 < col("s") + 50.0)
        else joined
      }
      val on = build()
      if (joins(on).isEmpty) fired += 1
      val onRows = on.collect().map(_.toSeq).toSet
      spark.conf.set("spark.graft.optimizer.winmagic", "false")
      try {
        val off = build()
        assert(joins(off).nonEmpty, s"shape $i: kill switch must keep the join")
        val offRows = off.collect().map(_.toSeq).toSet
        assert(onRows == offRows,
          s"shape $i diverged (type=$joinType keys=$keys nullKeys=$nullKeys " +
            s"shared=$shared leftOnly=$leftOnly residual=$residual " +
            s"aggs=${aggCols.size}):\n on=$onRows\n off=$offRows")
      } finally spark.conf.unset("spark.graft.optimizer.winmagic")
    }
    assert(fired >= 10,
      s"only $fired/40 shapes rewrote — the generator stopped covering " +
        "the firing surface")
  }
}
