package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.window.WindowExec

import graft.ext.Analytics

/** Corner-case behavior of the round-13 TPC-H-shaped queries (Q13/Q15/
  * Q17/Q21/Q22) on tiny controlled frames. The oracle gate pins full
  * values at sf0.01; these pin the semantics the oracle could mask —
  * tie handling, strict boundaries, zero-count buckets — where a
  * plausible-but-wrong rewrite would still produce nonempty output. */
class TpchShapesSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  test("q21 counts only the sole latest shipper of multi-supplier finished orders") {
    import spark.implicits._
    val orders = Seq(
      (1L, "F"), // supp 10 strictly latest → counted
      (2L, "F"), // supps 10/11 tie at max → nobody counted
      (3L, "F"), // single supplier → not multi-supplier
      (4L, "O")  // open order → excluded by status
    ).toDF("o_orderkey", "o_orderstatus")
    val lineitem = Seq(
      (1L, 10L, ts("1995-01-05")), (1L, 11L, ts("1995-01-03")),
      (2L, 10L, ts("1995-02-05")), (2L, 11L, ts("1995-02-05")),
      (3L, 12L, ts("1995-03-01")),
      (4L, 10L, ts("1995-04-05")), (4L, 11L, ts("1995-04-01"))
    ).toDF("l_orderkey", "l_suppkey", "l_shipdate")
    val supplier = Seq((10L, "Supp#10"), (11L, "Supp#11"), (12L, "Supp#12"))
      .toDF("s_suppkey", "s_name")
    val out = Analytics.waitingSuppliers(supplier, orders, lineitem)
      .collect().map(r => r.getAs[String]("s_name") -> r.getAs[Long]("numwait"))
    assert(out.toSeq == Seq("Supp#10" -> 1L))
  }

  test("q17 boundary: quantity exactly at 20% of the part average is excluded") {
    import spark.implicits._
    val part = Seq((1L, "Brand#4")).toDF("p_partkey", "p_brand")
    // sum=50.0, cnt=5 → strict threshold qty < 2.0: the 1.9 row is in,
    // the exact-boundary 2.0 row is out (5·qty·cnt < sum is strict)
    val lineitem = Seq(
      (1L, 1.9, 100.0), (1L, 2.0, 999.0), (1L, 16.0, 999.0),
      (1L, 14.0, 999.0), (1L, 16.1, 999.0)
    ).toDF("l_partkey", "l_quantity", "l_extendedprice")
    val r = Analytics.smallQuantityRevenue(part, lineitem, brand = "Brand#4")
      .collect().head
    assert(r.getAs[Long]("n_lines") == 1L)
    assert(r.getAs[String]("small_qty_revenue") == "100.00")
  }

  test("q15 emits every supplier tied at the exact global max, without a global window") {
    import spark.implicits._
    val supplier = Seq((1L, "Supp#1"), (2L, "Supp#2"), (3L, "Supp#3"))
      .toDF("s_suppkey", "s_name")
    // supp 1: 100.00 in one line; supp 2: 100.00 across two lines
    // (decimal sums compare exactly, so both tie); supp 3 trails
    val lineitem = Seq(
      (1L, ts("1996-02-01"), 100.0, 0.0),
      (2L, ts("1996-02-01"), 40.0, 0.0), (2L, ts("1996-03-01"), 60.0, 0.0),
      (3L, ts("1996-02-01"), 50.0, 0.0),
      (1L, ts("1995-06-01"), 9999.0, 0.0) // outside the quarter
    ).toDF("l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    val df = Analytics.topSupplier(supplier, lineitem)
    // scalar-max broadcast, NOT an unpartitioned window (would single-task)
    assert(df.queryExecution.executedPlan.collect { case w: WindowExec => w }.isEmpty)
    val out = df.collect()
      .map(r => r.getAs[Long]("s_suppkey") -> r.getAs[String]("total_revenue"))
    assert(out.toSeq == Seq(1L -> "100.0000", 2L -> "100.0000"))
  }

  test("q13 lands zero-order customers in the c_count=0 bucket via the left join") {
    import spark.implicits._
    val customer = Seq(1L, 2L, 3L).toDF("c_custkey")
    val orders = Seq(
      (101L, 1L, "1-URGENT"), (102L, 1L, "3-MEDIUM"),
      (103L, 2L, "4-NOT SPECIFIED") // filtered → cust 2 counts as zero
    ).toDF("o_orderkey", "o_custkey", "o_orderpriority")
    val out = Analytics.customerOrderDistribution(customer, orders)
      .collect().map(r => r.getAs[Long]("c_count") -> r.getAs[Long]("custdist"))
    assert(out.toSeq == Seq(0L -> 2L, 2L -> 1L))
  }

  test("q22 requires strictly-above-average balance and no recent orders") {
    import spark.implicits._
    val nation = Seq((1, "NATION_1")).toDF("n_nationkey", "n_name")
    // positive balances 10/20/30/40 → avg 20; the -5 row is excluded
    // from the average (and can never pass bal·cnt > sum)
    val customer = Seq(
      (1L, 1, 10.0),  // below average
      (2L, 1, 20.0),  // exactly average → excluded (strict >)
      (3L, 1, 30.0),  // above average but has a recent order
      (4L, 1, 40.0),  // above average, dormant → the one survivor
      (5L, 1, -5.0)
    ).toDF("c_custkey", "c_nationkey", "c_acctbal")
    val orders = Seq((3L, ts("1999-06-01"))).toDF("o_custkey", "o_orderdate")
    val out = Analytics.dormantValueCustomers(nation, customer, orders)
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("numcust") == 1L)
    assert(out.head.getAs[String]("totacctbal") == "40.00")
  }
}
