package graft

import org.apache.spark.sql.functions._

/** Pins the driver-barrier budget of the iterative graph operators.
  *
  * The r10→r11 fix collapsed each PageRank/CC round to ONE scheduled
  * job (the round's localCheckpoint, with the dangling-mass sum and
  * the convergence/fixed-point flag riding it as observe() side
  * aggregates). Barrier count is the quantity host contention
  * amplifies non-linearly (the r10 driver run turned ~10 serial
  * barriers into a 20.9× blowup), so it is asserted directly: a
  * regression that re-introduces per-round probe jobs, anti-join
  * aggregates, or broadcast builds fails here long before a benchmark
  * would notice.
  *
  * Counting mechanism: jobs are tagged with a job group and counted
  * through the public status tracker. Listener-bus delivery is async,
  * so the count is polled until stable.
  */
class BarrierCountSpec extends SparkSpec {

  private def jobsIn(group: String)(body: => Unit): Int = {
    val sc = spark.sparkContext
    // AQE materializes every shuffle stage as its own tracked job,
    // which would count stages, not driver barriers. The contention
    // incident this spec guards against was the AQE-OFF static path
    // (Bench pins static plans), so count under the same mode.
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled")
    val bcWas = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // auto-broadcast builds submit their own collect jobs on these
    // tiny test frames; at the operator's design scale both join sides
    // are large (sort-merge), so broadcast-build jobs are measurement
    // noise here, not part of the operator's barrier structure
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    sc.setJobGroup(group, group, interruptOnCancel = false)
    try body finally {
      sc.clearJobGroup()
      spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcWas)
    }
    // listener-bus delivery is async: poll until the count is stable
    var last = -1
    var cur = sc.statusTracker.getJobIdsForGroup(group).length
    var spins = 0
    while (cur != last && spins < 100) {
      last = cur
      Thread.sleep(50)
      cur = sc.statusTracker.getJobIdsForGroup(group).length
      spins += 1
    }
    cur
  }

  test("pageRank at iters=3 schedules at most iters + 2 jobs (count, init, one per round)") {
    import spark.implicits._
    val nodes = (0L to 5L).toDF("id")
    val pairs = Seq((0L, 1L), (1L, 2L), (3L, 4L)).toDF("a", "b")
    val n = jobsIn("pr-barriers") {
      graft.ext.Graph.pageRank(nodes, pairs, iters = 3).count()
    }
    // budget: nodes.count + initial rank checkpoint + 3 round
    // checkpoints + the final count action = 6; anything above means a
    // per-round job crept back in (probe, dangling anti-join,
    // broadcast build — the pre-r11 shape was ~4 jobs/round)
    assert(n <= 6, s"pageRank scheduled $n jobs; the 1-barrier-per-round contract allows 6")
  }

  test("connected components schedules one job per round (plus the final action)") {
    import spark.implicits._
    // a 2-edge chain: labels settle in round 1, round 2 observes no
    // change and exits — 2 rounds total
    val nodes = (0L to 2L).toDF("id")
    val pairs = Seq((0L, 1L), (1L, 2L)).toDF("a", "b")
    val n = jobsIn("cc-barriers") {
      graft.ext.Graph.connectedComponents(nodes, pairs).count()
    }
    // budget: 2 round checkpoints + final count = 3; pre-r11 each
    // round also ran a separate isEmpty probe job
    assert(n <= 3, s"connectedComponents scheduled $n jobs; expected at most 3")
  }
}
