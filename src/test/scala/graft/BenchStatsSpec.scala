package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.BenchStats.{Pass, median, stats}

/** The bench sample-reduction contract: contended-pass exclusion, its
  * two fallbacks, and error propagation — pure functions, no Spark. */
class BenchStatsSpec extends AnyFunSuite {

  private val names = Seq("a", "b")

  test("a pass slower than 2x the fastest is excluded from medians and reported") {
    val passes = Vector(
      Pass(10.0, Map("a" -> 1.0, "b" -> 2.0), Map.empty),
      Pass(50.0, Map("a" -> 9.0, "b" -> 9.0), Map.empty), // contended
      Pass(11.0, Map("a" -> 1.2, "b" -> 2.2), Map.empty))
    val (meds, errs, contended) = stats(names, passes)
    assert(contended == Vector(1))
    assert(errs.isEmpty)
    assert(meds("a") == median(Seq(1.0, 1.2)) && meds("b") == median(Seq(2.0, 2.2)))
  }

  test("uniformly slow passes exclude nothing (all-contended is indistinguishable)") {
    val passes = Vector(
      Pass(10.0, Map("a" -> 1.0), Map.empty),
      Pass(12.0, Map("a" -> 1.5), Map.empty),
      Pass(14.0, Map("a" -> 2.0), Map.empty))
    val (meds, _, contended) = stats(Seq("a"), passes)
    assert(contended.isEmpty)
    assert(meds("a") == 1.5)
  }

  test("a query sampled only inside contended passes keeps its degraded samples") {
    // "b" errored in the clean pass but succeeded in the contended one
    val passes = Vector(
      Pass(10.0, Map("a" -> 1.0), Map("b" -> "boom")),
      Pass(40.0, Map("a" -> 4.0, "b" -> 6.0), Map.empty))
    val (meds, errs, contended) = stats(names, passes)
    assert(contended == Vector(1))
    assert(meds("a") == 1.0)
    assert(meds("b") == 6.0) // degraded data beats no data
    assert(errs.isEmpty)
  }

  test("a query that errors in every pass surfaces as an error, never a timing") {
    val passes = Vector(
      Pass(10.0, Map("a" -> 1.0), Map("b" -> "first failure")),
      Pass(11.0, Map("a" -> 1.1), Map("b" -> "second failure")))
    val (meds, errs, _) = stats(names, passes)
    assert(!meds.contains("b"))
    assert(errs("b") == "first failure")
  }

  test("median of even and odd sample counts") {
    assert(median(Seq(3.0)) == 3.0)
    assert(median(Seq(1.0, 2.0)) == 1.5)
    assert(median(Seq(5.0, 1.0, 3.0)) == 3.0)
  }

  test("empty pass vector yields empty results") {
    assert(stats(names, Vector.empty) == ((Map.empty, Map.empty, Vector.empty)))
  }
}
