package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.BenchStats.{Pass, median, stats}

/** The bench sample-reduction contract: contended-pass exclusion, its
  * two fallbacks, and error propagation — pure functions, no Spark. */
class BenchStatsSpec extends AnyFunSuite {

  private val names = Seq("a", "b")

  test("a pass slower than 1.5x the fastest is excluded from medians and reported") {
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
    assert(contended.isEmpty) // 14 < 1.5 * 10
    // no pass excluded, but the per-query trim still drops the single
    // slowest of the 3 samples → median of the remaining two
    assert(meds("a") == median(Seq(1.0, 1.5)))
  }

  test("r11 profile: a 1.67x pass is now excluded at the pass level") {
    // the round-11 static passes — pass 0 at 1.67x the fastest sat
    // under the old 2x threshold (only the per-query trim saved the
    // medians); under the 1.5x cutoff it is excluded outright
    val passes = Vector(
      Pass(112.47, Map("a" -> 1.90, "b" -> 3.03), Map.empty),
      Pass(77.75, Map("a" -> 1.25, "b" -> 1.20), Map.empty),
      Pass(67.19, Map("a" -> 1.20, "b" -> 1.17), Map.empty))
    val (meds, _, contended) = stats(names, passes)
    assert(contended == Vector(0)) // 112.47 > 1.5 * 67.19
    // medians reflect only the two quiet passes
    assert(meds("a") == median(Seq(1.25, 1.20)))
    assert(meds("b") == median(Seq(1.20, 1.17)))
  }

  test("r15 profile: the 1.80x semi-contended pass no longer reaches the medians") {
    // r15's static passes were [283.67, 117.28, 156.03, 86.46]; the
    // 2x rule excluded only pass 0, and pass 2 at 1.80x printed nine
    // phantom per-query regressions on untouched plans. 1.5x excludes
    // both slow passes.
    val passes = Vector(
      Pass(283.67, Map("a" -> 3.0), Map.empty),
      Pass(117.28, Map("a" -> 1.1), Map.empty),
      Pass(156.03, Map("a" -> 1.6), Map.empty),
      Pass(86.46, Map("a" -> 1.0), Map.empty))
    val (meds, _, contended) = stats(Seq("a"), passes)
    assert(contended == Vector(0, 2))
    assert(meds("a") == median(Seq(1.1, 1.0)))
  }

  test("trim needs >= 3 samples: with 2 the max is kept (no optimistic bias)") {
    val passes = Vector(
      Pass(10.0, Map("a" -> 1.0), Map.empty),
      Pass(11.0, Map("a" -> 3.0), Map.empty))
    val (meds, _, _) = stats(Seq("a"), passes)
    assert(meds("a") == median(Seq(1.0, 3.0))) // 2.0, not 1.0
  }

  test("three clean samples keep their true median (trim is outlier-gated, not unconditional)") {
    // r12 advice: an unconditional max-drop on clean samples reports
    // the mean of the two fastest, biasing every committed number low.
    // 1.15 <= 1.2 x median(1.0, 1.1): not an outlier, nothing dropped.
    val passes = Vector(
      Pass(10.0, Map("a" -> 1.0), Map.empty),
      Pass(10.5, Map("a" -> 1.1), Map.empty),
      Pass(10.2, Map("a" -> 1.15), Map.empty))
    val (meds, _, _) = stats(Seq("a"), passes)
    assert(meds("a") == 1.1)
  }

  test("a genuinely slow query (slow in every pass) is untouched by the trim") {
    val passes = Vector(
      Pass(10.0, Map("a" -> 5.0), Map.empty),
      Pass(11.0, Map("a" -> 5.0), Map.empty),
      Pass(12.0, Map("a" -> 5.0), Map.empty))
    val (meds, _, _) = stats(Seq("a"), passes)
    assert(meds("a") == 5.0)
  }

  test("trim drops exactly one instance of the max when tied") {
    val passes = Vector(
      Pass(10.0, Map("a" -> 4.0), Map.empty),
      Pass(11.0, Map("a" -> 4.0), Map.empty),
      Pass(12.0, Map("a" -> 1.0), Map.empty))
    val (meds, _, _) = stats(Seq("a"), passes)
    assert(meds("a") == median(Seq(4.0, 1.0))) // one 4.0 survives
  }

  test("trim applies to the only-contended-data fallback too") {
    val passes = Vector(
      Pass(10.0, Map("a" -> 1.0), Map.empty),
      Pass(40.0, Map("b" -> 9.0), Map.empty), // contended
      Pass(41.0, Map("b" -> 6.0), Map.empty), // contended
      Pass(42.0, Map("b" -> 6.5), Map.empty)) // contended
    val (meds, _, contended) = stats(names, passes)
    assert(contended == Vector(1, 2, 3))
    assert(meds("b") == median(Seq(6.0, 6.5))) // 9.0 trimmed
  }

  test("ladder flag rule: the r15 q18 knee flags on last-segment alpha where the full fit masks it") {
    import graft.tools.ScaleLadderStats.{alpha, segAlpha}
    // r15's measured q18_large_orders rung walls (scale_ladder_100x):
    // a 30x->100x knee the full least-squares fit dilutes to 0.87
    val walls = Seq(1 -> 1.124, 3 -> 1.251, 10 -> 1.976,
      30 -> 3.464, 100 -> 30.141)
    val a = alpha(walls)
    val sa = segAlpha(walls)
    assert(a < 1.3, s"full fit masks the knee: $a") // the r15 blind spot
    assert(sa > 1.3, s"last-segment alpha must catch it: $sa") // ~1.80
    assert(math.abs(sa - 1.796) < 0.01, sa.toString)
    // a genuinely linear curve flags on neither
    val linear = Seq(1 -> 0.5, 3 -> 1.5, 10 -> 5.0, 30 -> 15.0, 100 -> 50.0)
    assert(alpha(linear) <= 1.01 && segAlpha(linear) <= 1.01)
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

  test("r17 profile: a whole-run drift's regression flag is adjudicated environmental by its quiet re-probe") {
    // BENCH_r17: text_perplexity committed prior 1.75 s, drifted main
    // median 38.48 s (every pass slow — pass-level exclusion blind);
    // the judge's quiet re-measure read 1.56-1.76 s. The adjudication
    // rule must clear the flag from the quiet estimate...
    assert(BenchStats.regressed(1.75, 38.48))
    assert(BenchStats.environmental(1.75, 1.66))
    // ...and a REAL regression (slow on every run incl. the re-probe)
    // must survive
    assert(!BenchStats.environmental(1.75, 38.0))
    // boundary: the clearing rule is EXACTLY the flagging rule
    assert(BenchStats.environmental(1.75, 1.75 * 1.5))
    assert(!BenchStats.environmental(1.75, 1.75 * 1.5 + 0.26))
    // small-absolute drift never flags (the 0.25 s floor)
    assert(!BenchStats.regressed(0.05, 0.12))
    assert(BenchStats.environmental(0.05, 0.12))
  }

  test("r19 band rule: a noisy prior's spread widens the flag line; a stable prior keeps the classic rule") {
    // r18 profile: 14+7 environmental flags, all sub-second queries
    // flagged against a point prior from one exceptionally quiet run.
    // The committed prior now carries its own spread (max−min of the
    // samples behind the median) and a flag must ALSO clear
    // prior + 2×spread.
    // prior 0.50 s committed from a quiet run whose samples spanned
    // 0.45–0.95 s (spread 0.50): a 0.94 s re-measure is inside the
    // prior's own band — not a flag
    assert(BenchStats.regressed(0.50, 0.94))         // classic rule fires
    assert(!BenchStats.regressedBand(0.50, 0.50, 0.94)) // band absorbs it
    // a genuine 3× jump clears the band too and still flags
    assert(BenchStats.regressedBand(0.50, 0.50, 1.60))
    // spread 0 (or an artifact without the field) = exactly the
    // classic rule, both directions
    assert(BenchStats.regressedBand(0.50, 0.0, 0.94) ==
      BenchStats.regressed(0.50, 0.94))
    assert(BenchStats.regressedBand(1.75, 0.0, 1.75 * 1.5) ==
      BenchStats.regressed(1.75, 1.75 * 1.5))
    // the 0.25 s absolute floor survives the band form
    assert(!BenchStats.regressedBand(0.05, 0.0, 0.12))
  }

  test("r19 environmental rule: the re-probe median must clear too (intermittently-fast real regressions survive)") {
    // ADVICE r18: quietEst = the single fastest sample ever observed,
    // and the re-probe runs in a fully-warmed session — a regression
    // that runs fast ONCE was cleared and its prior rewritten
    // downward. The decision now requires BOTH the quiet min and the
    // re-probe MEDIAN to clear the band rule. Modelled here directly
    // on the rule the Bench.adjudicate closure applies:
    def env(prior: Double, spread: Double, quietMin: Double,
        reprobeMed: Double): Boolean =
      !BenchStats.regressedBand(prior, spread, quietMin) &&
        !BenchStats.regressedBand(prior, spread, reprobeMed)
    // truly environmental: both statistics back at the prior
    assert(env(1.75, 0.0, 1.66, 1.80))
    // intermittent real regression: one fluke-fast sample, median
    // still 2.5× the prior → SURVIVES (was cleared by the min rule)
    assert(!env(1.75, 0.0, 1.66, 4.40))
    // steady real regression survives on both statistics
    assert(!env(1.75, 0.0, 4.20, 4.40))
  }

  test("dispersion: max over median of the surviving samples") {
    assert(BenchStats.dispersion(Seq(1.0, 1.1, 22.0)) > 2.0)
    assert(BenchStats.dispersion(Seq(1.0, 1.1, 1.2)) < 1.3)
    // one sample (or none) can't disagree with itself
    assert(BenchStats.dispersion(Seq(5.0)) == 1.0)
    assert(BenchStats.dispersion(Nil) == 1.0)
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
