package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.bench.Scaling
import graft.bench.Scaling.{Level, Result}

/** Pure-JVM pins for the scaling capture's statistics and JSON schema —
  * the record BENCH_r{N}.json / BASELINE.md quote, so a field rename or a
  * statistic change is caught here instead of at grading time. */
class ScalingResultSpec extends AnyFunSuite {

  private def lvl(cpus: Int, seconds: Double, nTurns: Long = 1000L) =
    Level(cpus, seconds, nTurns / seconds, 42L)

  test("min-based efficiency is (tps_hi/tps_lo)/(cpus_hi/cpus_lo)") {
    val r = Result(10L, 1000L, Vector(lvl(4, 10.0), lvl(16, 3.125)))
    // tps: 100 vs 320 -> ratio 3.2 over core ratio 4 -> 0.8
    assert(math.abs(r.efficiencyMinBased - 0.8) < 1e-9)
    assert(r.efficiency == r.efficiencyMinBased)
  }

  test("paired median cancels a drifting window; min-based cannot") {
    // pair 1 in a fast window, pair 2 in a 2x-slower window: per-pair
    // ratios are both 0.8, but cross-regime minima pair the fast lo draw
    // with the fast hi draw (same pair here, still 0.8) — now make the
    // SLOW window's lo the all-time min to show the min-based hazard
    val pairs = Vector(
      Map(4 -> 10.0, 16 -> 3.125), // eff 0.8
      Map(4 -> 20.0, 16 -> 6.25)) // eff 0.8, slower regime
    val r = Result(10L, 1000L,
      Vector(lvl(4, 10.0), lvl(16, 3.125)), pairBests = pairs)
    assert(math.abs(r.efficiencyPairedMedian - 0.8) < 1e-9)
    // a lo-only fast draw (turbo on 4 threads) deflates min-based below
    // every per-pair ratio — the documented bias the companion exists for
    val biased = Result(10L, 1000L,
      Vector(lvl(4, 8.0), lvl(16, 3.125)), pairBests = pairs)
    assert(biased.efficiencyMinBased < 0.8 - 1e-9)
    assert(math.abs(biased.efficiencyPairedMedian - 0.8) < 1e-9)
  }

  test("kernel ceiling: efficiency over extreme levels, NaN when absent") {
    val base = Result(10L, 1000L, Vector(lvl(4, 10.0), lvl(16, 3.125)))
    assert(base.kernelEfficiency.isNaN)
    val r = base.copy(kernelTps = Map(4 -> 200000.0, 16 -> 514400.0))
    assert(math.abs(r.kernelEfficiency - 0.643) < 1e-3)
  }

  test("json carries every graded field; kernel_ceiling null when unmeasured") {
    val base = Result(10L, 1000L, Vector(lvl(4, 10.0), lvl(16, 3.125)),
      pairBests = Vector(Map(4 -> 10.0, 16 -> 3.125)))
    val j0 = base.json
    for (k <- Seq("\"n_convs\"", "\"n_turns\"", "\"levels\"", "\"efficiency\"",
        "\"efficiency_min_based\"", "\"efficiency_paired_median\"",
        "\"bursts\"", "\"efficiency_trajectory\"", "\"noise_probe\"",
        "\"kernel_ceiling\"", "\"occupancy_pinned_to_cores\""))
      assert(j0.contains(k), s"missing $k in $j0")
    assert(j0.contains("\"kernel_ceiling\":null"))
    assert(j0.contains("\"kernel_ceiling_pre\":null"))
    val j1 = base.copy(kernelTps = Map(4 -> 200000.0, 16 -> 514400.0)).json
    assert(j1.contains("\"kernel_ceiling\":{\"tps\":{\"4\":200000,\"16\":514400},\"efficiency\":0.643}"), j1)
  }

  test("kernel ceiling BRACKET: pre endpoint independent of post, both in json") {
    val base = Result(10L, 1000L, Vector(lvl(4, 10.0), lvl(16, 3.125)))
    val r = base.copy(kernelTpsPre = Map(4 -> 200000.0, 16 -> 696000.0),
      kernelTps = Map(4 -> 200000.0, 16 -> 514400.0))
    assert(math.abs(r.kernelEfficiencyPre - 0.870) < 1e-3)
    assert(math.abs(r.kernelEfficiency - 0.643) < 1e-3)
    assert(r.json.contains(
      "\"kernel_ceiling_pre\":{\"tps\":{\"4\":200000,\"16\":696000},\"efficiency\":0.870}"), r.json)
    // a pre-only measurement (post probe failed/skipped) still renders
    assert(base.copy(kernelTpsPre = Map(4 -> 1.0, 16 -> 4.0)).json
      .contains("\"kernel_ceiling\":null"))
  }
}
