package graft

import org.scalatest.funsuite.AnyFunSuite

/** CI gate on the bench adjudicator's verdict chain — the machinery
  * that has produced two false "regressed" verdicts (r13: cold solo
  * child; r15: single witness on a JIT-dispersive row). The chain is
  * pure (Bench.soloVerdict / Bench.confirmRegression), so every
  * branch is pinned here with the real numbers from the incidents
  * that motivated it. No Spark session needed.
  */
class BenchAdjudicatorSpec extends AnyFunSuite {
  private val cpus = 32

  test("band: 1.3x with a 0.25 s absolute floor") {
    assert(Bench.band(1.0) === 1.3)
    assert(Bench.band(0.1) === 0.35) // floor dominates on fast rows
  }

  test("solo_failed: a crashed child never produces a judgment") {
    assert(Bench.soloVerdict(-1.0, 1.0, 2.0, 0, 1.0, cpus, -1, 0.36)
      === "solo_failed")
  }

  test("in_band_solo: clean child inside the band exonerates the context") {
    // r15 graph_common_neighbors_capped: prev 1.463, ctx 2.471,
    // solo 1.843 <= band 1.902
    assert(Bench.soloVerdict(1.843, 1.463, 2.471, 14, 7.96, cpus, -1, 0.36)
      === "in_band_solo")
  }

  test("contended: external load voids the measurement") {
    assert(Bench.soloVerdict(2.0, 1.0, 2.1, 0, cpus * 1.3, cpus, -1, 0.36)
      === "contended")
  }

  test("gc_bound: a collector-dominated min is heap pressure, not plan cost") {
    // 2.0 s min with 600 ms of GC inside it (>25%)
    assert(Bench.soloVerdict(2.0, 1.0, 2.1, 600, 2.0, cpus, -1, 0.36)
      === "gc_bound")
  }

  test("unstable_solo_over_band: a child slower than the context it " +
       "arbitrates cannot convict code") {
    // solo 3.87 > 1.2 x ctx 3.14 (this round's gcn_capped firing)
    assert(Bench.soloVerdict(3.869, 1.463, 3.138, 84, 11.8, cpus, -1, 0.36)
      === "unstable_solo_over_band")
  }

  test("host_drift: a slowed CPU calibration that explains the mover " +
       "blames the box, not the code") {
    // calib 0.36 -> 0.50 (+39%); query 1.0 -> 1.4 (over the 1.3 band,
    // inside the drift-explained bound 1.389*1.25 = 1.74)
    assert(Bench.soloVerdict(1.4, 1.0, 1.42, 0, 1.0, cpus, 0.36, 0.50)
      === "host_drift")
    // same drift but the query tripled: drift does NOT explain it
    assert(Bench.soloVerdict(3.0, 1.0, 3.1, 0, 1.0, cpus, 0.36, 0.50)
      === "regressed")
    // no prior calibration on record: the branch never fires
    assert(Bench.soloVerdict(1.4, 1.0, 1.42, 0, 1.0, cpus, -1.0, 0.50)
      === "regressed")
    // the drift test reads the best CLEAN measurement — the warm ctx
    // min as well as the (cold-premium-carrying) solo: r17's
    // dedup_repeated_spans numbers — calib 0.314->0.364 (+16%),
    // allowance 1.046*1.161*1.25 = 1.518; solo 1.620 misses it but
    // ctx 1.412 is inside -> host_drift, not regressed
    assert(Bench.soloVerdict(1.620, 1.046, 1.412, 11, 7.1, cpus,
      0.314, 0.364) === "host_drift")
    // but when BOTH clean measurements exceed the allowance the
    // drift does not explain the mover
    assert(Bench.soloVerdict(1.620, 1.046, 1.600, 11, 7.1, cpus,
      0.314, 0.364) === "regressed")
  }

  test("regressed requires a concurring second witness") {
    // r15 ann_ivf_kmeans: prev 0.711, first witness 1.062 (verdict0
    // regressed). A second child back inside the band (e.g. this
    // round's measured 0.841 < band 0.961) re-labels it dispersion.
    assert(Bench.soloVerdict(1.062, 0.711, 1.066, 57, 6.3, cpus, -1, 0.36)
      === "regressed") // first witness alone would have convicted
    assert(Bench.confirmRegression(1.062, 0.711, 0.841)
      === "dispersive_across_jvms")
    // both over band but 41% apart: possible regression, magnitude
    // untrustworthy (this round's measured cross-JVM spread)
    assert(Bench.confirmRegression(1.186, 0.711, 1.680)
      === "dispersive_over_band")
    // two concurring children: upheld
    assert(Bench.confirmRegression(1.186, 0.711, 1.100) === "regressed")
    // second witness crashed: keep the single-witness verdict
    assert(Bench.confirmRegression(1.186, 0.711, -1.0) === "regressed")
  }
}
