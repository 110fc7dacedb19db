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
    assert(Bench.soloVerdict(-1.0, 1.0, 2.0, 0, 1.0, cpus)
      === "solo_failed")
  }

  test("in_band_solo: clean child inside the band exonerates the context") {
    // r15 graph_common_neighbors_capped: prev 1.463, ctx 2.471,
    // solo 1.843 <= band 1.902
    assert(Bench.soloVerdict(1.843, 1.463, 2.471, 14, 7.96, cpus)
      === "in_band_solo")
  }

  test("contended: external load voids the measurement") {
    assert(Bench.soloVerdict(2.0, 1.0, 2.1, 0, cpus * 1.3, cpus)
      === "contended")
  }

  test("gc_bound: a collector-dominated min is heap pressure, not plan cost") {
    // 2.0 s min with 600 ms of GC inside it (>25%)
    assert(Bench.soloVerdict(2.0, 1.0, 2.1, 600, 2.0, cpus)
      === "gc_bound")
  }

  test("unstable_solo_over_band: a child slower than the context it " +
       "arbitrates cannot convict code") {
    // solo 3.87 > 1.2 x ctx 3.14 (this round's gcn_capped firing)
    assert(Bench.soloVerdict(3.869, 1.463, 3.138, 84, 11.8, cpus)
      === "unstable_solo_over_band")
  }

  test("calibAdjust: a pure-calib-shift round produces zero movers") {
    // r16->r17 incident: cpu_calib 0.314->0.365 (+16%) moved the whole
    // 48-query board one-for-one and every "mover" was host drift.
    // With the band normalized by the calib ratio, a board where every
    // query scaled exactly by the drift never clears the mover bar —
    // zero child JVMs, zero verdicts.
    val prevCalib = 0.314
    val nowCalib = 0.365
    val ratio = nowCalib / prevCalib
    for (prev <- Seq(0.16, 0.59, 1.05, 2.29, 3.87)) {
      val cur = prev * ratio // pure host drift, code unchanged
      assert(cur <= Bench.band(Bench.calibAdjust(prev, prevCalib, nowCalib)),
        s"pure calib shift flagged a mover at prev=$prev")
    }
    // r17's dedup_repeated_spans false positive: prev 1.046, warm ctx
    // 1.412 on a +16% box — normalized band 1.581 absorbs it, so the
    // row is not even selected as a mover
    assert(1.412 <= Bench.band(Bench.calibAdjust(1.046, 0.314, 0.364)))
    // a real tripling is NOT absorbed by a 16% drift
    assert(3.0 > Bench.band(Bench.calibAdjust(1.0, 0.314, 0.364)))
  }

  test("calibAdjust: clamped ratio and missing-calibration identity") {
    // no calibration on record on either side: prev is untouched
    assert(Bench.calibAdjust(1.0, -1.0, 0.36) === 1.0)
    assert(Bench.calibAdjust(1.0, 0.36, -1.0) === 1.0)
    // a corrupted 3x "drift" sample cannot hide a real regression:
    // the allowance is clamped at 1.8x
    assert(Bench.calibAdjust(1.0, 0.3, 0.9) === 1.8)
    // nor can a "faster box" sample fabricate movers below 0.6x prev
    assert(Bench.calibAdjust(1.0, 0.9, 0.3) === 0.6)
    // in-range drift scales exactly
    assert(math.abs(Bench.calibAdjust(2.0, 0.314, 0.365) -
      2.0 * 0.365 / 0.314) < 1e-12)
  }

  test("calibAdjust2: the float instrument covers drift the integer " +
       "mix is blind to") {
    // r18 incident: fresh VM ran the CPU-tight cohort 1.2-1.8x slower
    // with the integer calib FLAT (0.314 -> 0.320) — only a float
    // instrument can discount that axis. With f32 drifted 1.5x, the
    // normalized prev follows the BIGGER ratio:
    assert(math.abs(Bench.calibAdjust2(1.0, 0.314, 0.320, 0.20, 0.30)
      - 1.5) < 1e-12)
    // both flat: identity
    assert(Bench.calibAdjust2(1.0, 0.314, 0.314, 0.20, 0.20) === 1.0)
    // f32 missing on either side (pre-r18 artifacts): falls back to
    // the integer ratio alone
    assert(math.abs(Bench.calibAdjust2(1.0, 0.30, 0.36, -1.0, 0.20)
      - 1.2) < 1e-12)
    // r18 ADVICE: a missing instrument must NOT be max-ed as identity —
    // a faster box (ratio < 1) with f32 absent must TIGHTEN the band to
    // the integer ratio, not discard it (a regression masked by the
    // faster box would otherwise never flag against pre-r18 baselines)
    assert(math.abs(Bench.calibAdjust2(1.0, 0.36, 0.30, -1.0, 0.20)
      - 0.30 / 0.36) < 1e-12)
    // symmetric: integer missing, f32 present and faster
    assert(math.abs(Bench.calibAdjust2(1.0, -1.0, 0.30, 0.36, 0.30)
      - 0.30 / 0.36) < 1e-12)
    // both missing: identity
    assert(Bench.calibAdjust2(1.0, -1.0, 0.30, 0.36, -1.0) === 1.0)
  }

  test("calibClampExceeded: the board warns when raw drift escapes the " +
       "[0.6, 1.8] clamp (r18 ADVICE: no host-drift escape hatch past " +
       "the clamp — both witnesses run on the same slowed box)") {
    // inside the clamp on both instruments: quiet
    assert(!Bench.calibClampExceeded(0.30, 0.36, 0.20, 0.30))
    // >1.8x integer slowdown: warn
    assert(Bench.calibClampExceeded(0.30, 0.60, 0.20, 0.20))
    // >1.8x float slowdown with integer flat: warn
    assert(Bench.calibClampExceeded(0.30, 0.30, 0.20, 0.40))
    // <0.6x (suspiciously fast / corrupted sample): warn
    assert(Bench.calibClampExceeded(0.30, 0.15, 0.20, 0.20))
    // missing instruments are not drift evidence: quiet
    assert(!Bench.calibClampExceeded(-1.0, 0.36, -1.0, 0.20))
  }

  test("regressed requires a concurring second witness") {
    // r15 ann_ivf_kmeans: prev 0.711, first witness 1.062 (verdict0
    // regressed). A second child back inside the band (e.g. this
    // round's measured 0.841 < band 0.961) re-labels it dispersion.
    assert(Bench.soloVerdict(1.062, 0.711, 1.066, 57, 6.3, cpus)
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
