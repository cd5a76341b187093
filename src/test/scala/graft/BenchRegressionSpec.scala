package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench regression net: the artifact must flag its own slowdowns. */
class BenchRegressionSpec extends AnyFunSuite {

  test("flags >=1.5x above the noise floor; ignores noise and new queries") {
    val prev = Map("d5" -> 1.78, "tiny" -> 0.1, "ok" -> 1.0, "gone" -> 2.0)
    val now = Map("d5" -> 13.71, "tiny" -> 0.3, "ok" -> 1.4, "fresh" -> 9.0)
    val regs = Bench.regressions(prev, now)
    // the round-4 d5 surprise would have been caught
    assert(regs.keySet === Set("d5"))
    val (p, n, r) = regs("d5")
    assert(p === 1.78 && n === 13.71 && math.abs(r - 13.71 / 1.78) < 1e-9)
    // sub-floor baselines never flag (0.1 -> 0.3 is jitter territory);
    // improvements, small drifts, and queries absent either side are quiet
  }

  test("errored runs (-1) never flag") {
    assert(Bench.regressions(Map("q" -> 1.0), Map("q" -> -1.0)).isEmpty)
  }

  test("merged baseline takes the per-query MIN of local and pinned — " +
    "a drifted local artifact can't mask a driver-round regression") {
    // the r10 t36 shape: local artifact drifted up to 2.9, pinned
    // driver baseline holds 1.83 — the net must diff against 1.83
    val merged = Bench.mergedBaseline(
      local = Map("t36" -> 2.9, "only_local" -> 1.0),
      pinned = Map("t36" -> 1.83, "only_pinned" -> 0.5))
    assert(merged === Map("t36" -> 1.83, "only_local" -> 1.0,
      "only_pinned" -> 0.5))
    // and a 2.95 re-measurement now flags against the pinned floor
    assert(Bench.regressions(merged, Map("t36" -> 2.95)).keySet ===
      Set("t36"))
  }

  test("calibration parse: present, absent, and unreadable artifacts") {
    val dir = java.nio.file.Files.createTempDirectory("graft-calib")
    val withCalib = dir.resolve("with.json")
    java.nio.file.Files.write(withCalib,
      ("""{"metric":"total","value":3.0,"queries":{"a":1.5},""" +
        """"calib":2.345,"sf":"/data/sf0.1"}""").getBytes("UTF-8"))
    assert(Bench.previousCalib(withCalib.toString) === Some(2.345))
    val noCalib = dir.resolve("without.json")
    java.nio.file.Files.write(noCalib,
      """{"metric":"total","value":3.0,"queries":{"a":1.5}}"""
        .getBytes("UTF-8"))
    assert(Bench.previousCalib(noCalib.toString) === None)
    assert(Bench.previousCalib(dir.resolve("nope.json").toString) === None)
  }

  test("previous artifact parse: same-sf gate and flat queries map") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bench")
    val f = dir.resolve("bench_full.json")
    java.nio.file.Files.write(f,
      ("""{"metric":"total","value":3.0,"unit":"sec","queries":{"a":1.5,""" +
        """"b":0.25},"regressions":{"a":{"prev":1.0,"now":1.5,""" +
        """"ratio":1.5}},"sf":"/data/sf0.1"}""").getBytes("UTF-8"))
    assert(Bench.previousQueryTimes(f.toString, "/data/sf0.1") ===
      Map("a" -> 1.5, "b" -> 0.25))
    // different sf → no baseline (cross-sf ratios are meaningless)
    assert(Bench.previousQueryTimes(f.toString, "/data/sf0.01") === Map.empty)
    // absent file → no baseline
    assert(Bench.previousQueryTimes(dir.resolve("nope.json").toString,
      "/data/sf0.1") === Map.empty)
  }
}
