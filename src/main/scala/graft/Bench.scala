package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR.
  *
  * Each query runs a warm-up pass (JIT + codegen + file listing), then
  * timed passes — each preceded by `spark.catalog.clearCache()` (drop
  * operator-internal caches) and `System.gc()` (don't bill this query for
  * a previous one's garbage). Queries whose first timed pass is under 2 s
  * get two more passes and report the MEDIAN (fixed jitter dominates small
  * numbers); heavier queries keep the single pass (noise is proportionally
  * small and the extra passes would triple the battery's wall time).
  *
  * Output contract: the LAST stdout line is a short, self-contained JSON
  * object (`metric`/`value`/`unit`/`sf`) that survives tail-capture
  * truncation; the full per-query map is printed on the line before it AND
  * written to `bench_full.json` (override with SPARK_GRAFT_BENCH_OUT).
  *
  * Regression net: before overwriting `bench_full.json`, the previous
  * run's per-query times (same sf only) become the baseline, and any
  * query that got >= 1.5x slower is flagged in a `regressions` field of
  * the new artifact — so a parameterization surprise (the d5 lesson:
  * 1.8 s -> 13.7 s went unflagged for a whole round) is caught by the
  * artifact itself, not by a human diffing two JSON blobs.
  *
  * Self-adjudication (r7-verdict item 2 — that round shipped 12 flags
  * that were all ambient-load inflation a human had to diff away): the
  * artifact records `/proc/loadavg` at start and end, and every flagged
  * query is RE-RUN in isolation after the battery (warm-up + two timed
  * passes, min) and adjudicated in the artifact itself — `confirmed`
  * when the isolated re-run still exceeds the ratio against the
  * baseline, `jitter` when it reverts. A structural regression survives
  * isolation; a loaded-host spike does not. Both the PRIMARY battery
  * pass (r9-verdict item 1) and every retest wait for the 1-minute
  * loadavg to decay below a gate (r8-verdict item 8) before timing; a
  * flag that reproduces only under above-gate load — sampled before AND
  * after the retest, max of the two — is `load-suspect`, never
  * `confirmed`. Since r12 (r11-verdict item 1): the battery start also
  * holds the 5-MINUTE average to the gate (r11 started at 5-min 2.23
  * and carried digestion noise into the whole primary pass), the
  * retest gate is STRICTLY below (a retest at exactly the gate is
  * `load-suspect`), and `confirmed` requires the ratio to reproduce in
  * TWO independent quiet retests — r11's three confirmed-on-untouched-
  * code flags all came from single retests at loadavg 1.45-1.50.
  */
object Bench {

  /** Noise floor: a query must have taken at least this long in the
    * baseline before a ratio means anything (0.15 s -> 0.25 s is jitter,
    * not a regression).
    */
  val RegressionFloorSec = 0.2

  /** Flag threshold on now/prev. */
  val RegressionRatio = 1.5

  /** Queries >= 1.5x slower than the baseline, above the noise floor.
    * Returns name -> (prev, now, ratio).
    */
  def regressions(prev: Map[String, Double],
                  now: Map[String, Double]): Map[String, (Double, Double, Double)] =
    now.flatMap { case (name, n) =>
      prev.get(name) match {
        case Some(p) if p >= RegressionFloorSec && n >= 0 &&
            n / p >= RegressionRatio =>
          Some(name -> (p, n, n / p))
        case _ => None
      }
    }

  /** HOST CALIBRATION (r12 — the cross-VM drift fix): a fixed CPU-bound
    * probe timed at battery start and recorded in the artifact as
    * `calib`. Successive rounds can run on different VM generations
    * (r12's host timed the identical battery ~1.3× slower than r11's),
    * and a baseline pinned on a faster, since-retired host mints
    * `confirmed` regressions on untouched code — r11 minted three, r12's
    * first battery two, all of which a same-host A/B reverts. When both
    * the baseline artifact and this run carry `calib`, adjudication
    * ALSO computes the host-normalized ratio (now ÷ calib-drift) and a
    * flag whose normalized ratio is back under the threshold is emitted
    * as `host-drift`, never `confirmed`. The probe is pure Spark
    * built-ins (8e9-row range → xxhash64 → max: no I/O, no graft code,
    * fills all cores like the battery, ~1-2 s warm), so a regression in
    * engine code cannot launder itself through the calibration. Raw
    * ratios stay in the artifact — the scaling is visible, not silent.
    */
  /** One pass of the calibration probe — the identical computation in
    * every use (battery start AND retest time), so the constants are
    * comparable across artifacts and within a run.
    */
  def calibPass(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    // max, not sum: a SUM of 8e9 hashes overflows BIGINT under ANSI
    // semantics and fails the whole battery at stage 0
    spark.range(0L, 8000000000L, 1L, 32)
      .select(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.xxhash64(
          org.apache.spark.sql.functions.col("id"))))
      .collect()
    (System.nanoTime() - t0) / 1e9
  }

  def calibrate(spark: SparkSession): Double = {
    calibPass(spark) // warm: codegen + JIT
    math.min(calibPass(spark), calibPass(spark))
  }

  /** The `calib` field of a previous artifact, when present. */
  def previousCalib(path: String): Option[Double] =
    try {
      val txt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)), "UTF-8")
      "\"calib\":(-?[0-9]+(?:\\.[0-9]+)?)".r.findFirstMatchIn(txt)
        .map(_.group(1).toDouble)
    } catch { case _: Throwable => None }

  /** Parse the per-query map out of a previous bench artifact — our own
    * fixed single-line format, so a scoped regex beats dragging in a JSON
    * parser. Returns empty when the file is absent or was run at a
    * different sf (cross-sf ratios are meaningless).
    */
  def previousQueryTimes(path: String, sfDir: String): Map[String, Double] =
    try {
      val txt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)), "UTF-8")
      if (!txt.contains("\"sf\":\"" + sfDir + "\"")) Map.empty
      else {
        val start = txt.indexOf("\"queries\":{")
        val end = if (start < 0) -1 else txt.indexOf("}", start)
        if (end < 0) Map.empty
        else "\"([A-Za-z0-9_]+)\":(-?[0-9]+(?:\\.[0-9]+)?)".r
          .findAllMatchIn(txt.substring(start + 11, end))
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      }
    } catch { case _: Throwable => Map.empty }

  /** Per-query regression baseline from two sources: the local artifact
    * this run will overwrite and the PINNED last-driver-run artifact
    * (`bench_baseline.json`, updated deliberately, never written by
    * Bench). Per query the MIN of the two — a local rerun can TIGHTEN
    * the net but never loosen it (r10: a drifted local artifact masked
    * t36's 1.61x between driver rounds).
    */
  def mergedBaseline(local: Map[String, Double],
                     pinned: Map[String, Double]): Map[String, Double] = {
    // drop error sentinels (-1.0) and sub-floor noise BEFORE the min:
    // a failed local run must not poison a valid pinned time (min of
    // -1 and 1.83 would be -1, which regressions() then ignores —
    // silently disabling the net for exactly the query that errored)
    def ok(m: Map[String, Double]) = m.filter(_._2 >= RegressionFloorSec)
    val l = ok(local); val p = ok(pinned)
    (l.keySet ++ p.keySet).map { k =>
      k -> math.min(l.getOrElse(k, Double.MaxValue),
        p.getOrElse(k, Double.MaxValue))
    }.toMap
  }

  /** 1/5/15-minute load averages, or empty when /proc is unavailable. */
  def loadAvg(): Seq[Double] =
    try {
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg")), "UTF-8")
        .split("\\s+").take(3).toSeq.map(_.toDouble)
    } catch { case _: Throwable => Seq.empty }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // LOAD GATE for the PRIMARY pass (r9-verdict item 1: r9's battery
    // started at loadavg 4.43 — above the adjudicator's own gate — so
    // the headline numbers carried ambient noise and the next round's
    // regression net diffed against inflated times). The primary pass
    // has its OWN 5-minute wait budget (r10 ADVICE: when it shared the
    // retests' budget, a loaded start drained it and every later
    // retest's gate returned immediately under load — the `confirmed`
    // channel was silently disabled for the whole run); the retests
    // share a separate fresh budget below. The gate's admit threshold
    // is RECORDED in the artifact (r10-verdict item 5: r10 started at
    // loadavg 2.47 under a 2.5 gate and minted a `confirmed` verdict —
    // consumers could not see the ceiling that admitted it), and a
    // budget-exhausted start is an explicit `load_gate_waived` flag,
    // never a silent pass-through.
    val loadGate = sys.env.get("SPARK_GRAFT_LOAD_GATE")
      .flatMap(s => scala.util.Try(s.toDouble).toOption).getOrElse(1.5)
    // Quiet means BOTH the 1-minute and the 5-minute averages are
    // down: a 1-minute dip admits a host still digesting a 30-minute
    // battery (observed: l1 1.3 with l5 2.4 minted three `confirmed`
    // flags on untouched 0.2 s queries), so the 5-minute average must
    // also sit under the gate before timing starts. Two strictnesses
    // (r11-verdict item 1): the BATTERY START holds the 5-minute
    // average to the gate itself — r11 started at 5-min 2.23 under the
    // old 1.5x ceiling (2.25) and the whole primary pass carried the
    // digesting host's noise into the baseline diff. RETESTS keep the
    // 1.5x allowance on the 5-minute average only because our own
    // just-finished battery inflates it (local[32] keeps 5-min around
    // 2 for minutes after rc=0) — demanding the strict bound there
    // would drain the whole retest budget on our own wake; the 1-minute
    // average still holds the gate, and the VERDICT gate below is
    // strictly-below regardless.
    def quietEnough(l: Seq[Double], strict: Boolean): Boolean =
      l.headOption.forall(_ <= loadGate) &&
        l.drop(1).headOption.forall(
          _ <= (if (strict) loadGate else loadGate * 1.5))
    def awaitQuiet(budget: java.util.concurrent.atomic.AtomicLong,
                   strict: Boolean): Seq[Double] = {
      var l = loadAvg()
      while (!quietEnough(l, strict) && budget.get > 0) {
        Thread.sleep(10000); budget.addAndGet(-10000); l = loadAvg()
      }
      l
    }
    // effective load for gate decisions: the 1-minute average, or the
    // 5-minute average discounted by the same 1.5x the quiet check uses
    // — whichever says the host is busier
    def effLoad(l: Seq[Double]): Double =
      math.max(l.headOption.getOrElse(-1.0),
        l.drop(1).headOption.map(_ / 1.5).getOrElse(-1.0))
    // 10-minute wait budget (r12-verdict item 2: the 5-minute budget
    // waived at loadavg 6.47 and the primary artifact carried a false
    // `confirmed` that post-hoc adjudication had to walk back — a
    // digesting host needs one 5-minute-average half-life more than the
    // old budget allowed). Env-overridable for local iteration; the
    // actual wait is recorded in the artifact so a consumer can see
    // whether quiet was immediate or earned.
    val primaryBudget = new java.util.concurrent.atomic.AtomicLong(
      sys.env.get("SPARK_GRAFT_QUIET_BUDGET_MS")
        .flatMap(s => scala.util.Try(s.toLong).toOption)
        .getOrElse(600000L))
    val quietBudget0 = primaryBudget.get
    awaitQuiet(primaryBudget, strict = true)
    val quietWaitMs = quietBudget0 - primaryBudget.get
    val loadStart = loadAvg()
    val gateWaived = !quietEnough(loadStart, strict = true)
    // host speed constant for cross-VM ratio normalization (see
    // [[calibrate]]) — timed on the quiet host, before the battery.
    // Skipped (-1) for prefix-restricted local iteration runs: a
    // partial artifact is never a baseline, so the probe would be
    // all-core startup cost for nothing.
    val calibNow = if (args.isEmpty) calibrate(spark) else -1.0

    // Optional args (local iteration only; the driver passes none):
    // query-name prefixes to restrict the battery to.
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) =>
        args.isEmpty || args.exists(name.startsWith) }
      .map { case (name, fn) =>
      val sec =
        try {
          fn(spark, sfDir).count() // warm-up: JIT, codegen, file listing
          def timed(): Double = {
            spark.catalog.clearCache() // drop operator-internal caches
            System.gc()
            val t0 = System.nanoTime()
            fn(spark, sfDir).count()
            (System.nanoTime() - t0) / 1e9
          }
          val first = timed()
          // Heavy queries get one more pass and report the MIN: on a
          // shared VM a single pass occasionally absorbs a 2-4x I/O or
          // CPU-steal spike (observed round to round: a DIFFERENT subset
          // of the >2 s queries inflates each run and reverts the next),
          // and a structural regression slows every pass, so min keeps
          // the signal while shedding one-off noise at a bounded
          // +1-pass cost. Light queries keep median-of-3 (fixed jitter
          // dominates small numbers).
          if (first >= 2.0) math.min(first, timed())
          else Seq(first, timed(), timed()).sorted.apply(1) // median of 3
        } catch { case _: Throwable => -1.0 }
      spark.catalog.clearCache()
      name -> sec
    }
    def r3(v: Double): Double = math.rint(v * 1000) / 1000
    val qs = results.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val total = r3(results.collect { case (_, v) if v >= 0 => v }.sum)
    // Subset runs (local iteration with name-prefix args) must not
    // overwrite the full-battery artifact: a partial map would become
    // the next run's baseline and every absent query would silently
    // drop out of the regression net.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      if (args.isEmpty) "/root/repo/bench_full.json"
      else "/tmp/bench_partial.json")
    // Regression net vs BOTH baselines (r10-verdict item 2: t36 went
    // 1.83 -> 2.95 s between DRIVER rounds yet was never flagged,
    // because the local end-of-round run had overwritten bench_full
    // with an inflated t36 and the net only ever saw the drifted
    // number — heavies were exactly the queries the drift masked).
    // `bench_baseline.json` is a PINNED copy of the last driver-run
    // artifact, updated deliberately, never written by this program;
    // per query the baseline is the MIN of the two sources, so a local
    // rerun can tighten the net but can never loosen it.
    val baselinePath = sys.env.getOrElse("SPARK_GRAFT_BENCH_BASELINE",
      "/root/repo/bench_baseline.json")
    val prevLocal = previousQueryTimes(outPath, sfDir)
    val prevPinned = previousQueryTimes(baselinePath, sfDir)
    val prev = mergedBaseline(prevLocal, prevPinned)
    // per query, the calibration constant of the source whose time won
    // the min — the denominator of that query's host-drift correction
    val localCalib = previousCalib(outPath)
    val pinnedCalib = previousCalib(baselinePath)
    // On an exact per-query tie (common — the pin IS a copied local
    // artifact) prefer whichever tied source actually carries a
    // calibration: a pre-calibration artifact on one side must not
    // null the drift correction the other side can supply.
    val prevCalib: Map[String, Option[Double]] = prev.map { case (k, p) =>
      val fromLocal = prevLocal.get(k).contains(p)
      val fromPinned = prevPinned.get(k).contains(p)
      val c =
        if (fromLocal && fromPinned) localCalib.orElse(pinnedCalib)
        else if (fromLocal) localCalib
        else pinnedCalib
      k -> c
    }
    val regs = regressions(prev, results.toMap)
    // A query that ERRORED this run (sec = -1) is worse than any
    // ratio, but regressions() can't mint a ratio for it — surface it
    // in its own artifact channel so a passing->crashing transition
    // can never read as a green round.
    val erroredNow = results.collect { case (k, v) if v < 0 => k }.sorted
    // Adjudicate every flag by an ISOLATED re-run (nothing else on the
    // JVM, post-battery): min of two timed passes after a warm-up. A
    // structural regression reproduces; a load spike reverts.
    //
    // LOAD GATE (r8-verdict item 8: that round's one `confirmed` flag was
    // retested at loadavg 7.5 — the adjudicator confirmed what it could
    // not distinguish from ambient load): before each retest, wait for
    // the 1-minute loadavg to decay below SPARK_GRAFT_LOAD_GATE
    // (default 1.5 since r11 — r10's 2.5 ceiling admitted a 2.47 start
    // and minted a bogus `confirmed`), bounded by the retests' shared
    // 5-minute budget so a busy co-tenant cannot stall the driver;
    // the primary pass holds its own budget. The retest-time loadavg
    // is recorded per flag, and a flag that still reproduces under
    // above-gate load is emitted as `load-suspect`, never `confirmed`.
    // The load is sampled BEFORE and AFTER each retest and the MAX of
    // the two drives the decision (r9 ADVICE: a co-tenant spike that
    // begins mid-retest — warm-up + two timed passes can take tens of
    // seconds — must not launder a flag into `confirmed`).
    val fnByName = SparkEntry.queries
    // fresh budget for the retests — the primary pass cannot drain it
    val retestBudget = new java.util.concurrent.atomic.AtomicLong(300000L)
    // one isolated retest: await quiet, warm, min of two timed passes;
    // returns (seconds or -1, max of pre/post effective load, the
    // retest-TIME calibration constant). The fresh probe exists because
    // retests run minutes after battery start and host speed may have
    // shifted meanwhile (r12 ADVICE item 3: normalizing a late retest by
    // the battery-start constant applies stale drift) — one probe pass
    // (~1-2 s warm) per retest, the same computation as [[calibPass]] so
    // the ratio against the baseline's calib is meaningful. Skipped (-1)
    // when the battery itself skipped calibration (prefix-restricted
    // local runs).
    def isolatedRetest(k: String): (Double, Double, Double) = {
      val loadPre = awaitQuiet(retestBudget, strict = false)
      val sec =
        try {
          val fn = fnByName(k)
          fn(spark, sfDir).count() // warm
          def timed(): Double = {
            spark.catalog.clearCache(); System.gc()
            val t0 = System.nanoTime()
            fn(spark, sfDir).count()
            (System.nanoTime() - t0) / 1e9
          }
          math.min(timed(), timed())
        } catch { case _: Throwable => -1.0 }
      spark.catalog.clearCache()
      val calibRt =
        if (calibNow > 0)
          try calibPass(spark) catch { case _: Throwable => -1.0 }
        else -1.0
      (sec, math.max(effLoad(loadPre), effLoad(loadAvg())), calibRt)
    }
    val adjudicated = regs.toSeq.sortBy(_._1).map { case (k, (p, n, r)) =>
      val prevC = prevCalib.getOrElse(k, None).filter(_ > 0)
      val (retest, retestLoad, calibRt) = isolatedRetest(k)
      // host-drift correction for a retest: ITS OWN probe constant over
      // the baseline source's (> 1 = this host is slower NOW), falling
      // back to the battery-start constant when the retest probe failed.
      // None when the baseline artifact predates calibration.
      def driftAt(c: Double): Option[Double] =
        prevC.filter(_ => calibNow > 0)
          .map(p0 => (if (c > 0) c else calibNow) / p0)
      // CONFIRMED needs: the ratio to reproduce in TWO independent
      // isolated retests, each run STRICTLY below the gate, and — when
      // both artifacts carry a calibration — to survive host-drift
      // normalization (r12: a fresh, ~1.3×-slower VM re-minted
      // `confirmed` flags on untouched code through retests that were
      // genuinely quiet; a slower host reproduces, only normalization
      // tells it from a code regression). r11 minted 3 `confirmed` on
      // untouched code from single retests at loadavg 1.45-1.50 — a
      // load-boundary spike decays between two passes, a structural
      // regression reproduces in both. ORDER (r12 ADVICE item 3): the
      // load check comes BEFORE drift normalization — a retest that is
      // both above-threshold and on a loaded host is a load artifact
      // first; labeling it host-drift would blame the VM for a co-tenant.
      def judge(rt: Double, rl: Double, c: Double): String =
        if (rt < 0) "retest-errored" // a crash must not read as jitter
        else if (rt / p < RegressionRatio) "jitter"
        else if (rl >= loadGate) "load-suspect"
        else if (driftAt(c).exists(d => (rt / p) / d < RegressionRatio))
          "host-drift"
        else "confirmed"
      // the recorded calib_drift is the one the VERDICT rode on: the
      // second retest's probe when a second retest decided it, else the
      // first's — a consumer must never see a drift ratio inconsistent
      // with the verdict printed beside it
      val (verdict, retest2, retest2Load, verdictCalib) =
        judge(retest, retestLoad, calibRt) match {
          case "confirmed" =>
            val (rt2, rl2, c2) = isolatedRetest(k)
            (judge(rt2, rl2, c2), rt2, rl2, c2)
          case v => (v, -1.0, -1.0, calibRt)
        }
      (k, p, n, r, retest, verdict, retestLoad, retest2, retest2Load,
        driftAt(verdictCalib))
    }
    val nConfirmed = adjudicated.count(_._6 == "confirmed")
    val regsJson = adjudicated.map {
      case (k, p, n, r, rt, v, rl, rt2, rl2, drift) =>
        val second =
          if (rt2 < 0 && rl2 < 0) ""
          else ",\"retest2\":" + r3(rt2) + ",\"retest2_load\":" + r3(rl2)
        val driftPart = drift.map(d => ",\"calib_drift\":" + r3(d))
          .getOrElse("")
        "\"" + k + "\":{\"prev\":" + r3(p) + ",\"now\":" + r3(n) +
          ",\"ratio\":" + r3(r) + ",\"retest\":" + r3(rt) +
          ",\"retest_load\":" + r3(rl) + second + driftPart +
          ",\"verdict\":\"" + v + "\"}"
    }.mkString("{", ",", "}")
    val loadEnd = loadAvg()
    def loadJson(l: Seq[Double]) = l.map(r3).mkString("[", ",", "]")
    val errPart = erroredNow.map("\"" + _ + "\"").mkString("[", ",", "]")
    val loadPart = s""","calib":${r3(calibNow)}""" +
      s""","loadavg_start":${loadJson(loadStart)}""" +
      s""","loadavg_end":${loadJson(loadEnd)}""" +
      s""","load_gate":${r3(loadGate)},"load_gate_waived":$gateWaived""" +
      s""","quiet_wait_ms":$quietWaitMs""" +
      s""","errored":$errPart,"n_errored":${erroredNow.size}""" +
      s""","baseline_sources":{"local":${prevLocal.size},"pinned":${prevPinned.size}}"""
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"regressions":$regsJson,"n_confirmed":$nConfirmed$loadPart,"sf":"$sfDir"}"""
    val wrote =
      try {
        java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
          full.getBytes("UTF-8"))
        true
      } catch { case _: Throwable => false }
    println(full)
    // Short line LAST: tail-capture keeps the end of stdout, so this always
    // parses even when the full line above is truncated. The file pointer
    // appears only when the file was actually written.
    val filePart = if (wrote) s""","queries_file":"$outPath"""" else ""
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_regressions":${regs.size},"n_confirmed":$nConfirmed$loadPart,"sf":"$sfDir"$filePart}""")
    spark.stop()
  }
}
