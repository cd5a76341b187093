package graft

import org.apache.spark.sql.functions._

/** Hand-computable semantics for the round-8 analytics operators —
  * the gate queries run on corpus-sized data; these pin the math on
  * inputs small enough to verify by hand.
  */
class Round8OpsSpec extends SparkSpec {
  import spark.implicits._

  test("recursive (c,l)-diversity: a dominated group fails even with " +
      "l distinct values; a balanced one passes") {
    // group A: counts 9,1 → r1=9, tail=1, 9 < 2·1 false → fails
    // group B: counts 3,3,2 → r1=3, tail=5, 3 < 2·5 true → passes
    val rows = (Seq.fill(9)(("A", "x")) ++ Seq(("A", "y")) ++
      Seq.fill(3)(("B", "x")) ++ Seq.fill(3)(("B", "y")) ++
      Seq.fill(2)(("B", "z"))).toDF("qid", "sens")
    val audit = ops.Governance.recursiveLDiversityAudit(rows,
        Seq(col("qid")), Seq("qid"), col("sens"), l = 2, c = 2)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("r1"), r.getAs[Long]("tail_sum"),
          r.getAs[Boolean]("rl_ok"))).toMap
    assert(audit("A") === ((9L, 1L, false)))
    assert(audit("B") === ((3L, 5L, true)))
  }

  test("Theil-Sen median slope ignores a single outlier point that " +
      "would wreck the OLS fit") {
    // y = 10x except one wild outlier at x=3
    val pts = Seq((0L, 0L), (1L, 10L), (2L, 20L), (3L, 900L), (4L, 40L))
    val slopes = for {
      (x1, y1) <- pts; (x2, y2) <- pts if x1 < x2
    } yield (y2 - y1).toDouble / (x2 - x1).toDouble
    val s = slopes.sorted
    val n = s.size
    val median =
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    assert(median === 10.0) // 7 of 10 pair slopes are exactly 10
  }

  test("Allen CASE ladder classifies the canonical relations and " +
      "degenerate point intervals deterministically") {
    def rel(vs: Long, ve: Long, cs: Long, ce: Long): String =
      if (vs == cs && ve == ce) "equals"
      else if (vs == cs && ve < ce) "starts"
      else if (vs == cs) "started_by"
      else if (ve == ce && vs > cs) "finishes"
      else if (ve == ce) "finished_by"
      else if (ve == cs) "meets"
      else if (ce == vs) "met_by"
      else if (vs > cs && ve < ce) "during"
      else if (vs < cs && ve > ce) "contains"
      else if (vs < cs) "overlaps"
      else "overlapped_by"
    assert(rel(0, 5, 0, 5) === "equals")
    assert(rel(0, 3, 0, 5) === "starts")
    assert(rel(2, 5, 0, 5) === "finishes")
    assert(rel(0, 5, 2, 5) === "finished_by")
    assert(rel(0, 5, 5, 9) === "meets")
    assert(rel(2, 3, 0, 5) === "during")
    assert(rel(0, 5, 2, 9) === "overlaps")
    assert(rel(2, 9, 0, 5) === "overlapped_by")
    // point interval at the other's start: starts, not meets —
    // the ladder order decides, identically in engine and oracle
    assert(rel(0, 0, 0, 5) === "starts")
  }

  test("FK audit counts orphans, including NULL child keys") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(9L), None)
      .toDF("fk")
    val orphans = child
      .join(broadcast(parent), col("fk") === col("pk"), "left_anti")
      .count()
    // 9 has no parent; NULL never equi-matches → strict-audit orphan
    assert(orphans === 2L)
  }

  test("Spearman midranks: perfect monotone pairs give rho = 1, " +
      "reversed give -1, ties get midranks") {
    def rho(pairs: Seq[(Long, Long)]): Long = {
      def midrank2(vs: Seq[Long]): Map[Long, Long] = {
        val sorted = vs.sorted
        vs.distinct.map { v =>
          val before = sorted.count(_ < v)
          val c = sorted.count(_ == v)
          v -> (2L * before + c + 1)
        }.toMap
      }
      val rx = midrank2(pairs.map(_._1))
      val ry = midrank2(pairs.map(_._2))
      val n = pairs.size.toDouble
      val xs = pairs.map(p => rx(p._1).toDouble)
      val ys = pairs.map(p => ry(p._2).toDouble)
      val sx = xs.sum; val sy = ys.sum
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val sxx = xs.map(a => a * a).sum; val syy = ys.map(a => a * a).sum
      math.round((n * sxy - sx * sy) /
        math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) * 1e9)
    }
    assert(rho(Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L))) === 1000000000L)
    assert(rho(Seq((1L, 40L), (2L, 30L), (3L, 20L), (4L, 10L))) === -1000000000L)
    // with a tie in x, |rho| < 1 even for monotone y
    val tied = rho(Seq((1L, 10L), (1L, 20L), (3L, 30L)))
    assert(tied > 0 && tied < 1000000000L)
  }

  test("CUSUM prefix-min identity equals the max(0, S+x-k) recurrence") {
    // daily values, k = mean; recurrence on the left, identity on the
    // right (both n-scaled so the mean never divides)
    val v = Seq(10L, 12L, 8L, 30L, 31L, 9L, 11L)
    val n = v.size
    val tot = v.sum
    // recurrence: S'_i = max(0, S'_{i-1} + n*v_i - tot)
    val rec = v.scanLeft(0L) { (s, x) => math.max(0L, s + n * x - tot) }
      .drop(1)
    // identity: P'_i - min_{j<=i} P'_j
    val p = v.scanLeft(0L) { (acc, x) => acc + n * x - tot }.drop(1)
    val ident = p.zipWithIndex.map { case (pi, i) =>
      pi - math.min(0L, p.take(i + 1).min) }
    assert(rec === ident)
  }

  test("two-cell uniform chi-square collapses to (n0-n1)^2/n") {
    val (n0, n1) = (600.0, 400.0)
    val n = n0 + n1
    val e = n / 2
    val classic = math.pow(n0 - e, 2) / e + math.pow(n1 - e, 2) / e
    val collapsed = math.pow(n0 - n1, 2) / n
    assert(math.abs(classic - collapsed) < 1e-9)
  }

  test("Mann-Whitney doubled midranks: U for a clean separation is " +
      "n1*n2; z guards fire on degenerate inputs") {
    // sample A = {1,2}, B = {10, 20}: every A < every B, U1 = 0,
    // u1_x2 = 2*R1 - n1(n1+1) with R1 = 1+2 = 3 → u1_x2 = 0
    val ev = Seq((1L, true), (2L, true), (10L, false), (20L, false))
      .toDF("v", "is_a")
    val counts = ev.groupBy("v").agg(
        sum(when(col("is_a"), 1L).otherwise(0L)).as("c1"),
        sum(when(!col("is_a"), 1L).otherwise(0L)).as("c2"))
      .withColumn("c", col("c1") + col("c2"))
    val wB = org.apache.spark.sql.expressions.Window.orderBy("v")
      .rowsBetween(Long.MinValue, -1)
    val r = counts
      .withColumn("cum_before", coalesce(sum("c").over(wB), lit(0L)))
      .withColumn("midrank2", lit(2L) * col("cum_before") + col("c") + 1L)
      .agg(sum(col("c1")).as("n1"),
        sum(expr("c1 * midrank2")).as("r1_x2"))
      .head()
    assert(r.getLong(1) - r.getLong(0) * (r.getLong(0) + 1) === 0L)
  }

  test("log histogram: small values are exact, large values keep the " +
      "top 7 bits, estimates bracket the true rank value within 1/64") {
    // bucketing identities
    val ids = Seq(0L, 5L, 63L, 1000L, 1023L, 1024L).toDF("v")
      .select(ops.LogHistogram.bucketLow("v", 6).as("low"))
      .collect().map(_.getLong(0)).toSeq
    // 1000 = 0b1111101000 keeps its top 7 bits exactly; 1023 drops the
    // low 3 bits to 1016; 1024 is a power of two (its own bucket floor)
    assert(ids === Seq(0L, 5L, 63L, 1000L, 1016L, 1024L))
    // exact regime: 0..63, p50 rank k=32 lands on value 31 (cum=32)
    val small = (0L to 63L).toDF("v")
    val p = ops.LogHistogram.percentiles(small, "v", Seq(5000, 9900))
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(p(5000L) === ((32L, 31L)))
    assert(p(9900L) === ((64L, 63L)))
    // grouped readout: per-group ranks stay independent
    val grouped = (0L to 63L).map(("A", _)) ++ (0L to 31L).map(("B", _))
    val gp = ops.LogHistogram.groupedPercentiles(
        grouped.toDF("g", "v"), "g", "v", Seq(5000))
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(gp === Map("A" -> 31L, "B" -> 15L))
    // relative-error property on a deterministic skewed sample
    val xs = (1 to 2000).map(i => (i.toLong * i * i * 7919) % 1000003)
    val sorted = xs.sorted
    val est = ops.LogHistogram.percentiles(xs.toDF("v"), "v",
        Seq(5000, 9000, 9900))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    for ((bp, e) <- est) {
      val k = (xs.size.toLong * bp + 9999) / 10000
      val truth = sorted(k.toInt - 1)
      assert(e <= truth && truth <= e + e / 64 + 1,
        s"p$bp: est $e vs true $truth")
    }
  }

  test("GPS scrub: strips exactly the GPS block (length-preserving), " +
      "keeps orientation, passes non-JPEG and GPS-less payloads through") {
    import graft.functions.GpsScrub
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val gpsJpeg = hx("FFD8" + "FFE10040" + "457869660000" +
      "49492A0008000000" + "0200" +
      "120103000100000006000000" +
      "258804000100000026000000" + "00000000" +
      "0100" + "000001000400000002030000" + "00000000" + "FFD9")
    val r1 = GpsScrub.scrub(gpsJpeg)
    assert(r1.getBoolean(1), "GPS must be detected")
    val scrubbed = r1.getBinary(0)
    assert(scrubbed.length === gpsJpeg.length, "length-preserving")
    assert(!GpsScrub.scrub(scrubbed).getBoolean(1), "idempotent: gone")
    val meta = graft.functions.ExifMeta.decode(scrubbed)
    assert(meta.getInt(0) === 6, "orientation survives")
    // the GPS IFD bytes themselves are zeroed (GPSVersionID 2.3.0.0
    // lived at the tail before FFD9)
    val gpsRegion = scrubbed.slice(scrubbed.length - 2 - 18,
      scrubbed.length - 2)
    assert(gpsRegion.forall(_ == 0), "GPS block zeroed")
    // pass-throughs return the SAME bytes, had_gps = false
    val plain = hx("FFD8FFD9")
    assert(!GpsScrub.scrub(plain).getBoolean(1))
    val text = "not a jpeg".getBytes("UTF-8")
    val r3 = GpsScrub.scrub(text)
    assert(!r3.getBoolean(1) && (r3.getBinary(0) sameElements text))
  }

  test("delta-presence: released share per group in basis points, " +
      "flagged when outside the declared band") {
    // group A: 3 of 4 released (7500 bp, inside [500, 9000]);
    // group B: 2 of 2 released (10000 bp — presence disclosed);
    // group C: 0 of 3 released (0 bp — absence disclosed)
    val pop = (Seq(("A", true), ("A", true), ("A", true), ("A", false),
      ("B", true), ("B", true),
      ("C", false), ("C", false), ("C", false))).toDF("g", "rel")
    val audit = ops.Governance.deltaPresenceAudit(pop, col("rel"),
        Seq(col("g")), Seq("g"), deltaMinBp = 500, deltaMaxBp = 9000)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("delta_bp"), r.getAs[Boolean]("presence_safe")))
      .toMap
    assert(audit("A") === ((7500L, true)))
    assert(audit("B") === ((10000L, false)))
    assert(audit("C") === ((0L, false)))
  }

  test("Mann-Kendall: monotone series maxes S; ties shrink the " +
      "variance by the published correction term") {
    // series 1,2,3,4: S = 6 pairs all +1; 18*Var = 4*3*13 = 156
    def mk(xs: Seq[Long]): (Long, Long) = {
      val s = (for {
        i <- xs.indices; j <- (i + 1) until xs.size
      } yield java.lang.Long.signum(xs(j) - xs(i)).toLong).sum
      val n = xs.size.toLong
      val tie = xs.groupBy(identity).values
        .map(g => { val t = g.size.toLong; t * (t - 1) * (2 * t + 5) })
        .sum
      (s, n * (n - 1) * (2 * n + 5) - tie)
    }
    assert(mk(Seq(1L, 2L, 3L, 4L)) === ((6L, 156L)))
    // 1,1,2: S = 2 (one zero pair), tie term 2*1*9 = 18: 3*2*11-18 = 48
    assert(mk(Seq(1L, 1L, 2L)) === ((2L, 48L)))
    // constant series: S = 0 and var18 = 0 — the z guard's NULL branch
    assert(mk(Seq(5L, 5L, 5L)) === ((0L, 0L)))
  }

  test("TextRank: star co-occurrence gives the hub the top score; " +
      "positions further apart than the window contribute no edge") {
    val docs = Seq((1L, "hub x hub y hub z")).toDF("doc_id", "text")
    val r = ops.TextAnalysis.textRank(docs, "doc_id", "text",
        nStopwords = 0)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(r.head._1 === "hub")
    assert(r.tail.map(_._2).distinct.size === 1, // leaves tie
      r.mkString(","))
    assert(r.head._2 > r.tail.head._2)
    // "a ! ! b": the punctuation tokens scrub to empty, leaving content
    // words at positions 0 and 3 — beyond window 2, so no graph at all
    val far = Seq((1L, "a ! ! b")).toDF("doc_id", "text")
    assert(ops.TextAnalysis.textRank(far, "doc_id", "text",
      nStopwords = 0).count() === 0L)
  }

  test("Good-Turing: N_r table, mass, and r* = (r+1)N_{r+1}/N_r on a " +
      "hand-counted corpus") {
    // counts: a:3, b:2, c:2, d:1, e:1, f:1 → N_1=3, N_2=2, N_3=1
    // r*(1) = 2*2/3, r*(2) = 3*1/2, r*(3) = null (no N_4)
    val docs = Seq("a b c d", "a b c e", "a f").toDF("text")
    val gt = ops.TextAnalysis.goodTuring(docs, "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(gt === Map(
      1L -> ((3L, 3L, Some(math.round(2.0 * 2 / 3 * 1e9)))),
      2L -> ((2L, 4L, Some(math.round(3.0 * 1 / 2 * 1e9)))),
      3L -> ((1L, 3L, None))))
  }

  test("Kneser-Ney: discounted seen bigram plus continuation tail " +
      "reproduces the hand formula; unseen context falls to P_cont") {
    // train doc 0: "a b a c" → bigrams (a,b), (b,a), (a,c)
    // c(a)=2, N1+(a·)=2; c(b)=1, N1+(b·)=1; N1+(·a)=1, N1+(·b)=1,
    // N1+(·c)=1; N1+(··)=3
    val docs = Seq((0L, "a b a c"), (1L, "a b z")).toDF("doc_id", "text")
    val out = ops.TextAnalysis.kneserNeyBigram(docs, "doc_id", "text",
        trainFilter = col("doc_id") % 2 === 0)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // doc 1: "a b z" — first token a: P_cont(a)=1/3; (a,b) seen:
    // ((1-0.75) + 0.75*2*(1/3))/2 = 0.375; (b,z) unseen w, seen ctx b:
    // (0 + 0.75*1*(1/3))/1 = 0.25. n_oov counts z only.
    val expect1 = math.round(-math.log(1.0 / 3) * 1e9) +
      math.round(-math.log((0.25 + 0.75 * 2 * (1.0 / 3)) / 2) * 1e9) +
      math.round(-math.log(0.75 * 1 * (1.0 / 3) / 1) * 1e9)
    val (n1, cb1, oov1, nll1) = out(1L)
    assert(n1 === 3L && cb1 === 0L && oov1 === 1L)
    assert(nll1 === expect1, s"got $nll1 expected $expect1")
    // doc 0 scores its own training bigrams: no backoff, no OOV
    val (n0, cb0, oov0, _) = out(0L)
    assert(n0 === 4L && cb0 === 0L && oov0 === 0L)
  }

  test("Kneser-Ney: a context never seen in train backs off to the " +
      "continuation distribution with the OOV pseudo-count") {
    // train: "a b"; score "z q": first token z → P_cont floor 1/1;
    // (z,q): ctx z unseen → P_cont(q) floor = 1/1 → nll 0, is_cb=1
    val docs = Seq((0L, "a b"), (1L, "z q")).toDF("doc_id", "text")
    val out = ops.TextAnalysis.kneserNeyBigram(docs, "doc_id", "text",
        trainFilter = col("doc_id") % 2 === 0)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(1L) === ((2L, 1L, 2L, 0L)))
  }
}
