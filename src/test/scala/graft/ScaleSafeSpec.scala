package graft

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.ScaleSafe

/** The scale-safe rank/prefix-scan family (ScaleSafe.scala) must be
  * BIT-IDENTICAL to the global-window answers — that equivalence is
  * what lets the *b gates share their siblings' DuckDB oracles — and
  * its plans must contain no unpartitioned Window over unbounded
  * input (the defect class it exists to remove).
  */
class ScaleSafeSpec extends SparkSpec {
  import spark.implicits._

  // Values with heavy ties (v = i % 7) so bracket boundaries and
  // bucket edges land INSIDE tie groups — the hard case for exactness.
  private def tied(n: Int) =
    (1 to n).map(i => ((i * 31 % n).toLong % 7, i.toLong))
      .toDF("v", "id")

  test("exactRankValueBracket matches the global low median") {
    val df = tied(997)
    val global = df
      .withColumn("rn", row_number().over(Window.orderBy("v", "id")))
      .filter(col("rn") === (997 + 1) / 2).select("v")
      .head().getLong(0)
    val bracket = ScaleSafe
      .exactRankValueBracket(df, "v", "id", 0.5, n => (n + 1) / 2)
      .head().getLong(0)
    assert(bracket === global)
  }

  test("exactRankValueBracket matches an extreme rank (p99 of skew)") {
    // One dominant value + a thin tail: the sketch bracket must widen
    // or sit exactly on the tie mass and still select exactly.
    val df = ((1 to 900).map(_ => 5L) ++ (1 to 100).map(i => 100L + i))
      .zipWithIndex.map { case (v, i) => (v, i.toLong) }.toDF("v", "id")
    val n = 1000L
    val target = (99 * n + 99) / 100
    val global = df
      .withColumn("rn", row_number().over(Window.orderBy("v", "id")))
      .filter(col("rn") === target).select("v").head().getLong(0)
    val bracket = ScaleSafe
      .exactRankValueBracket(df, "v", "id", 0.99, m => (99 * m + 99) / 100)
      .head().getLong(0)
    assert(bracket === global)
  }

  test("exactRankValueBracket on empty input returns no rows") {
    val df = Seq.empty[(Long, Long)].toDF("v", "id")
    assert(ScaleSafe
      .exactRankValueBracket(df, "v", "id", 0.5, n => (n + 1) / 2)
      .isEmpty)
  }

  test("rowNumberBucketed equals the global row_number") {
    val df = tied(500)
      .withColumn("h", md5(col("id").cast("string")))
    val global = df.withColumn("rn",
      row_number().over(Window.orderBy("h", "id")).cast("long"))
    val bucketed = ScaleSafe.rowNumberBucketed(df,
      Seq(col("h"), col("id")), ScaleSafe.hexPrefixBucket("h", 8), "rn")
    assert(bucketed.select("id", "rn")
      .except(global.select("id", "rn")).isEmpty)
    assert(global.select("id", "rn")
      .except(bucketed.select("id", "rn")).isEmpty)
  }

  test("runningSumBucketed equals the global running sum") {
    val df = (1 to 400)
      .map(i => (1700000000000000L + (i % 50) * 1000L, (i % 3 - 1).toLong))
      .toDF("t", "delta")
    val wRun = Window.orderBy("t", "delta")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val global = df.withColumn("run", sum(col("delta")).over(wRun))
    val lo = 1700000000000000L
    val hi = 1700000000049000L
    val bucketed = ScaleSafe.runningSumBucketed(df,
      Seq(col("t"), col("delta")),
      ScaleSafe.rangeBucket("t", lo, hi, 8), "delta", "run")
    // Ties within (t, delta) get an arbitrary ramp order on both
    // paths, so compare the per-(t, delta) run MULTISET, which is
    // order-invariant (the property x10's day-max readout relies on).
    val g = global.groupBy("t", "delta").agg(sort_array(
      collect_list("run")).as("runs"))
    val b = bucketed.groupBy("t", "delta").agg(sort_array(
      collect_list("run")).as("runs"))
    assert(b.except(g).isEmpty && g.except(b).isEmpty)
  }

  test("distributed-path plans have no unpartitioned Window over " +
    "unbounded input") {
    // x10b and t31b: every Window with an empty partition spec must sit
    // over an Aggregate (the ≤#buckets offsets table) — never over the
    // raw corpus.
    for (q <- Seq("x10b_peak_concurrency", "t31b_heaps_law")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.optimizedPlan
      val bad = plan.collect {
        case w: LWindow if w.partitionSpec.isEmpty &&
          w.collectFirst { case a: Aggregate => a }.isEmpty => w
      }
      assert(bad.isEmpty,
        s"$q has an unpartitioned Window over non-aggregated input:\n" +
          bad.mkString("\n"))
    }
  }

  test("hot-key sub-bucketing: bit-equal ranks on a 50%-hot fixture, " +
    "balanced bucket sizes") {
    // one value (50) holds HALF of all rows — the concentration case
    // the plain value-bucket provably cannot balance; other values
    // spread on both sides of it
    val n = 1000
    val df = (1 to n).map { i =>
      (if (i % 2 == 0) 50L else (i * 13 % 97).toLong, i.toLong)
    }.toDF("v", "id")
    val global = df.withColumn("rn",
      row_number().over(Window.orderBy("v", "id")).cast("long"))
    val out = ScaleSafe.rowNumberBucketedHotSafe(df, "v", "id",
      ScaleSafe.rangeBucket("v", 0, 96, 8), "rn",
      hotShare = 0.2, subBuckets = 8)
    assert(out.select("v", "id", "rn")
      .except(global.select("v", "id", "rn")).isEmpty)
    assert(global.select("v", "id", "rn")
      .except(out.select("v", "id", "rn")).isEmpty)
    // balance: the composite bucket splits the 500-row hot value into
    // 8 tie-ranges, so no bucket holds more than ~2x the fair share —
    // the plain bucketing would put all 500 in one task
    val sizes = ScaleSafe.withHotSafeBucket(df, "v", "id",
        ScaleSafe.rangeBucket("v", 0, 96, 8), "__hsb",
        hotShare = 0.2, subBuckets = 8)
      .groupBy("__hsb").count().select("count")
      .collect().map(_.getLong(0))
    assert(sizes.max <= n / 8 * 2, s"max bucket ${sizes.max}")
    // determinism across recomputation: the scan computes the bucket
    // twice — two independent evaluations must agree exactly
    val b1 = ScaleSafe.withHotSafeBucket(df, "v", "id",
      ScaleSafe.rangeBucket("v", 0, 96, 8), "__hsb", 0.2, 8)
      .select("id", "__hsb")
    val b2 = ScaleSafe.withHotSafeBucket(df, "v", "id",
      ScaleSafe.rangeBucket("v", 0, 96, 8), "__hsb", 0.2, 8)
      .select("id", "__hsb")
    assert(b1.except(b2).isEmpty && b2.except(b1).isEmpty)
  }

  test("hot-key sub-bucketing degrades to the base bucket when nothing " +
    "is hot") {
    val df = tied(300).withColumn("h", md5(col("id").cast("string")))
    val global = df.withColumn("rn",
      row_number().over(Window.orderBy("v", "id")).cast("long"))
    // v has 7 distinct values of ~43 rows each; hotShare 0.5 → no hot
    val out = ScaleSafe.rowNumberBucketedHotSafe(df, "v", "id",
      ScaleSafe.rangeBucket("v", 0, 6, 4), "rn",
      hotShare = 0.5, subBuckets = 8)
    assert(out.select("id", "rn")
      .except(global.select("id", "rn")).isEmpty)
    assert(global.select("id", "rn")
      .except(out.select("id", "rn")).isEmpty)
  }

  test("auto routing engages the hot-safe composite on the 50%-hot " +
    "fixture and stays bit-exact, through the public entry point") {
    // r9-verdict item 5: the PUBLIC auto entry must detect and engage
    // by itself — no caller-side knowledge of the skew
    val n = 1000
    val df = (1 to n).map { i =>
      (if (i % 2 == 0) 50L else (i * 13 % 97).toLong, i.toLong)
    }.toDF("v", "id")
    val global = df.withColumn("rn",
      row_number().over(Window.orderBy("v", "id")).cast("long"))
    val auto = ScaleSafe.rowNumberBucketedAuto(df, "v", "id",
      ScaleSafe.rangeBucket("v", 0, 96, 8), "rn",
      hotShare = 0.2, subBuckets = 8)
    assert(auto.select("v", "id", "rn")
      .except(global.select("v", "id", "rn")).isEmpty)
    assert(global.select("v", "id", "rn")
      .except(auto.select("v", "id", "rn")).isEmpty)
    // the engaged plan carries the hot-list refinement: the composite
    // struct bucket built from the collected hot list (a pure CASE
    // expression — no joins, no second stats pass); the plain scan's
    // bucket is a bare integer expression, never a struct. Checked on
    // the ANALYZED plan — over a LocalRelation fixture the optimizer
    // constant-folds the whole projection away.
    assert(auto.queryExecution.analyzed.toString
      .contains("struct(b, "))
  }

  test("auto routing builds the PLAIN two-level plan when nothing is " +
    "hot") {
    val df = tied(300)
    val plain = ScaleSafe.rowNumberBucketed(df,
      Seq(col("v"), col("id")), ScaleSafe.rangeBucket("v", 0, 6, 4), "rn")
    // 7 values of ~43 rows each; hotShare 0.5 → detection finds nothing
    val auto = ScaleSafe.rowNumberBucketedAuto(df, "v", "id",
      ScaleSafe.rangeBucket("v", 0, 6, 4), "rn",
      hotShare = 0.5, subBuckets = 8)
    // the built plan is LITERALLY the plain one: no composite struct
    // bucket anywhere, and the same operator skeleton
    val autoPlan = auto.queryExecution.analyzed.toString
    assert(!autoPlan.contains("struct(b, "))
    assert(auto.select("id", "rn").except(plain.select("id", "rn")).isEmpty)
    // running-sum sibling: same detection, same plain fallback
    val rsAuto = ScaleSafe.runningSumBucketedAuto(df, "v", "id",
      ScaleSafe.rangeBucket("v", 0, 6, 4), "id", "run", hotShare = 0.5)
    assert(!rsAuto.queryExecution.analyzed.toString
      .contains("struct(b, "))
  }

  test("literal hot composite equals the join-form composite and the " +
    "global order (multiple hot values, overflow-wide tie domain)") {
    // two hot values (20 and 50), one of them with a tie domain wide
    // enough to trip the overflow guard — the literal CASE step
    // function must agree with the join form and with the global sort
    val rows = (1 to 200).map(i => (20L, i.toLong)) ++
      (1 to 200).map(i => (50L, if (i % 2 == 0) Long.MaxValue - i
        else Long.MinValue + i)) ++
      (1 to 100).map(i => ((i * 7 % 97).toLong, 1000L + i))
    val df = rows.toDF("v", "id")
    val global = df.withColumn("rn",
      row_number().over(Window.orderBy("v", "id")).cast("long"))
    val auto = ScaleSafe.rowNumberBucketedAuto(df, "v", "id",
      ScaleSafe.rangeBucket("v", 0, 96, 8), "rn",
      hotShare = 0.2, subBuckets = 8)
    assert(auto.select("v", "id", "rn")
      .except(global.select("v", "id", "rn")).isEmpty)
    assert(global.select("v", "id", "rn")
      .except(auto.select("v", "id", "rn")).isEmpty)
    val joinForm = ScaleSafe.rowNumberBucketedHotSafe(df, "v", "id",
      ScaleSafe.rangeBucket("v", 0, 96, 8), "rn",
      hotShare = 0.2, subBuckets = 8)
    assert(auto.select("v", "id", "rn")
      .except(joinForm.select("v", "id", "rn")).isEmpty)
  }

  test("hot-key tie split falls back to no sub-split when the tie " +
    "domain would overflow the BIGINT multiply (r9 ADVICE)") {
    // one hot value (0) whose ties span near Long.Min/Max — the
    // sentinel-id case: (tie − lo) · subBuckets would wrap. The guard
    // must route ALL its rows to sub-bucket 0 (monotone, exact), never
    // a wrapped negative bucket.
    val ids = Seq(Long.MinValue + 5L, -1L, 0L, 1L, Long.MaxValue - 5L)
    val df = (ids.map(t => (0L, t)) ++ Seq((1L, 10L), (2L, 20L)))
      .toDF("v", "id")
    val global = df.withColumn("rn",
      row_number().over(Window.orderBy("v", "id")).cast("long"))
    val out = ScaleSafe.rowNumberBucketedHotSafe(df, "v", "id",
      ScaleSafe.rangeBucket("v", 0, 2, 2), "rn",
      hotShare = 0.3, subBuckets = 8)
    assert(out.select("v", "id", "rn")
      .except(global.select("v", "id", "rn")).isEmpty)
    assert(global.select("v", "id", "rn")
      .except(out.select("v", "id", "rn")).isEmpty)
    // and the guard engaged: the hot value's rows share ONE tie
    // sub-bucket (t = 0) rather than wrapping across several
    val subs = ScaleSafe.withHotSafeBucket(df, "v", "id",
        ScaleSafe.rangeBucket("v", 0, 2, 2), "__hsb", 0.3, 8)
      .filter(col("v") === 0L).select(col("__hsb.t"))
      .distinct().collect().map(_.getLong(0)).toSeq
    assert(subs === Seq(0L))
  }

  test("e21b is bit-identical to e21 and avoids the global rank window") {
    val base = SparkEntry.queries("e21_ab_readout")(spark, sf)
      .collect().toSeq
    val twin = SparkEntry.queries("e21b_ab_readout")(spark, sf)
    val bad = twin.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty &&
        w.collectFirst { case a: Aggregate => a }.isEmpty => w
    }
    // only the bracket-bounded selection window may remain (its input
    // is the sketch-bounded Filter, not the corpus)
    assert(bad.size <= 1, s"unexpected windows:\n${bad.mkString("\n")}")
    assert(twin.collect().toSeq === base)
  }

  test("spark.graft.scaleRankPath=distributed flips the classic gates") {
    val name = "e21_ab_readout"
    val base = SparkEntry.queries(name)(spark, sf).collect().toSeq
    spark.conf.set(ScaleSafe.PathConf, "distributed")
    try {
      val dist = SparkEntry.queries(name)(spark, sf)
      // the distributed plan must not contain an unpartitioned Window
      // over non-aggregated input...
      val bad = dist.queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty &&
          w.collectFirst { case a: Aggregate => a }.isEmpty => w
      }
      // ...except the bracket-bounded selection window (its input is a
      // Filter over the bracket, bounded by the sketch guarantee, and
      // it carries no Aggregate) — allow exactly that shape.
      assert(bad.size <= 1, s"unexpected windows:\n${bad.mkString("\n")}")
      assert(dist.collect().toSeq === base)
    } finally spark.conf.unset(ScaleSafe.PathConf)
  }
}
