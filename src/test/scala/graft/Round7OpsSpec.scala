package graft

import org.apache.spark.sql.functions._
import graft.ops.{Curation, Governance, Graph, Similarity}

/** Semantics of the round-7 operator batch: local clustering
  * coefficient, DSIR importance resampling, seeded DP count release,
  * IVF occupancy audit.
  */
class Round7OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- local clustering coefficient ------------------------------------

  private def ccOf(edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Long)] =
    Graph.clusteringCoefficient(edges.toDF("s", "d"), "s", "d")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap

  test("cc: a triangle is fully clustered at every corner") {
    val m = ccOf(Seq(1L -> 2L, 2L -> 3L, 1L -> 3L))
    (1L to 3L).foreach { v =>
      assert(m(v) == (2L, 1L, 10000L), s"node $v: ${m(v)}")
    }
  }

  test("cc: a star center has zero clustering, leaves emit 0 bp") {
    // center 0 with 3 leaves: no closed wedge anywhere
    val m = ccOf(Seq(0L -> 1L, 0L -> 2L, 0L -> 3L))
    assert(m(0L) == (3L, 0L, 0L))
    // degree-1 leaves have no wedge — den guard releases 0, not an error
    assert(m(1L) == (1L, 0L, 0L))
  }

  test("cc: closing one star edge clusters exactly that wedge") {
    val m = ccOf(Seq(0L -> 1L, 0L -> 2L, 0L -> 3L, 1L -> 2L))
    // center: 1 triangle over C(3,2)=3 wedges -> 3333 bp
    assert(m(0L) == (3L, 1L, 3333L))
    // nodes 1,2: degree 2, 1 triangle -> fully clustered
    assert(m(1L) == (2L, 1L, 10000L))
    assert(m(3L) == (1L, 0L, 0L))
  }

  // ---- DSIR importance resampling --------------------------------------

  test("dsir: raw docs sharing the target's vocabulary outrank the rest " +
      "and target docs are never selected") {
    val target = (0L until 6L).map(i =>
      (i, "spark shuffle exchange partition codegen catalyst", true))
    val likeTarget = (10L until 14L).map(i =>
      (i, "spark shuffle partition catalyst exchange plan", false))
    val unlike = (20L until 30L).map(i =>
      (i, "recipe butter flour sugar oven whisk batter", false))
    val docs = (target ++ likeTarget ++ unlike)
      .toDF("doc_id", "text", "is_tgt")
    val out = Curation.dsirResample(docs, "doc_id", "text",
      targetPred = col("is_tgt"), dim = 256, k = 4)
    val ids = out.select("doc_id").as[Long].collect().toSeq
    assert(ids.toSet == Set(10L, 11L, 12L, 13L),
      s"expected the spark-vocabulary docs, got $ids")
    // weights are RELATIVE (smoothing shifts the absolute level): every
    // target-like doc must strictly outrank every off-domain doc
    val all = Curation.dsirResample(docs, "doc_id", "text",
      targetPred = col("is_tgt"), dim = 256, k = 14)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val likeMin = (10L until 14L).map(all).min
    val unlikeMax = (20L until 30L).map(all).max
    assert(likeMin > unlikeMax,
      s"domain separation lost: likeMin=$likeMin unlikeMax=$unlikeMax")
  }

  test("dsir: weights are invariant under repartitioning") {
    val docs = (0L until 40L).map(i =>
      (i, s"tok${i % 7} tok${i % 3} tok${i % 11}", i % 5 == 0))
      .toDF("doc_id", "text", "is_tgt")
    val a = Curation.dsirResample(docs, "doc_id", "text",
      col("is_tgt"), dim = 128, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = Curation.dsirResample(docs.repartition(7), "doc_id", "text",
      col("is_tgt"), dim = 128, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)
  }

  // ---- seeded DP count release -----------------------------------------

  test("dp release: deterministic per seed, noisy, never negative, " +
      "all groups released") {
    val df = (0L until 400L).map(i => (s"g${i % 7}", i)).toDF("g", "x")
    val a = Governance.dpCountRelease(df, Seq("g"), epsilon = 1.0,
      seed = "s1").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = Governance.dpCountRelease(df, Seq("g"), epsilon = 1.0,
      seed = "s1").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val c = Governance.dpCountRelease(df, Seq("g"), epsilon = 1.0,
      seed = "s2").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b, "same seed must reproduce the release")
    assert(a != c, "a fresh seed must redraw the noise")
    assert(a.size == 7 && a.values.forall(_ >= 0L))
    // Laplace(1) noise at n≈57: released counts stay near the truth
    a.foreach { case (g, n) =>
      assert(math.abs(n - 57L) <= 30L, s"group $g released $n, truth ~57")
    }
  }

  test("dp release: epsilon scales the noise magnitude") {
    val df = (0L until 4000L).map(i => (s"g${i % 4}", i)).toDF("g", "x")
    def dev(eps: Double): Long =
      Governance.dpCountRelease(df, Seq("g"), eps, seed = "s1")
        .collect().map(r => math.abs(r.getLong(1) - 1000L)).max
    // ε=0.01 (b=100) must perturb more than ε=10 (b=0.1) on the same draw
    assert(dev(0.01) > dev(10.0))
  }

  // ---- graph-ANN beam search -------------------------------------------

  private def beamVecs: Seq[(Long, Array[Float])] =
    (0L until 24L).map { i =>
      (i, Array.tabulate(8)(d => math.sin(i * 131.0 + d * 17.0).toFloat))
    }

  // the engine's fixed-point cosine, replicated exactly
  private def cosFp(a: Array[Float], b: Array[Float]): Double = {
    def dot(x: Array[Float], y: Array[Float]): Long =
      x.indices.map(i => math.round(x(i).toDouble * y(i).toDouble * 1e12))
        .sum
    dot(a, b).toDouble / (math.sqrt(dot(a, a).toDouble) *
      math.sqrt(dot(b, b).toDouble))
  }

  test("beam search: one full-graph hop from the entry is exhaustive — " +
      "result equals the exact cosine top-k") {
    val vecs = beamVecs.toDF("vec_id", "embedding")
    val qs = vecs.filter(col("vec_id") < 3)
    // nCells=1 + graphK=23: the entry's neighbor list IS the corpus, so
    // one round visits every node and beam search degenerates to exact
    val got = Similarity.graphBeamSearch(vecs, qs, "vec_id", "embedding",
        k = 4, graphK = 23, nCells = 1, beam = 4, rounds = 1)
      .select("q_id", "rank", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val byId = beamVecs.toMap
    val want = (0L until 3L).flatMap { q =>
      beamVecs.filter(_._1 != q)
        .map { case (c, v) => (c, cosFp(byId(q), v)) }
        .sortBy { case (c, cos) => (-cos, c) }
        .take(4).zipWithIndex
        .map { case ((c, _), i) => (q, (i + 1).toLong, c) }
    }.toSet
    assert(got == want)
  }

  test("beam search: more rounds never lose the best found so far") {
    val vecs = beamVecs.toDF("vec_id", "embedding")
    val qs = vecs.filter(col("vec_id") < 3)
    def best(rounds: Int): Map[Long, Double] =
      Similarity.graphBeamSearch(vecs, qs, "vec_id", "embedding",
          k = 1, graphK = 3, nCells = 2, beam = 3, rounds = rounds)
        .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val r1 = best(1)
    val r3 = best(3)
    r1.keys.foreach { q =>
      assert(r3(q) >= r1(q) - 1e-12,
        s"query $q: round-3 best ${r3(q)} lost ground vs round-1 ${r1(q)}")
    }
  }

  test("balancedCells: the sqrt rule, power-of-two, clamped") {
    // 2^ceil(ceil(log2 N)/2), clamped to [16, 4096]
    assert(Similarity.balancedCells(1L) == 16)
    assert(Similarity.balancedCells(200L) == 16)    // 2^4 floor
    assert(Similarity.balancedCells(6400L) == 128)  // bitlen 13 -> 2^7
    assert(Similarity.balancedCells(64000L) == 256) // bitlen 16 -> 2^8
    assert(Similarity.balancedCells(1L << 40) == 4096) // ceiling
  }

  // ---- streaming PSI drift ---------------------------------------------

  test("psi drift: nonnegative by construction, and a corpus scored " +
      "against its own generator does not alert") {
    // sf0.01: ~330 events/day — enough volume that the smoothing term
    // doesn't dominate (the granularity lesson in the op's doc)
    val out = graft.streaming.StreamOps.streamPsiDrift(spark,
      "/root/testdata/sf0.01", "psi_spec_" + System.nanoTime()).collect()
    assert(out.nonEmpty, "decided windows must emit")
    // each PSI term (p-q)ln(p/q) >= 0, so the rounded sum is too
    assert(out.forall(_.getAs[Long]("psi_fp") >= 0L))
    // same generator all month: the typical day must sit far under the
    // 0.2 industry alert line
    val sorted = out.map(_.getAs[Long]("psi_fp")).sorted
    val median = sorted(sorted.length / 2)
    assert(median < 200000000L, s"median PSI $median vs alert 2e8")
  }

  // ---- U-shaped attribution --------------------------------------------

  test("e24: credit conserves purchase value exactly — every conversion " +
      "releases 1000 per-mille, no integer-div leakage") {
    val out = SparkEntry.queries("e24_position_attribution")(spark, sf)
      .agg(sum(col("credit_pmc"))).collect()(0).getLong(0)
    // ground truth: 1000 x the total purchase cents of all conversion
    // groups (the window assigns every purchase to exactly one group)
    val truth = Tables.load(spark, sf, "events")
      .filter(col("event_type") === "purchase")
      .agg(sum(round(col("value") * 100).cast("long") * 1000L))
      .collect()(0).getLong(0)
    assert(out == truth, s"credited $out vs purchase mass $truth")
  }

  // ---- golden record ---------------------------------------------------

  test("j13: source priority wins per column and conflicts are flagged " +
      "only where sources disagree") {
    val out = SparkEntry.queries("j13_golden_record")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getString(2), r.getString(3),
          r.getBoolean(4))).toMap
    val names = Tables.load(spark, sf, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2)))
      .toMap
    names.foreach { case (k, (name, seg)) =>
      val (nSrc, gName, gSeg, conflict) = out(k)
      // src 3 covers every key, so every customer must emit
      assert(nSrc >= 1L)
      // priority: src 1 (even keys, original casing) beats src 2
      // (lowercased); src 3 only fills keys neither covers
      if (k % 2 == 0) assert(gName == name, s"key $k: src-1 name must win")
      else if (k % 3 == 0) assert(gName == name.toLowerCase,
        s"key $k: src-2 lowercased name must win over src-3")
      else assert(gName == name, s"key $k: src-3 fallback")
      // segment: src 3 reports NULL, so it comes from src 1 or 2 if
      // either covers the key, else stays null
      if (k % 2 == 0 || k % 3 == 0) assert(gSeg == seg)
      else assert(gSeg == null)
      // conflict flag: src 3 always reports the original name, so a
      // disagreeing value set exists iff src 2 covers the key and
      // lowercasing actually changes the name
      val expected = (k % 3 == 0) && name != name.toLowerCase
      assert(conflict == expected,
        s"key $k conflict=$conflict expected=$expected")
    }
  }

  // ---- IVF occupancy audit ---------------------------------------------

  test("ivf occupancy: cells partition the corpus and empty cells emit") {
    val vecs = (0L until 64L).map { i =>
      (i, Array.tabulate(8)(d => if (d == (i % 4).toInt) 1.0f else 0.01f))
    }.toDF("vec_id", "embedding")
    val out = Similarity.ivfOccupancy(vecs, "vec_id", "embedding",
      nCells = 8).collect()
    assert(out.length == 8, s"all 8 cells must emit: ${out.length}")
    assert(out.map(_.getLong(1)).sum == 64L,
      "occupancies must partition the corpus exactly")
    assert(out.forall(_.getLong(2) == 64L))
    // only 4 distinct directions -> at least one of 8 cells is empty,
    // and an empty cell's load is 0 bp
    val empty = out.filter(_.getLong(1) == 0L)
    assert(empty.nonEmpty, "4-direction corpus must leave empty cells")
    assert(empty.forall(_.getLong(3) == 0L))
    // a perfectly balanced cell would sit at 10000 bp; the hot cells
    // must be above, by conservation
    assert(out.map(_.getLong(3)).max > 10000L)
  }
}
