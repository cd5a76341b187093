package graft

import org.apache.spark.sql.functions._
import graft.ops.{Governance, Graph}

/** Semantics of the second round-6 operator batch: HITS, t-closeness,
  * Zipf fit, EWMA smoothing, media near-dup pairs.
  */
class Round6bOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- HITS -------------------------------------------------------------

  private def hits(edges: Seq[(Long, Long)]) =
    Graph.hits(edges.toDF("s", "d"), "s", "d", iterations = 2)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("hits: bipartite sides get one-sided scores") {
    // hubs 1,3 -> authorities 2,4; supplier 2 has two in-links, 4 has one
    val h = hits(Seq(1L -> 2L, 1L -> 4L, 3L -> 2L))
    assert(h(2L)._1 > h(4L)._1, s"auth(2) must beat auth(4): $h")
    assert(h(1L)._2 > h(3L)._2, s"hub(1) must beat hub(3): $h")
    // pure hubs carry zero authority and vice versa
    assert(h(1L)._1 == 0L && h(3L)._1 == 0L)
    assert(h(2L)._2 == 0L && h(4L)._2 == 0L)
  }

  test("hits: normalized totals stay within the [Scale/2, 2*Scale] band") {
    // the flooring divisor max(1, total div Scale) renormalizes only to
    // within a factor of 2 (total=2.3*Scale divides by 2, not 2.3) —
    // uniform per pass, so rankings are exact and magnitudes bounded
    val h = hits(Seq(1L -> 2L, 1L -> 4L, 3L -> 2L, 3L -> 4L, 5L -> 2L))
    val authTotal = h.values.map(_._1).sum
    val hubTotal = h.values.map(_._2).sum
    assert(authTotal >= Graph.Scale / 2 && authTotal <= 2 * Graph.Scale,
      s"auth mass off: $authTotal vs ${Graph.Scale}")
    assert(hubTotal >= Graph.Scale / 2 && hubTotal <= 2 * Graph.Scale,
      s"hub mass off: $hubTotal vs ${Graph.Scale}")
  }

  test("hits: fixed point is invariant under repartitioning") {
    val pairs = (1L to 50L).map(i => ((i % 5) * 2, i * 2 + 1))
    val df = pairs.toDF("s", "d")
    val a = Graph.hits(df, "s", "d").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = Graph.hits(df.repartition(13), "s", "d").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a === b)
  }

  // ---- t-closeness ------------------------------------------------------

  private def tclose(rows: Seq[(String, String)]) =
    Governance.tClosenessAudit(rows.toDF("grp", "sens"),
        qidCols = Seq(col("grp")), qidNames = Seq("g"),
        sensitive = col("sens"), tBasisPoints = 2500)
      .collect().map(r => r.getString(0) -> r).toMap

  test("t-closeness: a group mirroring the global distribution scores 0") {
    // both groups are 50/50 x-y — exactly the corpus distribution
    val r = tclose(Seq("a" -> "x", "a" -> "y", "b" -> "x", "b" -> "y"))
    assert(r("a").getAs[Long]("tvd_num") == 0L)
    assert(r("a").getAs[Boolean]("t_ok"))
  }

  test("t-closeness: a homogeneous group in a mixed corpus is flagged") {
    // corpus 2:2; group a is all-x → TVD = |1 - 0.5| = 0.5 → 5000 bp
    val r = tclose(Seq("a" -> "x", "a" -> "x", "b" -> "y", "b" -> "y"))
    assert(r("a").getAs[Long]("tvd_bp") == 5000L)
    assert(!r("a").getAs[Boolean]("t_ok"))
    // cross-multiplied identity: num/den = 1/2 exactly
    assert(r("a").getAs[Long]("tvd_num") * 2 ==
      r("a").getAs[Long]("tvd_den"))
  }

  test("t-closeness: absent-value term counts sensitive values the " +
      "group never carries") {
    // group a never sees z (1/4 of the corpus): TVD >= 1/8
    val r = tclose(Seq("a" -> "x", "a" -> "y", "b" -> "z", "b" -> "x"))
    assert(r("a").getAs[Long]("tvd_bp") >= 1250L)
  }

  test("t-closeness: a NULL-keyed QID group is audited, not dropped") {
    // the null-QID rows form their own group — a release audit that
    // silently skips them is a privacy hole (an equi-join-back on the
    // QID key would do exactly that; the op must join null-safely)
    val rows = Seq(
      (null.asInstanceOf[String], "x"), (null.asInstanceOf[String], "x"),
      ("b", "x"), ("b", "y"))
    val out = Governance.tClosenessAudit(rows.toDF("grp", "sens"),
        qidCols = Seq(col("grp")), qidNames = Seq("g"),
        sensitive = col("sens"), tBasisPoints = 2500)
      .collect()
    assert(out.length == 2, s"expected null group + b, got ${out.toSeq}")
    val nullRow = out.find(_.isNullAt(0)).getOrElse(
      fail("null-QID group missing from audit output"))
    // null group is all-x in a 3:1 corpus: TVD = 1/4 -> 2500 bp, n_g = 2
    assert(nullRow.getAs[Long]("k_of_group") == 2L)
    assert(nullRow.getAs[Long]("tvd_bp") == 2500L)
  }

  // ---- CDC chunking -----------------------------------------------------

  private def digests(s: String): Seq[String] = {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val arr = graft.functions.CdcChunks.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))
      .asInstanceOf[ArrayData]
    (0 until arr.numElements()).map { i =>
      arr.getStruct(i, 3).getUTF8String(2).toString
    }
  }

  test("cdc: chunks cover the document exactly, in order") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val s = ("spark join hash batch " * 40).trim
    val arr = graft.functions.CdcChunks.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))
      .asInstanceOf[ArrayData]
    var expectStart = 0L
    (0 until arr.numElements()).foreach { i =>
      val r = arr.getStruct(i, 3)
      assert(r.getLong(0) == expectStart, "chunks must tile the doc")
      expectStart += r.getLong(1)
    }
    assert(expectStart == s.length.toLong)
  }

  test("cdc: boundaries re-synchronize after a front insertion") {
    // THE content-defined property: prepend bytes and the tail chunks
    // keep their digests (fixed-size blocking would re-digest all)
    // aperiodic content so chunk digests are distinct
    val base = (1 to 400).map(i => s"w${i * 7919}").mkString(" ")
    val a = digests(base)
    val b = digests("XYZPREFIX " + base)
    assert(a.size > 3, s"need several chunks, got ${a.size}")
    val shared = a.toSet intersect b.toSet
    assert(shared.size >= a.toSet.size - 2,
      s"only ${shared.size}/${a.toSet.size} chunk digests survived the shift")
  }

  test("cdc: short and empty docs degrade to whole-doc / no chunks") {
    assert(digests("") === Seq())
    val one = digests("tiny")
    assert(one.size == 1)
  }

  // ---- Modularity -------------------------------------------------------

  test("modularity: two clean cliques under the true partition score " +
      "positive; under a cross-cutting partition they score negative") {
    // cliques {0,1,2} and {3,4,5}, one bridge 2-3
    val cl = Seq(0L -> 1L, 0L -> 2L, 1L -> 2L, 3L -> 4L, 3L -> 5L,
      4L -> 5L, 2L -> 3L)
    val edges = cl.toDF("a", "b")
    val good = Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L),
      (5L, 1L)).toDF("node", "community")
    val qGood = Graph.modularity(edges, "a", "b", good, "node", "community")
      .agg(sum(col("q_num")).as("n"), first(col("q_den")).as("d"))
      .collect().head
    assert(qGood.getLong(0) > 0, s"true partition must score Q > 0: $qGood")
    // pairing one node from each clique: worse than chance
    val bad = Seq((0L, 0L), (3L, 0L), (1L, 1L), (4L, 1L), (2L, 2L),
      (5L, 2L)).toDF("node", "community")
    val qBad = Graph.modularity(edges, "a", "b", bad, "node", "community")
      .agg(sum(col("q_num")).as("n")).collect().head
    assert(qBad.getLong(0) < qGood.getLong(0))
  }

  test("modularity: a single community scores exactly 0") {
    // Q = m/m - (2m/2m)^2 = 0 — the no-information partition
    val edges = Seq(0L -> 1L, 1L -> 2L, 2L -> 3L).toDF("a", "b")
    val lab = (0L to 3L).map(i => (i, 7L)).toDF("node", "community")
    val r = Graph.modularity(edges, "a", "b", lab, "node", "community")
      .collect()
    assert(r.length == 1 && r.head.getAs[Long]("q_num") == 0L)
  }

  // ---- Assortativity ----------------------------------------------------

  test("assortativity: a star is perfectly disassortative (r = -1)") {
    val star = (1L to 6L).map(i => (0L, i)).toDF("a", "b")
    val r = Graph.assortativity(star, "a", "b").collect().head
    // r_num/r_den = -1 exactly: hub(6)–leaf(1) on every edge
    assert(r.getAs[Long]("r_num") == -r.getAs[Long]("r_den"))
    assert(r.getAs[Long]("r_den") > 0)
  }

  test("assortativity: a clique has zero degree variance (r_den = 0)") {
    val k4 = Seq(0L -> 1L, 0L -> 2L, 0L -> 3L, 1L -> 2L, 1L -> 3L,
      2L -> 3L).toDF("a", "b")
    val r = Graph.assortativity(k4, "a", "b").collect().head
    assert(r.getAs[Long]("r_den") == 0L && r.getAs[Long]("r_num") == 0L)
  }

  // ---- Streaming CDC apply ----------------------------------------------

  test("st22: tombstoned keys are absent and balances match the last " +
      "change in event order") {
    val rows = SparkEntry.queries("st22_stream_cdc_apply")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // batch replay reference straight off the parquet
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        round(col("value") * 100).cast("long").as("v_cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byUser = ev.groupBy(_._1)
    byUser.foreach { case (uid, es) =>
      val last = es.maxBy(e => (e._3, e._2))
      if (last._2 % 17 == 0) assert(!rows.contains(uid),
        s"user $uid ended on a delete but survived")
      else {
        assert(rows(uid)._1 == last._4, s"user $uid balance")
        assert(rows(uid)._2 == es.length.toLong, s"user $uid change count")
      }
    }
  }

  // ---- RAKE -------------------------------------------------------------

  test("rake: delimiter tokens split phrases and degree scoring ranks " +
      "the long co-occurring phrase first") {
    import graft.ops.TextAnalysis
    // 'the' dominates → stoplist(1) = {the}; phrases split on it
    val docs = Seq(
      (1L, "the quick brown fox the quick brown fox the lazy dog"),
      (2L, "the quick brown fox the lazy dog the lazy dog"))
      .toDF("id", "text")
    val r = TextAnalysis.rakeKeywords(docs, "id", "text",
      nStopwords = 1, maxWords = 8, topK = 10).collect()
    val byPhrase = r.map(x => x.getString(0) ->
      (x.getAs[Long]("n_occ"), x.getAs[Long]("score"))).toMap
    assert(byPhrase.contains("quick brown fox"))
    assert(byPhrase.contains("lazy dog"))
    // deg: quick/brown/fox each in 3 phrases of len 3 → deg 9 each;
    // phrase score 27. lazy/dog in 3 phrases of len 2 → deg 6; score 12.
    assert(byPhrase("quick brown fox") === ((3L, 27L)))
    assert(byPhrase("lazy dog") === ((3L, 12L)))
  }

  // ---- Linear attribution / Gini ----------------------------------------

  test("e18: credit conserves purchase value up to per-purchase " +
      "truncation, and every channel is a known one") {
    val rows = SparkEntry.queries("e18_linear_attribution")(spark, sf)
      .collect()
    val types = rows.map(_.getString(0)).toSet
    assert(types.subsetOf(Set("view", "click", "(direct)")))
    val credited = rows.map(_.getAs[Long]("credit_cents")).sum
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"),
        round(col("value") * 100).cast("long").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4)))
    // attributable purchases: every purchase EXCEPT... none — each one
    // lands in a conv_group; total purchase cents bounds credit above
    val purchaseTotal = ev.filter(_._4 == "purchase").map(_._5).sum
    val nPurchases = ev.count(_._4 == "purchase")
    assert(credited <= purchaseTotal)
    // integer split loses < 1 cent per (purchase, channel) pair
    assert(purchaseTotal - credited <= 2L * nPurchases,
      s"lost ${purchaseTotal - credited} cents over $nPurchases purchases")
  }

  test("a20: Gini stays in [0, 1) per segment") {
    SparkEntry.queries("a20_gini")(spark, sf).collect().foreach { r =>
      val num = r.getAs[Long]("g_num")
      val den = r.getAs[Long]("g_den")
      assert(den > 0)
      assert(num >= 0 && num < den,
        s"segment ${r.getString(0)}: G = $num/$den out of range")
    }
  }

  // ---- Cascade rerank / MAD ---------------------------------------------

  test("n17 cascade: reranked top-5 matches brute force exactly when " +
      "the coarse shortlist is wide enough") {
    val emb = Tables.load(spark, sf, "embeddings")
    val brute = graft.ops.Similarity.bruteForceTopK(
        emb, emb.filter(col("vec_id") < 8), "vec_id", "embedding", k = 5)
      .select("q_id", "c_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val cascade = graft.ops.Similarity.cascadeTopK(
        emb, emb.filter(col("vec_id") < 8), "vec_id", "embedding",
        k = 5, coarseK = 50)
      .select("q_id", "c_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(cascade === brute,
      "int8 coarse@50 must recover the exact top-5 on this corpus")
  }

  test("a21 mad: flagged rows really deviate more than 3 MADs and " +
      "e12's masked-outlier weakness does not apply") {
    val rows = SparkEntry.queries("a21_mad_outliers")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dev = math.abs(r.getAs[Long]("v_cents") -
        r.getAs[Long]("med_cents"))
      assert(dev > 3L * r.getAs[Long]("mad_cents"))
    }
  }

  // ---- Prefix-filtered similarity join ----------------------------------

  test("d22: prefix filtering finds exactly the full inverted index's " +
      "matched set — the lemma moves cost, never answers") {
    import graft.ops.MinHashDedup
    val docs = Tables.load(spark, sf, "documents")
      .filter(col("text").isNotNull)
    val naive = MinHashDedup.ngramJaccardPairs(
        docs.withColumn("blk", lit(1)), "doc_id", "text", "blk")
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pf = MinHashDedup.prefixFilterJaccardPairs(docs, "doc_id", "text")
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pf === naive)
    assert(pf.nonEmpty)
  }

  // ---- Harmonic centrality / PMI ----------------------------------------

  test("harmonic: a path graph scores the middle highest from " +
      "end seeds") {
    // path 0-1-2-3-4, seeds {0, 4}: H(2) = 1/2+1/2 = 1e6;
    // H(1) = 1/1+1/3 = 1333333 (floor); symmetric for 3
    val p = Seq(0L -> 1L, 1L -> 2L, 2L -> 3L, 3L -> 4L)
    val edges = (p ++ p.map(_.swap)).toDF("a", "b")
    val h = Graph.harmonicCentrality(edges, "a", "b",
        sources = Seq(0L, 4L), maxDepth = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(2L) == 1000000L)
    assert(h(1L) == 1000000L + 333333L)
    assert(h(1L) == h(3L))
    // seeds see each other at distance 4
    assert(h(0L) == 250000L && h(4L) == 250000L)
  }

  test("t29: every reported pair clears the count floor and PMI " +
      "ordering is deterministic") {
    val rows = SparkEntry.queries("t29_pmi_collocations")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("n_ab") >= 20L))
    val keys = rows.map(r => (r.getAs[Long]("pmi_fp"), r.getString(0),
      r.getString(1)))
    assert(keys.sortBy(k => (-k._1, k._2, k._3)).toSeq == keys.toSeq)
  }

  // ---- Benford / behavioral entropy -------------------------------------

  test("a22: all nine digits present, counts sum to total, and the " +
      "per-mille profile is Benford's") {
    val rows = SparkEntry.queries("a22_benford")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("digit")).toSeq == (1L to 9L))
    val total = rows.head.getAs[Long]("n_total")
    assert(rows.map(_.getAs[Long]("n_d")).sum == total)
    assert(rows.map(_.getAs[Long]("p_pm")).sum == 1000L)
  }

  test("a23: entropy is 0 for single-type users and bounded by " +
      "ln(5) for the 5-type corpus") {
    val rows = SparkEntry.queries("a23_behavior_entropy")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nats = r.getAs[Long]("entropy_fp").toDouble / 1e9 /
        r.getAs[Long]("n_events")
      assert(nats >= -1e-9 && nats <= math.log(5.0) + 1e-9,
        s"user ${r.getLong(0)}: entropy $nats out of [0, ln 5]")
    }
  }

  // ---- Recall curve / rolling trend -------------------------------------

  test("n18: recall is monotone in nprobe and reaches the truth size " +
      "denominator") {
    val rows = SparkEntry.queries("n18_recall_curve")(spark, sf)
      .collect().sortBy(_.getAs[Long]("nprobe"))
    assert(rows.map(_.getAs[Long]("nprobe")).toSeq == Seq(1L, 2L, 4L))
    val recalls = rows.map(_.getAs[Long]("recall_bp"))
    assert(recalls.sliding(2).forall(p => p(0) <= p(1)),
      s"recall must not fall as probes widen: ${recalls.toSeq}")
    rows.foreach(r => assert(r.getAs[Long]("n_truth") > 0))
  }

  test("e20: slope of a strictly increasing series is positive, " +
      "decreasing negative") {
    // reference check on real rows: recompute one row's slope by hand
    val rows = SparkEntry.queries("e20_rolling_trend")(spark, sf)
      .filter(col("user_id") === 1).orderBy("event_id").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("slope_den") == 336L))
  }

  // ---- DOW anomaly / streaming HLL --------------------------------------

  test("e19: every flagged day is genuinely outside its dow band") {
    SparkEntry.queries("e19_dow_anomaly")(spark, sf).collect().foreach {
      r =>
        val rev = r.getAs[Long]("rev_cents")
        val n = r.getAs[Long]("n_days")
        val s = r.getAs[Long]("s_cents")
        r.getAs[String]("verdict") match {
          case "high" => assert(rev * n > 2 * s)
          case "low" => assert(2 * rev * n < s)
          case v => fail(s"unknown verdict $v")
        }
    }
  }

  test("st23: streaming sketch estimate stays inside the 5% envelope") {
    val rows = SparkEntry.queries("st23_stream_approx_distinct")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r =>
      assert(r.getAs[Boolean]("sketch_within_5pct"),
        s"${r.getString(0)} drifted past 5%"))
  }

  // ---- SparkEntry-level invariants (e17 / t26 / m8 / g9) ----------------

  test("e17 ewma: weight telescope — den is 2^16 - 2^(15-k) for k < 16") {
    val rows = SparkEntry.queries("e17_ewma")(spark, sf)
      .filter(col("user_id") === 1).orderBy("event_id")
      .select("ewma_den").collect().map(_.getLong(0))
    rows.zipWithIndex.foreach { case (den, k) =>
      val expect = if (k >= 16) 65535L else 65536L - (1L << (15 - k))
      assert(den == expect, s"row $k: den $den != $expect")
    }
  }

  test("t26 zipf: slope is negative and log-points are monotone") {
    val row = SparkEntry.queries("t26_zipf_fit")(spark, sf).collect().head
    val num = row.getAs[Long]("slope_num")
    val den = row.getAs[Long]("slope_den")
    assert(den > 0, "x variance must be positive over 1024 ranks")
    assert(num < 0, s"frequency must fall with rank: num=$num")
  }

  test("m8 media near-dup: every pair is within the radius and ordered") {
    val rows = SparkEntry.queries("m8_media_neardup")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("hamming") <= 4L)
      assert(r.getAs[Long]("id_a") < r.getAs[Long]("id_b"))
    }
  }

  test("g9 hits query: authorities are suppliers, hubs are customers") {
    val rows = SparkEntry.queries("g9_hits")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("id")
      if (r.getAs[Long]("auth") > 0) assert(id % 2 == 1,
        s"authority $id must be a supplier (odd id)")
      if (r.getAs[Long]("hub") > 0) assert(id % 2 == 0,
        s"hub $id must be a customer (even id)")
    }
  }
}
