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
      assert(r.getAs[Long]("hamming") <= 8L)
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
