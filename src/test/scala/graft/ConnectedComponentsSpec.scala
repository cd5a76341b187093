package graft

import graft.ops.ConnectedComponents

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.labelPropagation(
        pairs.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain component collapses to its minimum id") {
    // 1-2-3-4-5 as a path: diameter 4, needs several propagation rounds
    val got = cc(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("disjoint components keep separate labels; edge order irrelevant") {
    val got = cc(Seq((10L, 7L), (20L, 25L), (25L, 21L), (7L, 9L)))
    assert(got === Map(7L -> 7L, 9L -> 7L, 10L -> 7L,
      20L -> 20L, 21L -> 20L, 25L -> 20L))
  }

  test("triangle + pendant (cycle safety: labels reach a fixpoint)") {
    val got = cc(Seq((3L, 5L), (5L, 8L), (8L, 3L), (8L, 11L)))
    assert(got === Map(3L -> 3L, 5L -> 3L, 8L -> 3L, 11L -> 3L))
  }

  test("exhausted round budget fails fast instead of returning partial labels") {
    val path = (1L to 6L).map(i => (i, i + 1)) // diameter 5
    val ex = intercept[IllegalStateException] {
      ConnectedComponents.labelPropagation(
        path.toDF("a", "b"), "a", "b", maxRounds = 2).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("keepers = one minimum per component") {
    val got = ConnectedComponents.keepers(
        Seq((1L, 2L), (2L, 3L), (9L, 8L)).toDF("a", "b"), "a", "b")
      .collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 8L))
  }

  private def ccStar(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.alternatingStar(
        pairs.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("alternating star agrees with label propagation on a long path") {
    // Path 1-2-…-12: diameter 11 — the shape star-alternation collapses
    // in O(log n) rounds where propagation needs 11.
    val path = (1L to 11L).map(i => (i, i + 1))
    assert(ccStar(path) === cc(path))
  }

  test("alternating star agrees with label propagation on random graphs") {
    val gen = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val n = 20 + trial * 10
      val edges = (1 to n).map { _ =>
        (gen.nextInt(n).toLong + 1, gen.nextInt(n).toLong + 1)
      }.filter(e => e._1 != e._2)
      val star = ccStar(edges)
      val prop = cc(edges)
      assert(star === prop, s"trial $trial (n=$n): $star vs $prop")
    }
  }

  test("run() falls back to alternating star on an adversarial long chain") {
    // Path 0-1-…-199: diameter 199. Propagation alone would need 200
    // rounds; run() must detect the blown budget after its small prefix
    // and hand over to the star algorithm, which collapses the chain in
    // O(log n) rounds (starRounds = 10 >= ~log2(200) forces that bound —
    // a diameter-walking fallback would throw here).
    val path = (0L until 199L).map(i => (i, i + 1))
    val got = ConnectedComponents.run(path.toDF("a", "b"), "a", "b",
        propagationRounds = 5, starRounds = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === (0L to 199L).map(_ -> 0L).toMap)
  }

  test("run() fallback labels match label propagation exactly") {
    // 64-chain plus a disjoint triangle and a self-loop singleton: the
    // fallback path must reproduce propagation's labeling bit-for-bit,
    // including the self-loop-only node the star form drops internally.
    val edges = (100L until 163L).map(i => (i, i + 1)) ++
      Seq((7L, 9L), (9L, 3L), (3L, 7L), (500L, 500L))
    val viaStar = ConnectedComponents.run(edges.toDF("a", "b"), "a", "b",
        propagationRounds = 4, starRounds = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaProp = ConnectedComponents.labelPropagation(
        edges.toDF("a", "b"), "a", "b", maxRounds = 80)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaStar === viaProp)
    assert(viaStar(500L) === 500L) // singleton restored
  }

  test("exact keeper policy vs c2's one-pass approximation") {
    // Pairs (1,2) and (2,3): one-pass drops every id_b {2,3}; the exact
    // policy also keeps only 1 — they agree here. But pairs (2,3),(1,3)
    // chain through 3: one component {1,2,3}, exact keeps min=1 only.
    val got = ConnectedComponents.keepers(
        Seq((2L, 3L), (1L, 3L)).toDF("a", "b"), "a", "b")
      .collect().map(_.getLong(0)).toSet
    assert(got === Set(1L))
  }
}
