package graft

import org.apache.spark.sql.functions._
import graft.ops.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int = 3) =
    Graph.pageRank(edges.toDF("s", "d"), "s", "d", iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("star graph: the hub outranks every leaf") {
    // undirected star 0-{1,2,3,4}, symmetrized
    val star = Seq[(Long, Long)](0L -> 1L, 0L -> 2L, 0L -> 3L, 0L -> 4L)
    val sym = star ++ star.map(_.swap)
    val r = ranks(sym)
    assert(r.keySet === Set(0L, 1L, 2L, 3L, 4L))
    assert(r(0L) > r(1L) && r(1L) == r(2L) && r(2L) == r(3L) &&
      r(3L) == r(4L), s"hub must dominate symmetric leaves: $r")
  }

  test("mass conservation: total score stays within rounding loss of 1e12") {
    val star = Seq[(Long, Long)](0L -> 1L, 0L -> 2L, 0L -> 3L, 0L -> 4L)
    val r = ranks(star ++ star.map(_.swap))
    val total = r.values.sum
    // each of n nodes can lose < 1 unit per division, 2 divisions per
    // round, 3 rounds + the seed split
    val maxLoss = 5L * (2 * 3 + 1)
    assert(total <= Graph.Scale && total >= Graph.Scale - maxLoss,
      s"mass leaked: $total vs ${Graph.Scale}")
  }

  test("fixed-point result is invariant under repartitioning") {
    val pairs = (1L to 40L).map(i => (i % 7, i)) // 7 hubs, 40 spokes
    val sym = pairs ++ pairs.map(_.swap)
    val a = Graph.pageRank(sym.toDF("s", "d"), "s", "d")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val b = Graph.pageRank(sym.toDF("s", "d").repartition(13), "s", "d")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(a.sameElements(b), "score bits changed under repartition")
  }

  test("two-node cycle converges to the uniform distribution") {
    val r = ranks(Seq(1L -> 2L, 2L -> 1L), iters = 5)
    assert(r(1L) === r(2L))
    assert(math.abs(r(1L) - Graph.Scale / 2) <= 20,
      s"cycle should stay uniform: $r")
  }

  private def tri(edges: Seq[(Long, Long)]): Long =
    Graph.triangleCount(edges.toDF("s", "d"), "s", "d")
      .collect().head.getLong(0)

  test("triangle count: K4 has 4, a star has 0, duplicates don't double") {
    val k4 = for { a <- 0L to 3L; b <- 0L to 3L if a < b } yield (a, b)
    assert(tri(k4) === 4L)
    assert(tri(Seq(0L -> 1L, 0L -> 2L, 0L -> 3L)) === 0L)
    // same triangle reported in both directions and twice: still 1
    assert(tri(Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 2L -> 1L, 1L -> 2L)) === 1L)
  }

  test("triangle count matches the naive a<b definition on a random graph") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(120)((rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      .filter { case (a, b) => a != b }
    val canon = edges.map { case (a, b) => (a min b, a max b) }.distinct
    val set = canon.toSet
    val naive = (for {
      (a, b) <- canon; (c, d) <- canon
      if c == b && set.contains((a, d))
    } yield 1).size
    assert(tri(edges) === naive.toLong)
  }

  test("bfs levels: path graph depths, cap respected, unreached absent") {
    // path 1-2-3-4-5 symmetrized, plus isolated 9-10 component
    val path = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 9L -> 10L)
    val sym = path ++ path.map(_.swap)
    val got = Graph.bfsLevels(sym.toDF("s", "d"), "s", "d",
        source = 1L, maxDepth = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L),
      s"expected depths along the path, got $got")
  }

  test("bfs levels keep the MINIMUM depth when paths of mixed length meet") {
    // 1→2→3 and direct 1→3: node 3 is depth 1, not 2
    val e = Seq(1L -> 2L, 2L -> 3L, 1L -> 3L)
    val got = Graph.bfsLevels(e.toDF("s", "d"), "s", "d", 1L, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(3L) === 1L && got(2L) === 1L && got(1L) === 0L)
  }

  private def sssp(edges: Seq[(Long, Long, Long)], src: Long,
                   rounds: Int): Map[Long, Long] =
    Graph.ssspRounds(edges.toDF("s", "d", "w"), "s", "d", "w", src, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("sssp: cheap long path beats expensive direct edge, given rounds") {
    // 1→2→3 costs 1+1=2; direct 1→3 costs 10
    val e = Seq((1L, 2L, 1L), (2L, 3L, 1L), (1L, 3L, 10L))
    assert(sssp(e, 1L, 1) === Map(1L -> 0L, 2L -> 1L, 3L -> 10L),
      "one round can only use direct edges")
    assert(sssp(e, 1L, 2) === Map(1L -> 0L, 2L -> 1L, 3L -> 2L),
      "two rounds discover the cheaper 2-hop path")
  }

  test("sssp: frontier-only expansion still matches full Bellman-Ford") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(80)(
      (rnd.nextInt(12).toLong, rnd.nextInt(12).toLong,
        (rnd.nextInt(9) + 1).toLong))
      .filter { case (a, b, _) => a != b }
    // reference: dense k-round Bellman-Ford on the min-collapsed edges
    val minEdges = edges.groupBy(e => (e._1, e._2))
      .map { case ((a, b), es) => (a, b, es.map(_._3).min) }.toSeq
    var ref = Map(0L -> 0L)
    for (_ <- 1 to 4) {
      val relaxed = minEdges.flatMap { case (a, b, w) =>
        ref.get(a).map(d => b -> (d + w)) }
      ref = (ref.toSeq ++ relaxed).groupBy(_._1)
        .map { case (k, vs) => k -> vs.map(_._2).min }
    }
    assert(sssp(edges, 0L, 4) === ref)
  }

  test("sssp collapses parallel duplicate edges to their minimum weight") {
    val e = Seq((1L, 2L, 7L), (1L, 2L, 3L), (1L, 2L, 5L))
    assert(sssp(e, 1L, 1) === Map(1L -> 0L, 2L -> 3L))
  }

  test("k-truss: support filtering keeps cohesive edges and cascades " +
      "deletions across rounds") {
    // K5 minus edge (4,5): every remaining edge sits in >= 2 triangles
    // (k=4 keeps all 9), but at k=5 the spoke edges (support 2) die in
    // round 1 and the leftover triangle (support 1) dies in round 2.
    val edges = (for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j))
      .filterNot(_ == (4L, 5L)).toDF("s", "d")
    val k4 = Graph.kTruss(edges, "s", "d", k = 4, rounds = 2).count()
    assert(k4 === 9L)
    val k5 = Graph.kTruss(edges, "s", "d", k = 5, rounds = 2).count()
    assert(k5 === 0L)
  }

  test("label propagation converges two cliques to their min labels " +
      "and breaks ties deterministically") {
    // two K4 cliques bridged by one edge: each clique's internal
    // majority (3 votes) outweighs the bridge (1 vote), so LPA settles
    // clique A on label 1 and clique B on label 5 and stays there.
    // (Triangles are NOT enough: with 2-vote majorities the min-label
    // tie-break cascades across the bridge and merges the communities —
    // a real, documented synchronous-LPA behavior.)
    val k4a = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val k4b = for (i <- 5L to 8L; j <- (i + 1) to 8L) yield (i, j)
    val edges = (k4a ++ k4b :+ (4L, 5L)).toDF("s", "d")
    val out = Graph.labelPropagation(edges, "s", "d", rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 4L).forall(out(_) === 1L), out.toString)
    assert((5L to 8L).forall(out(_) === 5L), out.toString)
    // a path of two nodes: each sees exactly one neighbor label — they
    // swap forever under synchronous rounds; after an EVEN round count
    // both are back at their own label (determinism, not convergence)
    val path = Seq((10L, 11L)).toDF("s", "d")
    val p2 = Graph.labelPropagation(path, "s", "d", rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(p2 === Map(10L -> 10L, 11L -> 11L))
  }

  private def stress(edges: Seq[(Long, Long)], seeds: Seq[Long],
                     depth: Int = 3): Map[Long, Long] =
    Graph.stressCentrality(edges.toDF("s", "d"), "s", "d",
        seeds.toDF("s"), maxDepth = depth)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("stress centrality: path graph counts paths through interior " +
      "nodes; endpoints and unreached nodes are absent") {
    // path 1-2-3-4, seed 1, depth 3: through 2 run 1->3 and 1->4
    // (stress 2); through 3 runs 1->4 (stress 1); 1 and 4 are never
    // interior and must not appear.
    val path = Seq[(Long, Long)](1L -> 2L, 2L -> 3L, 3L -> 4L)
    assert(stress(path, Seq(1L)) === Map(2L -> 2L, 3L -> 1L))
    // depth 2 truncates the 1->4 continuation through 3
    assert(stress(path, Seq(1L), depth = 2) === Map(2L -> 1L))
  }

  test("stress centrality: diamond splits sigma across branches and " +
      "sums over seeds") {
    // diamond 1-{2,3}-4: from seed 1, each of 2 and 3 carries one
    // shortest 1->4 path; 4 has sigma 2 but no continuation (depth
    // bound leaves nothing past it), so only 2 and 3 score.
    val diamond = Seq[(Long, Long)](1L -> 2L, 1L -> 3L, 2L -> 4L, 3L -> 4L)
    assert(stress(diamond, Seq(1L)) === Map(2L -> 1L, 3L -> 1L))
    // adding seed 4 mirrors the count: 2 and 3 each also carry 4->1
    assert(stress(diamond, Seq(1L, 4L)) === Map(2L -> 2L, 3L -> 2L))
  }

  test("stress centrality: sigma multiplies along independent stages " +
      "(two stacked diamonds give the middle node sigma*h = 2*2)") {
    // 1-{2,3}-4-{5,6}-7: sigma(4)=2 and its continuations within depth
    // 3 are 5 and 6 (h(4)=2; the 7 layer sits past the bound), so
    // delta(4) = 2*2 = 4. For node 2: h(2) = 1 + h(4) = 3 (paths to 4,
    // 5, 6), delta(2) = 1*3 = 3. Nodes 5, 6 are at the depth bound —
    // nothing runs through them within the truncation, so they are
    // absent, exactly like t13's harmonic truncation discipline.
    val g = Seq[(Long, Long)](1L -> 2L, 1L -> 3L, 2L -> 4L, 3L -> 4L,
      4L -> 5L, 4L -> 6L, 5L -> 7L, 6L -> 7L)
    assert(stress(g, Seq(1L)) === Map(2L -> 3L, 3L -> 3L, 4L -> 4L))
  }
}
