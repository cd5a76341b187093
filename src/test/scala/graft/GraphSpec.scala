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
}
