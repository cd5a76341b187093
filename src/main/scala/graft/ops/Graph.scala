package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over an edge list — the link-analysis counterpart to
  * [[ConnectedComponents]]: where components answer "which docs are the
  * same", PageRank answers "which nodes matter", the standard centrality
  * ranking for citation/link/interaction graphs (Page et al., 1999).
  *
  * All arithmetic is exact fixed-point over BIGINT: scores are scaled by
  * 1e12 and every division is integer `div` applied in a fixed order, so
  * the result is bit-identical under any partitioning, any summation
  * order, and in any engine that floors positive integer division — which
  * is what lets an iterative double-typed algorithm sit under a
  * hash-equality oracle gate. The rounding loss per node per round is
  * < 1 ulp of the 1e-12 scale; ranking order is unaffected for any graph
  * whose score gaps exceed ~n·1e-12.
  *
  * Scale shape (the 100 TB discipline):
  *   - each round is ONE shuffle: edges ⋈ scores on src (the edge list
  *     carries its out-degree, so the join is 2-way, not 3-way), then
  *     `groupBy(dst).sum` — partial aggregation combines map-side;
  *   - the edge list is persisted once and reused every round; scores are
  *     `localCheckpoint`ed per round to sever iterative lineage (reliable
  *     `checkpoint` on a cluster);
  *   - the node count enters as a one-row broadcast, never a driver
  *     constant baked into the plan before the data is known;
  *   - symmetric graphs have no dangling nodes; for directed inputs with
  *     sinks, the lost mass term would be one extra one-row broadcast
  *     (anti join of nodes against edge sources), same shape.
  */
object Graph {

  val Scale = 1000000000000L // 1e12 fixed-point

  /** Exact fixed-point PageRank.
    *
    * @param edges directed edge list; `srcCol`/`dstCol` name the columns.
    *              Every node must have out-degree >= 1 (symmetrize the
    *              graph first if it has sinks).
    * @param iterations number of Jacobi rounds
    * @param damping damping numerator out of 100 (85 = the classic 0.85)
    * @return (id, score) with score scaled by 1e12; sum over nodes is
    *         Scale minus bounded rounding loss
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int = 3, damping: Int = 85): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
    // out-degree rides on the edge row: the per-round join is then a
    // single equi-join on src instead of edges ⋈ deg ⋈ scores
    val withDeg = e.join(
        e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .persist()
    val nodes = withDeg.select(col("src").as("id")).distinct()
    val n = nodes.agg(count(lit(1)).as("n_nodes"))
    val teleportNum = Scale / 100 * (100 - damping) // e.g. 0.15 * Scale
    var scores = nodes.crossJoin(broadcast(n))
      .select(col("id"), expr(s"${Scale}L div n_nodes").as("score"))
      .localCheckpoint()
    for (_ <- 1 to iterations) {
      scores = withDeg
        .join(scores, withDeg("src") === scores("id"))
        .select(col("dst"),
          expr(s"(score * $damping div 100) div outdeg").as("contrib"))
        .groupBy("dst").agg(sum(col("contrib")).as("in_mass"))
        .crossJoin(broadcast(n))
        .select(col("dst").as("id"),
          (expr(s"${teleportNum}L div n_nodes") + col("in_mass"))
            .as("score"))
        .localCheckpoint()
    }
    withDeg.unpersist()
    scores
  }
}
