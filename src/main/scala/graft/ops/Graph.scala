package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
  *     checkpointed per round to sever iterative lineage via
  *     [[graft.Checkpoints.sever]] (executor-local by default, reliable
  *     when `spark.graft.checkpointDir` is set);
  *   - the node count enters as a one-row broadcast, never a driver
  *     constant baked into the plan before the data is known;
  *   - symmetric graphs have no dangling nodes; for directed inputs with
  *     sinks, the lost mass term would be one extra one-row broadcast
  *     (anti join of nodes against edge sources), same shape.
  */
object Graph {

  val Scale = 1000000000000L // 1e12 fixed-point

  /** Pin `df` in cache for the duration of `body`, releasing it even
    * when an iteration round (or a sever job inside one) throws — an
    * unguarded `persist(); loop; unpersist()` leaks the cached edge
    * list for the session's lifetime on any mid-loop failure (r11
    * review). When `rounds < 1` the pin is skipped entirely: the
    * degenerate call returns a LAZY frame that still reads `df`, so an
    * eager unpersist would fire before the caller's first action and
    * silently lose the cache benefit. Every caller's returned frame is
    * otherwise eagerly severed inside `body`, so releasing the pin in
    * `finally` never forces a recompute.
    */
  private def pinned[T](df: DataFrame, rounds: Int = 1)(body: => T): T =
    if (rounds < 1) body
    else {
      df.persist()
      try body finally df.unpersist()
    }

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
    pinned(withDeg, iterations) {
      val nodes = withDeg.select(col("src").as("id")).distinct()
      // node count COLLECTED once (one row, bounded — the L6 discipline)
      // instead of riding every round as a one-row broadcast: the old
      // crossJoin(broadcast(n)) re-ran the nodes-distinct + count
      // subtree in every round's severed job (guide §2.4 — an exchange
      // per round for a value that cannot change after the edge list is
      // pinned). Integer division of non-negative longs floors
      // identically in Scala and SQL `div`, so scores are bit-identical.
      val nNodes = math.max(1L, nodes.count())
      val teleportNum = Scale / 100 * (100 - damping) // e.g. 0.15 * Scale
      var scores = nodes
        .select(col("id"), lit(Scale / nNodes).as("score"))
        .transform(df => graft.Checkpoints.sever(df))
      for (_ <- 1 to iterations) {
        scores = withDeg
          .join(scores, withDeg("src") === scores("id"))
          .select(col("dst"),
            expr(s"(score * $damping div 100) div outdeg").as("contrib"))
          .groupBy("dst").agg(sum(col("contrib")).as("in_mass"))
          .select(col("dst").as("id"),
            (lit(teleportNum / nNodes) + col("in_mass")).as("score"))
          .transform(df => graft.Checkpoints.sever(df))
      }
      scores
    }
  }

  /** Personalized PageRank (the "random walk with restart" relevance
    * ranking): teleport mass returns ONLY to the `seeds` set, so scores
    * measure proximity TO THE SEEDS rather than global centrality — the
    * standard recommender/entity-expansion ranking ("nodes like these").
    * Same exact fixed-point discipline as [[pageRank]].
    *
    * Shape differences from the global variant, chosen for scale:
    *   - scores start ON THE SEEDS ONLY and spread outward — early
    *     rounds touch the seeds' neighborhoods, not the whole graph
    *     (the frontier property that makes PPR cheap on huge graphs);
    *   - the per-round teleport is applied via UNION ALL + one grouped
    *     sum (contrib rows ∪ seed-teleport rows) instead of an outer
    *     join — partial-aggregation-friendly, no join at all on the
    *     teleport path, and nodes with zero mass simply have no row.
    */
  def personalizedPageRank(edges: DataFrame, srcCol: String,
                           dstCol: String, seeds: DataFrame,
                           seedCol: String, iterations: Int = 3,
                           damping: Int = 85): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
    val withDeg = e.join(
        e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
    pinned(withDeg, iterations) {
      // seeds severed ONCE: the old lazy `teleport` re-ran the seed
      // derivation (gate-side, an aggregation over the edge lineage)
      // inside every round's union; the seed count is collected once
      // (one row, bounded) instead of riding each round as a one-row
      // broadcast — same flooring integer division, bit-identical.
      val s = graft.Checkpoints.sever(
        seeds.select(col(seedCol).as("id")).distinct())
      val nSeeds = math.max(1L, s.count())
      val teleportNum = Scale / 100 * (100 - damping)
      val teleport = s.select(col("id"),
        lit(teleportNum / nSeeds).as("score"))
      var scores = s.select(col("id"), lit(Scale / nSeeds).as("score"))
      for (_ <- 1 to iterations) {
        val contrib = withDeg
          .join(scores, withDeg("src") === scores("id"))
          .select(col("dst").as("id"),
            expr(s"(score * $damping div 100) div outdeg").as("score"))
        scores = contrib.unionByName(teleport)
          .groupBy("id").agg(sum(col("score")).as("score"))
          .transform(df => graft.Checkpoints.sever(df))
      }
      scores
    }
  }

  /** Exact triangle count via degree-ordered edge orientation.
    *
    * The naive count joins the undirected edge list with itself twice —
    * a node of degree d contributes d² wedge rows, so one celebrity node
    * blows the intermediate up quadratically. Orienting every edge from
    * its smaller endpoint to its larger endpoint under the TOTAL order
    * (degree, id) bounds every out-list by O(√m) (each triangle has
    * exactly one node whose two triangle edges both point away, so it is
    * counted exactly once), which is the classic O(m^1.5) bound — the
    * orientation changes the join sizes, never the count, so the DuckDB
    * oracle can use the naive a<b three-way join and still hash-match.
    *
    * Shape: two shuffles (degree groupBy + wedge self-join); the closing-
    * edge probe reuses the oriented list's partitioning.
    */
  def triangleCount(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val (_, oriented) = orientEdges(edges, srcCol, dstCol)
    closedTriangles(oriented).agg(count(lit(1)).as("n_triangles"))
  }

  /** Closed triangles (u, v1, v2) from a severed oriented edge list —
    * the wedge enumeration + closing join shared by [[triangleCount]],
    * [[clusteringCoefficient]] and [[triangleIncidence]].
    *
    * The closing join is BLOOM-PREFILTERED (guide §3.2): wedges
    * outnumber triangles by ~20× on the co-purchase gates (g17 at
    * sf0.1: 41M wedges → 1.9M triangles), and without the prefilter
    * every wedge row crosses the (v1,v2) exchange just to miss in the
    * join. One `bloom_build_long` pass over the (already severed)
    * oriented list yields a ~4 MiB filter that broadcasts via the d14
    * one-row crossJoin pattern; the probe drops definitely-non-closing
    * wedges INSIDE the wedge join's stage, before the exchange. Vertex
    * ids are < 2^31 (orientEdges' rank-packing guard), so the (v1,v2)
    * key packs into one BIGINT. False positives only add rows to the
    * exact closing join — never false negatives — so the triangle set
    * is unchanged. Sized ~16-32 bits/edge, capped at 2^27 bits (16 MiB
    * broadcast): past ~8M edges the filter saturates gracefully (more
    * false positives survive to the exact join, the result does not
    * change).
    */
  private def closedTriangles(oriented: DataFrame): DataFrame = {
    val w1 = oriented.select(col("u"), col("w").as("v1"), col("rw").as("r1"))
    val w2 = oriented.select(col("u"), col("w").as("v2"), col("rw").as("r2"))
    val nEdges = math.max(oriented.count(), 1L)
    val numBits = math.min(1L << 27,
      math.max(1L << 10, java.lang.Long.highestOneBit(nEdges) * 32L)).toInt
    val numHashes = 5
    val packed = (x: Column, y: Column) => x * 2147483648L + y
    // the filter is COLLECTED and embedded as one literal (Spark's own
    // runtime-filter shape) rather than attached via the d14 one-row
    // crossJoin: a joined-in binary column is COPIED into every output
    // UnsafeRow — 4 MiB × 41M wedges was measured catastrophically
    // slower — while a literal is one reference per task. The collect
    // is bounded by numBits/8 ≤ 16 MiB, never by data.
    val bfBytes = oriented.agg(graft.ops.Bloom.bloomBuildLong(
        packed(col("u"), col("w")), numBits, numHashes).as("__bf"))
      .head().getAs[Array[Byte]](0)
    val wedges = w1.join(w2, Seq("u")).filter(col("r1") < col("r2"))
      .filter(graft.ops.Bloom.mightContainLong(lit(bfBytes),
        packed(col("v1"), col("v2")), numHashes))
      .select(col("u"), col("v1"), col("v2"))
    wedges.join(oriented.select(col("u").as("v1"), col("w").as("v2")),
        Seq("v1", "v2"))
      .select(col("u"), col("v1"), col("v2"))
  }

  /** Degree-ordered orientation shared by [[triangleCount]],
    * [[clusteringCoefficient]] and [[triangleIncidence]]: dedup'd
    * undirected edges become the (degree, id)-oriented list. Returns
    * (per-node degree table, oriented edges (u, w, rw) with
    * rank(u) < rank(w)).
    *
    * BOTH the normalized edge set and the oriented list are severed
    * (materialized, lineage cut) before fan-out: every caller reads
    * `oriented` three times (the wedge self-join's two sides plus the
    * triangle-closing probe), and without the sever each read re-ran
    * the whole normalize → degree → two rank joins subtree — the r14
    * executed plan showed the orientation computed TWICE end-to-end
    * (once per wedge side, each with its own two degree aggregations),
    * ~6 redundant exchanges over the edge set per triangle query
    * (guide §2.4: remove shuffles outright; §5: reuse beats recompute
    * when the reused frame is this hot). Severing also gives AQE real
    * sizes for the downstream joins. `preNormalized = true` skips the
    * normalize-and-sever when the caller already passes a severed,
    * a<b-normalized, distinct edge set named (srcCol, dstCol) — kTruss
    * does, and re-severing a severed RDD would double-materialize.
    */
  private def orientEdges(edges: DataFrame, srcCol: String,
                          dstCol: String,
                          preNormalized: Boolean = false): (DataFrame, DataFrame) = {
    val und =
      if (preNormalized) edges
        .select(col(srcCol).as("a"), col(dstCol).as("b"))
      else graft.Checkpoints.sever(edges
        .select(least(col(srcCol), col(dstCol)).as("a"),
          greatest(col(srcCol), col(dstCol)).as("b"))
        .filter(col("a") =!= col("b")).distinct())
    val deg = und.select(col("a").as("v"))
      .union(und.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    // rank packs (degree, id) into one BIGINT so the orientation is a
    // total order without struct comparisons in the join keys. The packing
    // assumes 0 <= id < 2^31 (id in the low 31 bits; degree < |V| <= 2^31
    // then fits the high bits without overflow) — guarded per row below as
    // a codegen'd check, not an extra pass, because an out-of-range id
    // would silently bleed into the degree bits and corrupt the count.
    val inRange = (c: Column) => when(c >= 0L && c < 2147483648L, c)
      .otherwise(raise_error(lit(
        "orientEdges: vertex id out of [0, 2^31) — rank packing invalid")))
    val ranked = und
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
      .select(col("a"), col("b"),
        (col("da") * 2147483648L + inRange(col("a"))).as("ra"),
        (col("db") * 2147483648L + inRange(col("b"))).as("rb"))
    val oriented = graft.Checkpoints.sever(ranked.select(
      when(col("ra") < col("rb"), col("a")).otherwise(col("b")).as("u"),
      when(col("ra") < col("rb"), col("b")).otherwise(col("a")).as("w"),
      greatest(col("ra"), col("rb")).as("rw")))
    (deg, oriented)
  }

  /** Per-node LOCAL clustering coefficient (Watts & Strogatz 1998):
    * cc(v) = 2·T(v) / (d(v)·(d(v)−1)) — how close v's neighborhood is
    * to a clique; the standard community-structure / spam-farm signal a
    * link-graph curation pass scores (organic neighborhoods cluster,
    * generated link farms are stars or cliques at the extremes).
    *
    * Same oriented wedge enumeration as [[triangleCount]] — each closed
    * triangle is found exactly once, then credited to ALL THREE corners
    * via one explode (no per-corner re-join): the per-node tally costs
    * one extra hash aggregation over 3×|triangles| rows on top of the
    * count's two shuffles. Emitted exact: (n_tri, degree) plus basis
    * points `2·T·10⁴ div (d·(d−1))` — integer div, so the DuckDB replay
    * agrees bit-for-bit; degree-<2 nodes release 0 bp (no wedge exists).
    */
  def clusteringCoefficient(edges: DataFrame, srcCol: String,
                            dstCol: String): DataFrame = {
    val (deg, oriented) = orientEdges(edges, srcCol, dstCol)
    val tris = closedTriangles(oriented)
      .select(explode(array(col("u"), col("v1"), col("v2"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("n_tri"))
    deg.join(tris, Seq("v"), "left")
      .select(col("v"), col("d").as("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .withColumn("cc_bp", when(col("degree") >= 2,
        expr("2 * n_tri * 10000 div (degree * (degree - 1))"))
        .otherwise(lit(0L)))
  }

  /** Unweighted single-source shortest-path levels (BFS) to `maxDepth`.
    *
    * Per round ONE equi-join (previous round's frontier against the edge
    * list) + one min-aggregation; [[graft.Checkpoints.sever]] cuts the
    * iterative lineage exactly as [[pageRank]]. The frontier filter keeps each round
    * linear in newly reached nodes — already-settled nodes never re-expand,
    * so total work is O(m · 1) across all rounds, not O(m · depth).
    * Depths are BIGINT so the hash gate sees identical types in both
    * engines. Nodes unreached within `maxDepth` are absent from the result.
    */
  def bfsLevels(edges: DataFrame, srcCol: String, dstCol: String,
                source: Long, maxDepth: Int): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
    pinned(e, maxDepth) {
      var reached = e.sparkSession.range(1)
        .select(lit(source).as("id"), lit(0L).as("depth"))
        .transform(df => graft.Checkpoints.sever(df))
      for (k <- 1 to maxDepth) {
        val frontier = reached.filter(col("depth") === (k - 1))
        val next = frontier.join(e, frontier("id") === e("src"))
          .select(col("dst").as("id"), lit(k.toLong).as("depth"))
        reached = reached.union(next)
          .groupBy("id").agg(min(col("depth")).as("depth"))
          .transform(df => graft.Checkpoints.sever(df))
      }
      reached
    }
  }

  /** Bounded k-core peeling: `rounds` iterations of "drop every node
    * with degree < k" over a symmetric edge list — the degeneracy
    * decomposition's inner loop, run a fixed number of rounds so the
    * result is oracle-checkable (for rounds ≥ the peel depth it IS the
    * k-core). Per round: one degree aggregation + two semi joins
    * (surviving src, surviving dst) — all equality-keyed, lineage cut
    * per round as in [[pageRank]]. Returns surviving (id, degree).
    */
  def kCoreRounds(edges: DataFrame, srcCol: String, dstCol: String,
                  k: Int, rounds: Int): DataFrame = {
    var e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .transform(df => graft.Checkpoints.sever(df))
    for (_ <- 1 to rounds) {
      val keep = e.groupBy("src").agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select(col("src").as("v"))
      e = e.join(keep.select(col("v").as("src")), Seq("src"), "left_semi")
        .join(keep.select(col("v").as("dst")), Seq("dst"), "left_semi")
        .select("src", "dst")
        .transform(df => graft.Checkpoints.sever(df))
    }
    e.groupBy(col("src").as("id")).agg(count(lit(1)).as("degree"))
  }

  /** Weighted single-source shortest distances using at most `rounds`
    * edges (bounded Bellman–Ford) — the weighted counterpart of
    * [[bfsLevels]]. "Distance within k hops" is a well-defined quantity
    * in its own right, and for k >= graph diameter it IS the shortest
    * distance.
    *
    * Frontier discipline: only nodes whose tentative distance IMPROVED
    * in round k-1 re-expand in round k (the set-based form of the SPFA
    * queue), so a settled region never re-relaxes — per round one
    * frontier⋈edges equi-join, one min-agg, one improvement anti-check.
    * Weights stay BIGINT end to end: min-plus over integers is exact
    * under any partitioning and any merge order, which is what lets an
    * iterative algorithm sit under a hash-equality oracle. Parallel
    * duplicate edges are collapsed to their min weight up front (they
    * can never win a relaxation). At 1000-executor scale the same shape
    * holds — the classic refinement is delta-stepping, which only
    * changes WHICH frontier subset expands per round, not the join
    * shape; [[graft.Checkpoints.sever]] cuts per-round lineage as in
    * [[pageRank]].
    */
  def ssspRounds(edges: DataFrame, srcCol: String, dstCol: String,
                 wCol: String, source: Long, rounds: Int): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(wCol).cast("long").as("w"))
      .groupBy("src", "dst").agg(min(col("w")).as("w"))
    pinned(e, rounds) {
      var dist = e.sparkSession.range(1)
        .select(lit(source).as("id"), lit(0L).as("dist"))
        .transform(df => graft.Checkpoints.sever(df))
      var frontier = dist
      for (_ <- 1 to rounds) {
        val relaxed = frontier.join(e, frontier("id") === e("src"))
          .select(col("dst").as("id"), (col("dist") + col("w")).as("dist"))
        val next = dist.union(relaxed)
          .groupBy("id").agg(min(col("dist")).as("dist"))
          .transform(df => graft.Checkpoints.sever(df))
        frontier = next.join(
            dist.select(col("id"), col("dist").as("prev")), Seq("id"), "left")
          .filter(col("prev").isNull || col("dist") < col("prev"))
          .select("id", "dist")
          .transform(df => graft.Checkpoints.sever(df))
        dist = next
      }
      dist
    }
  }

  /** Common-neighbor link prediction (Liben-Nowell & Kleinberg 2003):
    * for every NON-adjacent pair sharing at least `minCommon` neighbors,
    * the common-neighbor count and Jaccard coefficient
    * |N(a)∩N(b)| / |N(a)∪N(b)| — the classic "you may also like" /
    * missing-edge scorer.
    *
    * Shape: candidate pairs come from a WEDGE self-join on the middle
    * node (two neighbors of the same vertex), exactly [[triangleCount]]'s
    * join — so candidate cost is Σ_v d(v)², concentrated on hubs. The
    * `maxMiddleDegree` cap excludes middles above the cap from PAIR
    * GENERATION (a node connected to everything certifies no similarity
    * — the same argument as MinHash's degenerate-bucket cap), bounding
    * the join at Σ min(d, cap)². Existing edges leave via one anti-join;
    * the Jaccard denominator is exact integer arithmetic
    * (d(a) + d(b) − common); the single double division at the end is
    * deterministic (one operation, no reassociation).
    */
  def linkPrediction(edges: DataFrame, srcCol: String, dstCol: String,
                     minCommon: Int = 2,
                     maxMiddleDegree: Int = 10000): DataFrame = {
    val und0 = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    // No persist here for the same reason as adamicAdar: the result is
    // lazy, so an in-builder unpersist fires before any action.
    val und = und0.union(und0.select(col("b").as("a"), col("a").as("b")))
    val deg = und.groupBy(col("a").as("v")).agg(count(lit(1)).as("d"))
    // wedge: (n1, n2) both neighbors of middle m, ordered to emit each
    // unordered candidate pair once
    val adj = und.join(deg.select(col("v").as("a"), col("d").as("dm")), "a")
      .filter(col("dm") <= maxMiddleDegree)
      .select(col("a").as("m"), col("b").as("n"))
    val cand = adj.select(col("m"), col("n").as("x"))
      .join(adj.select(col("m"), col("n").as("y")), Seq("m"))
      .filter(col("x") < col("y"))
      .groupBy(col("x"), col("y"))
      .agg(count(lit(1)).as("n_common"))
      .filter(col("n_common") >= minCommon)
    val nonEdges = cand.join(
      und0.select(col("a").as("x"), col("b").as("y")),
      Seq("x", "y"), "left_anti")
    val scored = nonEdges
      .join(deg.select(col("v").as("x"), col("d").as("dx")), "x")
      .join(deg.select(col("v").as("y"), col("d").as("dy")), "y")
      .select(col("x"), col("y"), col("n_common"),
        (col("dx") + col("dy") - col("n_common")).as("n_union"))
      .withColumn("jaccard",
        col("n_common").cast("double") / col("n_union"))
    scored
  }

  /** SYNCHRONOUS label propagation (Raghavan, Albert & Kumara 2007) —
    * community detection at graph scale: every node starts as its own
    * label; each round, every node adopts the most frequent label among
    * its neighbors, ties broken to the SMALLEST label (the asynchronous
    * original is visit-order-dependent; the synchronous fixed-round
    * form is deterministic, which is what makes it replayable and
    * hash-gateable). Per round: one equality join (edges ⋈ labels),
    * one (node, label) count aggregation, one per-node argmax via a
    * struct max — no windows, map-side combine on the count; lineage
    * severed per round like every iterative op here. At 100 TB this is
    * the same shape as one PageRank iteration: shuffle on node id.
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       rounds: Int = 3): DataFrame = {
    // severed BEFORE the union: the two union legs would otherwise
    // each re-run the caller-side lineage (for the gate, a lineitem
    // self-join) once when the persisted union first materializes
    val und0 = graft.Checkpoints.sever(edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct())
    // pinned like every sibling's reused edge list (pageRank's
    // withDeg, bfs/harmonic/hits' e): without it each round's join
    // recomputes the source-side distinct + union from scratch; severs
    // are eager, so the finally-release never forces a recompute
    val und = und0.union(und0.select(col("b").as("a"), col("a").as("b")))
    pinned(und, rounds) {
      var labels = und.select(col("a").as("v")).distinct()
        .withColumn("label", col("v"))
      (1 to rounds).foreach { _ =>
        val neigh = und
          .join(labels.select(col("v").as("b"), col("label")), "b")
          .select(col("a").as("v"), col("label"))
        // argmax by count, ties to the SMALLEST label, in one struct min:
        // negate the COUNT (always numeric) rather than the label, so the
        // tie-break works for any orderable label type — string node ids
        // fail analysis under the -label spelling
        val best = neigh.groupBy("v", "label")
          .agg(count(lit(1)).as("cnt"))
          .groupBy("v")
          .agg(min(struct((-col("cnt")).as("neg_cnt"), col("label"))).as("m"))
          .select(col("v"), col("m.label").as("label"))
        labels = graft.Checkpoints.sever(best)
      }
      labels
    }
  }

  /** Bounded k-TRUSS filtering (Cohen 2008) — the edge-level cohesion
    * sibling of g5's k-core: keep edges supported by ≥ k−2 triangles,
    * recompute support on the surviving edges, repeat for a FIXED
    * number of rounds (the bounded, replayable form — full truss
    * decomposition iterates to fixpoint; at 100 TB the fixed-round
    * prefix is the production cut, exactly the k-core gate's
    * discipline). The wedge join — the dominant cost — runs ONCE: the
    * triangle INCIDENCE list (triangle key × its three undirected
    * edges, enumerated at each triangle's degree-ordered apex exactly
    * as in [[triangleCount]]) is materialized up front and MAINTAINED
    * BY DELETION thereafter (r11-verdict item 2 — recomputing support
    * over the full surviving edge set re-ran the wedge join every
    * round, though only triangles touching a removed edge can change).
    * A triangle survives a peel iff none of its three edges was
    * removed, so each round after the first is: one map-side-combined
    * count over incidence rows (support), one anti-join (removed
    * edges), one semi-join (destroyed triangle keys), one anti-join
    * (drop their incidence rows) — no wedge join. The maintained
    * support equals a from-scratch recompute exactly (surviving
    * triangles ARE the original triangles with all three edges alive),
    * so the naive-replay oracle still hash-matches; lineage is severed
    * per round.
    */
  def kTruss(edges: DataFrame, srcCol: String, dstCol: String,
             k: Int, rounds: Int = 2): DataFrame = {
    // materialize the normalized edge set up front: round 1 otherwise
    // recomputes the SOURCE-side lineage (for the gate, a lineitem
    // self-join) for each of its reads — degree count, two rank joins,
    // the anti-join probe; measured at sf0.1 and the 10x clone corpus
    // this is ~1.9x end-to-end. The oriented list is now severed INSIDE
    // orientEdges (r14): the r14 executed plan showed the whole
    // orientation subtree computed once per wedge side — the hoped-for
    // exchange reuse never fired across the differing w1/w2
    // projections — so the three reads each pay one RDD scan instead.
    var und = graft.Checkpoints.sever(edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct())
    if (rounds >= 1) {
      // The severed round state is the TRIANGLE set (one row per
      // triangle, 3 cols), not the exploded (triangle, edge) incidence
      // (3x the rows, 5 cols): the explode is pure map-side fan-out, so
      // recomputing it from the severed triangles per round is a
      // scan, while materializing it tripled every sever and dragged
      // 5-col rows through the maintenance joins (guide §2.2: shuffle
      // fewer bytes). r14 isolated A/B: g17 12.1 -> 9.0 s.
      val (_, oriented) = orientEdges(und, "a", "b", preNormalized = true)
      var tri = graft.Checkpoints.sever(closedTriangles(oriented))
      val e = (x: Column, y: Column) =>
        struct(least(x, y).as("a"), greatest(x, y).as("b"))
      for (r <- 1 to rounds) {
        // keep = edges whose surviving-triangle count clears k-2; an
        // edge with NO surviving triangle has no incidence row and
        // drops out — the same inner-join semantics as the oracle's
        // per-round support CTE (and as the old semi-join form)
        val keep = graft.Checkpoints.sever(
          tri.select(explode(array(
              e(col("u"), col("v1")),
              e(col("u"), col("v2")),
              e(col("v1"), col("v2")))).as("edge"))
            .groupBy(col("edge.a").as("a"), col("edge.b").as("b"))
            .agg(count(lit(1)).as("support"))
            .filter(col("support") >= k - 2).select("a", "b"))
        if (r < rounds) {
          // a triangle survives iff ALL THREE edges survive — three
          // semi joins against `keep` (triangle edges are always in
          // `und`, so edge-in-keep == edge-not-removed; identical to
          // the old removed/destroyed anti-join form). AQE broadcasts
          // `keep` once it shrinks; the old form shuffled the exploded
          // incidence twice more per round (semi + distinct + anti).
          def alive(df: DataFrame, x: String, y: String): DataFrame = {
            val kk = keep.select(col("a").as("__ka"), col("b").as("__kb"))
            df.join(kk,
              least(col(x), col(y)) === col("__ka") &&
                greatest(col(x), col(y)) === col("__kb"), "left_semi")
          }
          tri = graft.Checkpoints.sever(
            alive(alive(alive(tri, "u", "v1"), "u", "v2"), "v1", "v2"))
        }
        und = keep
      }
    }
    und
  }

  /** Triangle incidence over a normalized (a<b, distinct) edge set:
    * one row per (triangle, edge) pair — the triangle keyed by its
    * apex enumeration (tu, tv1, tv2), the edge normalized to a<b. The
    * degree-ordered orientation of [[triangleCount]] enumerates each
    * triangle exactly once at its apex (the node whose two triangle
    * edges both point away); the triangle is then exploded to its
    * three undirected edges, so `groupBy(a, b).count` over the result
    * is exactly the per-edge triangle support. Degrees order only the
    * ENUMERATION; which snapshot computes them cannot change the set
    * of triangles.
    */
  private[graft] def triangleIncidence(und: DataFrame): DataFrame = {
    // callers pass a severed, normalized (a<b, distinct) edge set —
    // skip the re-normalize (it cost a distinct exchange per read of
    // the orientation subtree before orientEdges severed `oriented`)
    val (_, oriented) = orientEdges(und, "a", "b", preNormalized = true)
    val tri = closedTriangles(oriented)
    // One explode, not three tri projections: a union of three would
    // re-run the wedge join three times.
    val edge = (x: Column, y: Column) =>
      struct(least(x, y).as("a"), greatest(x, y).as("b"))
    tri.select(col("u").as("tu"), col("v1").as("tv1"),
        col("v2").as("tv2"),
        explode(array(
          edge(col("u"), col("v1")),
          edge(col("u"), col("v2")),
          edge(col("v1"), col("v2")))).as("e"))
      .select(col("tu"), col("tv1"), col("tv2"),
        col("e.a").as("a"), col("e.b").as("b"))
  }

  /** Bounded multi-source STRESS centrality (Shimbel 1953; the
    * integer-valued sibling of betweenness): stress(v) = number of
    * shortest source→target paths passing THROUGH v as an interior
    * node, summed over a seed set and over all targets within
    * `maxDepth` hops — the production-bounded form, exactly the
    * harmonic-centrality gate's truncation discipline.
    *
    * Why stress and not betweenness: Brandes' betweenness dependency
    * δ(v) = Σ (σ_v/σ_w)(1+δ_w) accumulates RATIONALS whose
    * floating-point sum is addition-order-dependent — ungateable under
    * a cross-engine hash. Stress has an all-integer two-pass form:
    *
    *  - forward (per seed, level-synchronous): σ_s(v) = number of
    *    shortest s→v paths — frontier⋈edges, anti-join the visited
    *    set, SUM-combine σ (bfsLevels with sum instead of min);
    *  - backward (levels maxDepth−1 … 1): h_s(v) = Σ_{w ∈ succ(v)}
    *    (1 + h_s(w)) over DAG successors (neighbors one level deeper
    *    in the SAME seed's BFS) = number of shortest-path
    *    continuations leaving v; then δ_s(v) = σ_s(v)·h_s(v), since
    *    every shortest s→t path through v is a (shortest s→v prefix,
    *    DAG continuation) pair.
    *
    * Scale shape: one frontier⋈edges join + one hash agg per level in
    * each direction — 2·maxDepth joins total, lineage severed per
    * level; seeds ride the same keyed shuffles (no per-seed jobs).
    * Magnitudes: σ ≤ Δ^depth and h ≤ Σ_{k≤depth} Δ^k for max degree Δ
    * — at depth 3 and Δ ~ 10³ the product σ·h stays ≤ ~10¹³, inside
    * BIGINT; deeper bounds or denser graphs should re-derive the bound
    * before trusting the long arithmetic.
    */
  def stressCentrality(edges: DataFrame, srcCol: String, dstCol: String,
                       seeds: DataFrame, maxDepth: Int = 3): DataFrame = {
    require(maxDepth >= 2,
      s"interior nodes need maxDepth >= 2, got $maxDepth")
    // severed before the symmetrizing union (labelPropagation's
    // lesson): the persisted union's two legs each re-run the
    // caller-side edge lineage once at first materialization
    val und0 = graft.Checkpoints.sever(edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct())
    val und = und0.union(und0.select(col("b").as("a"), col("a").as("b")))
      .select(col("a").as("x"), col("b").as("n"))
    pinned(und) {
      val l0 = seeds.select(col("s"), col("s").as("v"), lit(1L).as("sigma"))
      // forward: per-level σ tables, plus the visited set for the anti-join
      val levels = Array.fill[DataFrame](maxDepth + 1)(null)
      levels(0) = l0
      var visited = l0.select("s", "v")
      var cur = l0
      for (d <- 1 to maxDepth) {
        val cand = cur.join(und, cur("v") === und("x"))
          .select(col("s"), col("n").as("v"), col("sigma"))
        val nxt = graft.Checkpoints.sever(
          cand.join(visited, Seq("s", "v"), "left_anti")
            .groupBy("s", "v").agg(sum(col("sigma")).as("sigma")))
        levels(d) = nxt
        visited = graft.Checkpoints.sever(
          visited.union(nxt.select("s", "v")))
        cur = nxt
      }
      // backward: h at the depth bound is 0 (no in-bound successors)
      var h = levels(maxDepth).select(col("s"), col("v"), lit(0L).as("h"))
      val deltas = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
      for (d <- (maxDepth - 1) to 1 by -1) {
        val hNext = h.select(col("s"), col("v").as("w"), col("h").as("hw"))
        val succSum = levels(d)
          .join(und, levels(d)("v") === und("x"))
          .select(col("s"), col("v"), col("n").as("w"))
          .join(hNext, Seq("s", "w"))
          .groupBy("s", "v")
          .agg((count(lit(1)) + sum(col("hw"))).as("hsum"))
        val hD = graft.Checkpoints.sever(
          levels(d).join(succSum, Seq("s", "v"), "left")
            .select(col("s"), col("v"), col("sigma"),
              coalesce(col("hsum"), lit(0L)).as("h")))
        deltas += hD.select(col("v"), (col("sigma") * col("h")).as("delta"))
        h = hD.select("s", "v", "h")
      }
      val out = deltas.reduce(_ unionByName _)
        .groupBy("v").agg(sum(col("delta")).as("stress"))
        .filter(col("stress") > 0)
      out
    }
  }

  /** Adamic-Adar link prediction (Adamic & Adar 2003) — the
    * degree-discounted sibling of [[linkPrediction]]'s Jaccard:
    * AA(x,y) = Σ_{z ∈ Γ(x)∩Γ(y)} 1/ln d(z), so a common neighbor that
    * is a promiscuous hub contributes almost nothing while a rare
    * shared contact dominates — empirically the strongest of the
    * classic local similarity scores. Same wedge shape as Jaccard (the
    * middle-degree cap bounds wedge fan-out); the per-neighbor term is
    * fixed-pointed (`round(1e9/ln d(z))`) BEFORE the (x,y) sum so the
    * aggregation is an order-independent integer reduce. A common
    * neighbor has d(z) ≥ 2, so ln d(z) ≥ ln 2 and the term is finite
    * by construction.
    */
  def adamicAdar(edges: DataFrame, srcCol: String, dstCol: String,
                 minCommon: Int = 2,
                 maxMiddleDegree: Int = 10000): DataFrame = {
    val und0 = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    // No persist: the returned plan is lazy, so a persist/unpersist
    // pair inside this builder would be released before any action ran
    // (r7-advice finding) — callers who reuse the result cache THAT.
    val und = und0.union(und0.select(col("b").as("a"), col("a").as("b")))
    val deg = und.groupBy(col("a").as("v")).agg(count(lit(1)).as("d"))
    val adj = und.join(deg.select(col("v").as("a"), col("d").as("dm")), "a")
      .filter(col("dm") <= maxMiddleDegree)
      .select(col("a").as("m"), col("b").as("n"), col("dm"))
    val cand = adj.select(col("m"), col("dm"), col("n").as("x"))
      .join(adj.select(col("m"), col("n").as("y")), Seq("m"))
      .filter(col("x") < col("y"))
      .withColumn("term_fp",
        expr("CAST(round(1e9 / ln(CAST(dm AS DOUBLE))) AS BIGINT)"))
      .groupBy(col("x"), col("y"))
      .agg(count(lit(1)).as("n_common"), sum(col("term_fp")).as("aa_fp"))
      .filter(col("n_common") >= minCommon)
    cand.join(
      und0.select(col("a").as("x"), col("b").as("y")),
      Seq("x", "y"), "left_anti")
  }

  /** Bounded multi-source HARMONIC centrality (Marchiori & Latora 2000;
    * Boldi & Vigna's preferred closeness variant): for a seed set S,
    * H(v) = Σ_{s∈S, d(s,v)>0} 1/d(s,v) — nodes near many seeds score
    * high, unreachable pairs contribute 0 (the property that makes
    * harmonic, unlike classic closeness, well-defined on disconnected
    * graphs). Bounded to `maxDepth` hops: beyond a few hops 1/d terms
    * are both tiny and (at 100 TB) cost a full extra frontier expansion
    * each — the standard production cut (HyperBall runs the same
    * truncation with sketches).
    *
    * Exact under the hash gate: 1/d enters as the integer `1e6 div d`.
    * Shape per round: ONE frontier⋈edges equi-join + min-aggregation on
    * (source, node) — [[bfsLevels]] with the source id carried; the
    * final readout is one node-keyed aggregation. Frontier rows bound
    * work by newly-reached (source, node) pairs, ≤ |S|·|V| total.
    */
  def harmonicCentrality(edges: DataFrame, srcCol: String, dstCol: String,
                         sources: Seq[Long], maxDepth: Int): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
    pinned(e, maxDepth) {
      val sp = e.sparkSession
      import sp.implicits._
      var reached = sources.map(s => (s, s, 0L))
        .toDF("src_id", "id", "depth")
        .transform(df => graft.Checkpoints.sever(df))
      for (k <- 1 to maxDepth) {
        val frontier = reached.filter(col("depth") === (k - 1))
        val next = frontier.join(e, frontier("id") === e("src"))
          .select(col("src_id"), col("dst").as("id"),
            lit(k.toLong).as("depth"))
        reached = reached.union(next)
          .groupBy("src_id", "id").agg(min(col("depth")).as("depth"))
          .transform(df => graft.Checkpoints.sever(df))
      }
      reached.filter(col("depth") > 0)
        .groupBy("id")
        .agg(sum(expr("1000000L div depth")).as("harmonic_fp"),
          count(lit(1)).as("n_reached"))
    }
  }

  /** Degree assortativity (Newman 2002) — the Pearson correlation of
    * endpoint degrees across edges: do hubs link to hubs (r > 0, social
    * graphs) or to leaves (r < 0, the web, biological and — typically —
    * purchase graphs)? The single number that distinguishes those regimes
    * decides which skew strategy a join over the edge list needs.
    *
    * Exact integers via the a14 cross-multiplication: with M = 2·|edges|
    * endpoint pairs (each undirected edge counted in both orientations,
    * the standard symmetrization), r = num/den where
    * `num = M·Σjk − (Σj)²` and `den = M·Σj² − (Σj)²` over the oriented
    * pair list (j = source degree, k = target degree; symmetry makes
    * Σj = Σk and Σj² = Σk²). Magnitude bound M·Σjk ≤ 2m·(2m·d_max²):
    * BIGINT-safe to ~10⁸ edges at d_max 10³; past that emit the moment
    * columns and divide in the reader.
    *
    * Shape: one degree aggregation, two joins to ride degrees onto the
    * edge list, ONE global moment reduce (single row out) — no
    * self-joins, no windows.
    */
  def assortativity(edges: DataFrame, srcCol: String,
                    dstCol: String): DataFrame = {
    val und0 = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val und = und0.union(und0.select(col("b").as("a"), col("a").as("b")))
    val deg = und.groupBy(col("a").as("v")).agg(count(lit(1)).as("d"))
    und
      .join(deg.select(col("v").as("a"), col("d").as("j")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("k")), "b")
      .agg(count(lit(1)).as("m2"),
        sum(col("j")).as("sum_j"),
        sum(col("j") * col("k")).as("sum_jk"),
        sum(col("j") * col("j")).as("sum_j2"))
      .select(col("m2"), col("sum_j"), col("sum_jk"), col("sum_j2"),
        (col("m2") * col("sum_jk") - col("sum_j") * col("sum_j"))
          .as("r_num"),
        (col("m2") * col("sum_j2") - col("sum_j") * col("sum_j"))
          .as("r_den"))
  }

  /** Newman modularity of a node partition (Newman & Girvan 2004) — the
    * standard "is this community structure real?" score: for partition c,
    * Q = Σ_c [ m_c/m − (d_c/2m)² ] where m = |edges|, m_c = intra-
    * community edges, d_c = total degree of community c. Q ≈ 0 means the
    * partition explains nothing beyond random chance at the same degree
    * sequence; Q > 0.3 is conventionally "strong structure". Takes the
    * partition as DATA (a node→community labeling — nation, component
    * label from [[ConnectedComponents]], cluster id), so it composes
    * with any upstream grouping.
    *
    * Exact integer rational under the hash gate: per-community
    * contribution `q_num = 4·m·m_c − d_c²` over the shared `q_den = 4m²`
    * (Σ q_num / q_den = Q). Magnitudes ≤ 4m² — BIGINT-safe to ~10⁹
    * edges; past that, emit (m_c, d_c, m) and let the reader divide.
    *
    * Scale shape: label attachment is two equi-joins against the node→
    * community map (hash-partitioned on node id — broadcast when the
    * map is a dimension), then ONE community-keyed aggregation; `m`
    * enters as a one-row broadcast. No self-joins, no windows.
    */
  def modularity(edges: DataFrame, srcCol: String, dstCol: String,
                 labels: DataFrame, nodeCol: String,
                 communityCol: String): DataFrame = {
    val e = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val lab = labels.select(col(nodeCol).as("node"),
      col(communityCol).as("community"))
    val labeled = e
      .join(lab.select(col("node").as("a"), col("community").as("ca")), "a")
      .join(lab.select(col("node").as("b"), col("community").as("cb")), "b")
      .persist()
    val m = labeled.agg(count(lit(1)).as("m"))
    // degree mass: each edge endpoint contributes 1 to its community;
    // intra edges contribute 1 to m_c — one union + one aggregation
    val sides = labeled.select(col("ca").as("community"),
        when(col("ca") === col("cb"), 1L).otherwise(0L).as("intra"))
      .unionAll(labeled.select(col("cb").as("community"), lit(0L).as("intra")))
    sides.groupBy("community")
      .agg(count(lit(1)).as("d_c"), sum(col("intra")).as("m_c"))
      .crossJoin(broadcast(m))
      .select(col("community"), col("m_c"), col("d_c"), col("m"),
        (lit(4L) * col("m") * col("m_c") - col("d_c") * col("d_c"))
          .as("q_num"),
        (lit(4L) * col("m") * col("m")).as("q_den"))
  }

  /** HITS hub/authority scores (Kleinberg 1999) over a DIRECTED edge
    * list — the second classic link-analysis ranking next to
    * [[pageRank]]: a good HUB points at many good authorities, a good
    * AUTHORITY is pointed at by many good hubs. On a bipartite
    * interaction graph (customers → suppliers, queries → documents)
    * the two sides get separately meaningful scores, which PageRank's
    * single stationary distribution cannot give.
    *
    * Exact fixed-point discipline as [[pageRank]]: scores are 1e12-scaled
    * BIGINTs, and the per-round L1 normalization (the convergence step of
    * the power iteration) is integer division by `max(1, total div Scale)`
    * where `total` enters as a ONE-ROW broadcast aggregate — every value
    * is positive, so Spark's truncating `div` and DuckDB's flooring `//`
    * agree and the result is bit-identical under any partitioning. The
    * flooring divisor renormalizes only to within a factor of 2 (totals
    * land in [Scale/2, 2·Scale]) — but the scaling is UNIFORM per pass,
    * so rankings are exact and magnitudes bounded: a round's raw re-sum
    * is ≤ 2·d_max·Scale ≈ 2e16 at d_max = 10⁴ — far from BIGINT
    * overflow even at 100 TB edge counts.
    *
    * Shape per round: TWO shuffles (auth pass: edges ⋈ hubs on src +
    * groupBy dst; hub pass: edges ⋈ auths on dst + groupBy src), each
    * partial-aggregated map-side; the edge list is persisted once;
    * lineage severed per round via [[graft.Checkpoints.sever]].
    *
    * @return (id, auth, hub) — nodes missing from a side carry 0.
    */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           iterations: Int = 2): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
    pinned(e, iterations) {
      val nodes = e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id"))).distinct()
      // The round's join+aggregate is severed BEFORE normalization:
      // the old form aggregated `total` over the UNSEVERED round
      // output, so every round's edges⋈scores + groupBy ran TWICE
      // (once under the total aggregate, once under the normalized
      // output — the r14 profile's first finding on g9). The total is
      // then collected (one row, bounded) and the division becomes a
      // literal — a lazy projection over the severed RDD, which the
      // next round and the final join re-read for free. Same flooring
      // `div` on non-negative values: bit-identical scores.
      def normalize(raw: DataFrame, vCol: String): DataFrame = {
        val t = raw.agg(sum(col(vCol))).head()
        val total = if (t.isNullAt(0)) 0L else t.getLong(0)
        val divisor = math.max(1L, total / Scale)
        raw.select(col("id"),
          expr(s"$vCol div ${divisor}L").as(vCol))
      }
      var hubs = nodes.select(col("id"), lit(Scale).as("hub"))
        .transform(df => graft.Checkpoints.sever(df))
      var auths = nodes.select(col("id"), lit(0L).as("auth"))
      for (_ <- 1 to iterations) {
        auths = normalize(graft.Checkpoints.sever(
          e.join(hubs, e("src") === hubs("id"))
            .groupBy(e("dst").as("id")).agg(sum(col("hub")).as("auth"))),
          "auth")
        hubs = normalize(graft.Checkpoints.sever(
          e.join(auths, e("dst") === auths("id"))
            .groupBy(e("src").as("id")).agg(sum(col("auth")).as("hub"))),
          "hub")
      }
      // the final readout joins two SEVERED frames, so releasing the
      // edge-list pin before the caller's action never recomputes e —
      // except in the degenerate iterations<1 call, where `pinned`
      // skipped the pin and auths reads e lazily (correct, uncached)
      auths.join(hubs, Seq("id"), "full_outer")
        .select(col("id"), coalesce(col("auth"), lit(0L)).as("auth"),
          coalesce(col("hub"), lit(0L)).as("hub"))
    }
  }
}
