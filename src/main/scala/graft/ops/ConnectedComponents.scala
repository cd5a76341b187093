package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list —
  * the missing piece between near-duplicate PAIRS (MinHash/SimHash/LSH
  * output) and duplicate CLUSTERS: every doc in a transitive chain
  * a~b~c belongs to one cluster whose id is the minimum doc id, so a
  * corpus dedup can keep exactly one representative per cluster (the
  * policy `c2` approximates with a single anti-join; this is the exact
  * version).
  *
  * Algorithm: iterative min-label propagation. Each node starts with
  * label = its own id; each round every node takes the min of its own
  * label and its neighbors' labels; a fixpoint is reached after at most
  * `diameter(component)` rounds. Near-duplicate graphs are
  * overwhelmingly tiny star/chain components (duplicates of one
  * original), so the round count is small and each round is ONE shuffle
  * (the `groupBy(id).min`) plus the edge join — both partitioned on the
  * node id, so AQE coalesces them into the same exchange layout.
  *
  * Scale notes for the 100 TB case:
  *   - The edge list is persisted once and reused every round; labels
  *     are checkpointed every round — iterative lineage otherwise grows
  *     a plan per round and planning cost explodes (the classic
  *     iterative-Spark trap). Checkpoints go through
  *     [[graft.Checkpoints.sever]]: executor-local by default, reliable
  *     (HDFS/object store) when `spark.graft.checkpointDir` is set, so
  *     on a cluster lost executors re-read instead of failing the round.
  *   - For adversarial graphs with large diameter (long chains),
  *     [[run]] automatically hands over to [[alternatingStar]] — the
  *     large-star/small-star alternation of Kiveris et al., "Connected
  *     Components in MapReduce and Beyond" (SoCC '14), which converges
  *     in O(log n) rounds with the same per-round shuffle shape. Dedup
  *     graphs rarely need it: a chain of near-duplicates longer than a
  *     few hops usually means the threshold is set too low.
  *   - Convergence is detected from the TOTAL of all labels, observed
  *     via a `CollectMetrics` node inside the same job that materializes
  *     the round's checkpoint: labels only ever decrease, so the sum
  *     strictly decreases exactly while some label changed, and a round
  *     whose sum equals the previous round's is the fixpoint. One job
  *     per round — no second compare-to-previous join/count pass. The
  *     sum is accumulated as DECIMAL(38,0): exact, and immune to int64
  *     overflow at any corpus size.
  */
object ConnectedComponents {

  /** Cluster assignment for every node of the pair graph.
    *
    * @param pairs edge list; `aCol`/`bCol` name the two endpoint columns
    * @return (id, cluster_id) — cluster_id = min node id in the component
    */
  def labelPropagation(pairs: DataFrame, aCol: String, bCol: String,
                       maxRounds: Int = 50): DataFrame = {
    val (labels, converged) = propagate(pairs, aCol, bCol, maxRounds)
    // Fail FAST on an unconverged run: a partial labeling silently keeps
    // extra "representatives" downstream (c4 would under-dedup), which is
    // worse than an exception telling the caller to raise maxRounds or
    // switch to [[alternatingStar]] (or [[run]], which switches itself).
    if (!converged) throw new IllegalStateException(
      s"connected components did not converge in $maxRounds rounds " +
        "(the label total was still decreasing) — component diameter " +
        "exceeds the round budget; raise maxRounds or use alternatingStar")
    labels
  }

  /** Propagation core shared by [[labelPropagation]] (throws when the
    * budget runs out) and [[run]] (falls back to the star algorithm).
    * Returns the labeling plus whether it reached the fixpoint.
    */
  private def propagate(pairs: DataFrame, aCol: String, bCol: String,
                        maxRounds: Int): (DataFrame, Boolean) = {
    // Sever the pair list BEFORE the symmetrizing union (the
    // stressCentrality lesson): the persisted union's two legs each
    // re-ran the caller's pair lineage once at first materialization —
    // for the dedup gates that lineage is the whole LSH band join +
    // Jaccard verify, the most expensive subtree of the query
    // (guide §2.4). One sever makes it one computation.
    val p0 = graft.Checkpoints.sever(
      pairs.select(col(aCol).as("src"), col(bCol).as("dst")))
    val edges = p0
      .union(p0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist()
    // Seed: every endpoint labels itself. The checkpoint also severs the
    // lineage back to `edges`, so the per-round join below is not a
    // same-lineage self-join (the trap GraftChecks rejects).
    // Each round's label sum is observed DURING the checkpoint
    // materialization (one job per round): labels are monotone
    // non-increasing, so sum(next) == sum(prev) IS the fixpoint test.
    def checkpointWithSum(df: DataFrame): (DataFrame, java.math.BigDecimal) = {
      val obs = org.apache.spark.sql.Observation()
      val ckpt = graft.Checkpoints.sever(df
        .observe(obs, sum(col("lbl").cast("decimal(38,0)")).as("lbl_sum")))
      (ckpt, obs.get("lbl_sum").asInstanceOf[java.math.BigDecimal])
    }
    var (labels, prevSum) = checkpointWithSum(
      edges.select(col("src").as("id")).distinct()
        .withColumn("lbl", col("id")))
    var round = 0
    var changed = true
    while (changed && round < maxRounds) {
      val viaNeighbor = edges.join(labels, edges("dst") === labels("id"))
        .select(edges("src").as("id"), col("lbl"))
      val (next, nextSum) = checkpointWithSum(
        labels.union(viaNeighbor)
          .groupBy("id").agg(min("lbl").as("lbl")))
      changed = nextSum.compareTo(prevSum) != 0
      labels = next
      prevSum = nextSum
      round += 1
    }
    edges.unpersist()
    (labels.select(col("id"), col("lbl").as("cluster_id")), !changed)
  }

  /** Automatic algorithm selection: min-label propagation for up to
    * `propagationRounds` rounds — optimal for the tiny star/chain
    * components of a dedup graph, where one round per diameter hop
    * means 2-4 rounds total — then, if the label total is still
    * decreasing (some component's diameter exceeds the budget), restart
    * with [[alternatingStar]], whose round count is O(log n) regardless
    * of diameter. The propagation rounds already paid are wasted but
    * bounded: `propagationRounds` × one shuffle, a constant prefix of
    * the O(log n) star run it hands over to. This is the production
    * entry point — callers need not know the diameter in advance.
    */
  def run(pairs: DataFrame, aCol: String, bCol: String,
          propagationRounds: Int = 12, starRounds: Int = 30): DataFrame = {
    val (labels, converged) = propagate(pairs, aCol, bCol, propagationRounds)
    if (converged) labels
    else {
      // The star form works on the canonical self-loop-free edge set, so
      // a node appearing only in self-pairs vanishes there; restore every
      // endpoint as its own singleton to match propagation's output.
      val nodes = pairs.select(col(aCol).as("id"))
        .union(pairs.select(col(bCol).as("id"))).distinct()
      val star = alternatingStar(pairs, aCol, bCol, starRounds)
      nodes.join(star, Seq("id"), "left")
        .select(col("id"),
          coalesce(col("cluster_id"), col("id")).as("cluster_id"))
    }
  }

  /** Cluster assignment via alternating large-star/small-star (Kiveris
    * et al., "Connected Components in MapReduce and Beyond", SoCC '14) —
    * the O(log n)-ROUNDS algorithm, for graphs whose diameter is not
    * bounded (label propagation needs one round per hop of diameter; a
    * path of 10^6 nodes needs 10^6 rounds there and ~20 here).
    *
    * Each round is two star operations over the symmetric edge list:
    *   - large-star(u): every neighbor v > u re-attaches to
    *     m = min(Γ(u) ∪ u)
    *   - small-star(u): every neighbor v ≤ u (and u itself) attaches to m
    * Both are one `groupBy(center).min` + one join — the same per-round
    * shuffle shape as a propagation round. At a fixpoint every component
    * is a star centered on its minimum, read off directly.
    *
    * Convergence here is detected by edge-set equality (two anti-joins);
    * a production run tracks a changed-edge accumulator instead. Same
    * checkpoint discipline as [[labelPropagation]].
    */
  def alternatingStar(pairs: DataFrame, aCol: String, bCol: String,
                      maxRounds: Int = 30): DataFrame = {
    // Canonical undirected edge set: (lo, hi), no self-loops.
    def canon(df: DataFrame): DataFrame =
      df.select(least(col("src"), col("dst")).as("lo"),
          greatest(col("src"), col("dst")).as("hi"))
        .filter(col("lo") =!= col("hi"))
        .distinct()
    // One star step: for each center u over the SYMMETRIC neighborhood,
    // m = min(Γ(u) ∪ u); re-attach the selected neighbors to m.
    def star(edges: DataFrame, large: Boolean): DataFrame = {
      val sym = edges.select(col("lo").as("src"), col("hi").as("dst"))
        .union(edges.select(col("hi").as("src"), col("lo").as("dst")))
      val m = sym.groupBy("src").agg(min(col("dst")).as("mn"))
        .select(col("src"), least(col("mn"), col("src")).as("m"))
      val withM = sym.join(m, "src")
      val attached =
        if (large) withM.filter(col("dst") > col("src"))
          .select(col("dst").as("src"), col("m").as("dst"))
        else withM.filter(col("dst") <= col("src"))
          .select(col("dst").as("src"), col("m").as("dst"))
          .union(m.select(col("src"), col("m").as("dst")))
      canon(attached)
    }
    var edges = graft.Checkpoints.sever(
      canon(pairs.select(col(aCol).as("src"), col(bCol).as("dst"))))
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val next = graft.Checkpoints.sever(
        star(star(edges, large = true), large = false))
      converged = next.exceptAll(edges).isEmpty &&
        edges.exceptAll(next).isEmpty
      edges = next
      round += 1
    }
    if (!converged) throw new IllegalStateException(
      s"alternating star did not converge in $maxRounds rounds — " +
        "O(log n) bound implies a pathological input; inspect the edge list")
    // Fixpoint: stars centered on component minima — every non-root's
    // single neighbor is its root; the root's min neighbor is larger, so
    // take min(neighbor, self).
    val sym = edges.select(col("lo").as("src"), col("hi").as("dst"))
      .union(edges.select(col("hi").as("src"), col("lo").as("dst")))
    sym.groupBy("src").agg(min(col("dst")).as("mn"))
      .select(col("src").as("id"),
        least(col("mn"), col("src")).as("cluster_id"))
  }

  /** One representative per duplicate cluster: the minimum doc id.
    * Composition `docs -> pairs -> components -> keepers` is the exact
    * corpus-dedup policy (vs `c2`'s one-pass approximation, which can
    * drop BOTH endpoints of a pair whose ids chain transitively).
    */
  def keepers(pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    run(pairs, aCol, bCol)
      .filter(col("id") === col("cluster_id"))
      .select(col("id"))
}
