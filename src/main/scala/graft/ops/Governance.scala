package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-governance audits for training corpora — the re-identification
  * checks a corpus release runs before shipping (Sweeney 2002 k-anonymity;
  * Machanavajjhala et al. 2007 l-diversity).
  *
  * A quasi-identifier (QID) is a column combination that could single a
  * record out when joined against outside data. The audit answers, per
  * distinct QID combination:
  *
  *  - k-anonymity: how many records share this combination (`k_of_group`)
  *    — a group smaller than k is re-identifiable;
  *  - l-diversity: how many distinct SENSITIVE values the group carries —
  *    a group where everyone shares one sensitive value leaks it even
  *    when k is satisfied (the homogeneity attack).
  *
  * Scale shape: ONE hash aggregation keyed on the QID tuple (distinct
  * sensitive count rides the same exchange via count(distinct) partial
  * aggregation — Spark plans it as a two-phase expand+agg, still a single
  * shuffle of QID-keyed rows); output is |distinct QID| rows, orders of
  * magnitude smaller than the corpus. No joins, no windows — the audit of
  * a 100 TB table costs one pass.
  */
object Governance {

  /** Per-QID-group audit row: every QID column, `k_of_group`,
    * `n_sensitive`, and the two verdicts against the supplied thresholds.
    */
  /** δ-presence audit (Nergiz, Atzori & Clifton 2007, "Hiding the
    * presence of individuals from shared databases"): k-anonymity
    * protects against record RE-IDENTIFICATION inside a release, but an
    * attacker who knows someone's quasi-identifiers and has the
    * POPULATION table learns membership itself from the ratio
    * δ(group) = |released ∩ group| / |population group| — δ near 1
    * confirms presence, δ near 0 confirms absence. The audit reports,
    * per QID group, the released share in basis points and whether it
    * stays inside [deltaMinBp, deltaMaxBp].
    *
    * One grouped aggregation over the POPULATION with a conditional sum
    * for the released side (the release must be a subset predicate, not
    * a separate table — which is exactly how corpus filtering works);
    * output is group-count rows. Integer `div` on counts — engine-exact.
    */
  def deltaPresenceAudit(population: DataFrame, released: Column,
                         qidCols: Seq[Column], qidNames: Seq[String],
                         deltaMinBp: Int, deltaMaxBp: Int): DataFrame = {
    val named = qidCols.zip(qidNames).map { case (c, n) => c.as(n) }
    population.select(named :+ released.cast("long").as("__rel"): _*)
      .groupBy(qidNames.map(col): _*)
      .agg(count(lit(1)).as("n_pop"), sum(col("__rel")).as("n_released"))
      .withColumn("delta_bp",
        expr("n_released * 10000 div n_pop"))
      .withColumn("presence_safe",
        col("delta_bp") >= deltaMinBp && col("delta_bp") <= deltaMaxBp)
  }

  def kAnonymityAudit(df: DataFrame, qidCols: Seq[Column],
                      qidNames: Seq[String], sensitive: Column,
                      k: Int, l: Int): DataFrame = {
    val named = qidCols.zip(qidNames).map { case (c, n) => c.as(n) }
    df.select(named :+ sensitive.as("__sens"): _*)
      .groupBy(qidNames.map(col): _*)
      .agg(
        count(lit(1)).as("k_of_group"),
        countDistinct(col("__sens")).as("n_sensitive"))
      .withColumn("k_ok", col("k_of_group") >= k)
      .withColumn("l_ok", col("n_sensitive") >= l)
  }

  /** Domain generalization — the k-anonymity REMEDIATION step (Sweeney's
    * generalization lattice, one numeric dimension): coarsen the numeric
    * quasi-identifier through a ladder of bucket widths and report, per
    * width, how close the release is to k-anonymous. The smallest width
    * with zero violations is the minimal generalization — publish at
    * that granularity.
    *
    * One grouped aggregation PER WIDTH (the ladder is a handful of
    * levels, each a single pass; at 100 TB run the levels as one pass
    * with a grouping-sets expand if the scan dominates); each level's
    * readout is aggregate-of-aggregate over group-count rows, so output
    * is |widths| rows.
    */
  def numericGeneralization(df: DataFrame, groupCols: Seq[String],
                            numCol: String, widths: Seq[Long],
                            k: Int): DataFrame = {
    val perWidth = widths.map { w =>
      df.groupBy((groupCols.map(col) :+
          expr(s"$numCol div $w").as("__bucket")): _*)
        .agg(count(lit(1)).as("__n"))
        .agg(
          count(lit(1)).as("n_groups"),
          min(col("__n")).as("min_group"),
          sum(when(col("__n") < k, 1L).otherwise(0L)).as("n_violations"))
        .select(lit(w).as("width"), col("n_groups"), col("min_group"),
          col("n_violations"))
    }.reduce(_ unionByName _)
    val minOk = perWidth.filter(col("n_violations") === 0)
      .agg(min(col("width")).as("__min_ok"))
    perWidth.crossJoin(broadcast(minOk))
      .withColumn("k_anonymous", col("n_violations") === 0)
      .withColumn("chosen",
        coalesce(col("width") === col("__min_ok"), lit(false)))
      .drop("__min_ok")
  }

  /** t-closeness audit (Li, Li & Venkatasubramanian 2007) — the third
    * rung of the privacy-audit ladder after k-anonymity and l-diversity:
    * a group can satisfy both and still leak if its SENSITIVE-VALUE
    * DISTRIBUTION deviates from the corpus-wide one (the skewness
    * attack: "everyone in this small town has *some* diagnosis" vs
    * "90% of this QID group has diagnosis X"). The distance is total
    * variation: TVD(g) = ½ Σ_v |p_g(v) − p(v)|.
    *
    * Exact integers under the hash gate: cross-multiplied form
    * `tvd_num = Σ_v |n_gv·N − n_v·N_g| + N_g·(N − Σ_{v∈g} n_v)` over
    * `tvd_den = 2·N_g·N` (the second term folds all sensitive values
    * ABSENT from the group without enumerating them), plus basis points
    * `tvd_num·10⁴ div tvd_den` — all positive, so truncation agrees
    * across engines. Magnitudes stay ≤ n²·10⁴, far under BIGINT even at
    * 10¹² rows would overflow — at that scale drop the bp column and
    * compare num·10⁴ against den·t directly.
    *
    * Scale shape: one hash aggregation on (QID, sensitive), the global
    * sensitive histogram enters as a BROADCAST (|distinct sensitive|
    * rows), corpus total as a one-row broadcast — the audit of a 100 TB
    * table costs one shuffle of (QID, sensitive)-keyed counts.
    */
  def tClosenessAudit(df: DataFrame, qidCols: Seq[Column],
                      qidNames: Seq[String], sensitive: Column,
                      tBasisPoints: Int): DataFrame = {
    val named = qidCols.zip(qidNames).map { case (c, n) => c.as(n) }
    val base = df.select(named :+
      coalesce(sensitive.cast("string"), lit("~null~")).as("__sens"): _*)
    // (QID, sensitive) histogram — THE one corpus-sized shuffle
    val gv = base.groupBy((qidNames.map(col) :+ col("__sens")): _*)
      .agg(count(lit(1)).as("n_gv"))
    // global sensitive histogram + corpus total ride in as broadcasts
    val v = base.groupBy(col("__sens")).agg(count(lit(1)).as("n_v"))
    val total = base.agg(count(lit(1)).as("n_total"))
    val joined = gv.join(broadcast(v), "__sens").crossJoin(broadcast(total))
    // per-group totals, then joined back on the SAME qid key (the join
    // reuses gv's exchange partitioning; the g side is |groups| rows).
    // NULL-SAFE join (<=>): groupBy keeps a NULL-keyed QID group, so the
    // join-back must too — a plain equi-join would silently drop it and
    // the audit would skip exactly the group a release gate must see.
    val g = joined.groupBy(qidNames.map(col): _*)
      .agg(sum(col("n_gv")).as("n_g"),
        sum(col("n_v")).as("sum_v_present"))
    val gR = g.select(qidNames.map(n => col(n).as(s"__g_$n"))
      ++ Seq(col("n_g"), col("sum_v_present")): _*)
    val joinCond = qidNames.map(n => col(n) <=> col(s"__g_$n")).reduce(_ && _)
    joined.join(gR, joinCond)
      .drop(qidNames.map(n => s"__g_$n"): _*)
      .groupBy(qidNames.map(col): _*)
      .agg(
        first(col("n_g")).as("k_of_group"),
        (sum(abs(col("n_gv") * col("n_total") - col("n_v") * col("n_g")))
          + first(col("n_g") * (col("n_total") - col("sum_v_present"))))
          .as("tvd_num"),
        first(lit(2L) * col("n_g") * col("n_total")).as("tvd_den"))
      .withColumn("tvd_bp", expr("tvd_num * 10000L div tvd_den"))
      .withColumn("t_ok", col("tvd_bp") <= tBasisPoints)
  }

  /** Recursive (c,l)-diversity audit (Machanavajjhala et al. 2007, §4) —
    * the refinement plain l-diversity misses: a group can carry l
    * distinct sensitive values and still be dominated by one of them
    * (the probabilistic-inference attack: "5 diagnoses appear, but 95%
    * of the group has diagnosis X"). With the group's sensitive counts
    * frequency-ordered r₁ ≥ r₂ ≥ … ≥ r_m, the group passes iff
    * r₁ < c·(r_l + r_{l+1} + … + r_m) — the most common value must not
    * outweigh c times the tail beyond the first l−1 values.
    *
    * Exact integers throughout. Scale shape: one hash aggregation on
    * (QID, sensitive) — the single corpus-sized shuffle — then a window
    * PARTITIONED by the QID tuple over |distinct (QID, sensitive)| rows
    * (bounded per partition by the sensitive domain, never by corpus
    * rows) and a QID-keyed re-aggregation that reuses the same
    * partitioning. Output is |distinct QID| rows.
    */
  def recursiveLDiversityAudit(df: DataFrame, qidCols: Seq[Column],
                               qidNames: Seq[String], sensitive: Column,
                               l: Int, c: Int): DataFrame = {
    require(l >= 2, s"recursive (c,l)-diversity needs l >= 2, got $l")
    val named = qidCols.zip(qidNames).map { case (q, n) => q.as(n) }
    val base = df.select(named :+
      coalesce(sensitive.cast("string"), lit("~null~")).as("__sens"): _*)
    val gs = base.groupBy((qidNames.map(col) :+ col("__sens")): _*)
      .agg(count(lit(1)).as("n_gs"))
    // (count desc, value asc) is a total order, so the rank — and with
    // it r1/tail_sum — is deterministic across engines.
    val w = Window.partitionBy(qidNames.map(col): _*)
      .orderBy(col("n_gs").desc, col("__sens"))
    gs.withColumn("__r", row_number().over(w))
      .groupBy(qidNames.map(col): _*)
      .agg(
        sum(col("n_gs")).as("k_of_group"),
        count(lit(1)).as("n_sensitive"),
        max(when(col("__r") === 1, col("n_gs"))).as("r1"),
        sum(when(col("__r") >= l, col("n_gs")).otherwise(0L))
          .as("tail_sum"))
      .withColumn("rl_ok", col("r1") < lit(c.toLong) * col("tail_sum"))
  }

  /** ENTROPY ℓ-diversity audit (Machanavajjhala et al. 2007, the
    * information-theoretic variant preceding their recursive form):
    * per QID group the Shannon entropy of the sensitive-value
    * distribution must reach ln(l). Determinism discipline: each
    * (QID, sensitive) cell contributes `round(-(c/n)·ln(c/n)·1e9)` as
    * a BIGINT and the group entropy is the exact integer sum of those
    * rounded terms — double summation order can never flip a bit, and
    * the DuckDB oracle replays the identical per-term rounding. Same
    * cost shape as [[recursiveLDiversityAudit]]: one (QID, sensitive)
    * aggregation, a QID-partitioned window over rows bounded by the
    * sensitive DOMAIN (never corpus rows), one re-aggregation.
    */
  def entropyLDiversityAudit(df: DataFrame, qidCols: Seq[Column],
                             qidNames: Seq[String], sensitive: Column,
                             l: Int): DataFrame = {
    require(l >= 2, s"entropy l-diversity needs l >= 2, got $l")
    val named = qidCols.zip(qidNames).map { case (q, n) => q.as(n) }
    val base = df.select(named :+
      coalesce(sensitive.cast("string"), lit("~null~")).as("__sens"): _*)
    val gs = base.groupBy((qidNames.map(col) :+ col("__sens")): _*)
      .agg(count(lit(1)).as("n_gs"))
    val w = Window.partitionBy(qidNames.map(col): _*)
    gs.withColumn("k_of_group", sum(col("n_gs")).over(w))
      .withColumn("__h_term_fp", expr(
        "CAST(round(-(CAST(n_gs AS DOUBLE) / k_of_group)" +
          " * ln(CAST(n_gs AS DOUBLE) / k_of_group) * 1e9) AS BIGINT)"))
      .groupBy(qidNames.map(col): _*)
      .agg(max(col("k_of_group")).as("k_of_group"),
        count(lit(1)).as("n_sensitive"),
        sum(col("__h_term_fp")).as("entropy_fp"))
      .withColumn("el_ok",
        col("entropy_fp") >= expr(s"CAST(round(ln($l.0) * 1e9) AS BIGINT)"))
  }

  /** The release decision the audit feeds: rows whose QID group violates
    * k-anonymity (SUPPRESSION set — drop or generalize before release).
    * Broadcast of the violating groups keeps the corpus side map-only
    * when the violator set is small (it is, by definition of "tail").
    */
  /** Seeded Laplace count release — the ε-differential-privacy histogram
    * mechanism (Dwork, McSherry, Nissim & Smith 2006): per-group counts
    * released with additive Laplace(Δ/ε) noise, Δ = 1 for a count. The
    * draw is DETERMINISTIC given (seed, group): u ∈ (−½, ½) derives from
    * the group's keyed md5 (`(h + ½)/2³² − ½` over the 32-bit prefix —
    * the +½ centers the lattice so |u| < ½ strictly and ln(1−2|u|) is
    * finite), and inverse-CDF sampling gives noise = −b·sgn(u)·ln(1−2|u|)
    * with b = 1/ε. Seeded noise is itself the production pattern for
    * REPRODUCIBLE releases (auditable, re-runnable); an unlinkable
    * release swaps the seed for a CSPRNG draw and nothing else moves.
    * Determinism is also exactly what lets a DP mechanism sit under the
    * cross-engine hash gate.
    *
    * Released values are integers (rounded noise, floored at 0) —
    * post-processing, so ε-DP is preserved — and the true count never
    * appears in the output. One hash aggregation; the noise is a
    * map-side expression on the |groups|-row result, so the release of
    * a 100 TB table costs exactly its groupBy.
    */
  def dpCountRelease(df: DataFrame, groupCols: Seq[String],
                     epsilon: Double, seed: String): DataFrame = {
    val keyed = concat_ws("|", lit(seed) +:
      groupCols.map(c => coalesce(col(c).cast("string"), lit("~null~"))): _*)
    val h = conv(substring(md5(keyed), 1, 8), 16, 10).cast("double")
    val u = (h + lit(0.5)) / lit(4294967296.0) - lit(0.5)
    val noise = -lit(1.0 / epsilon) * signum(u) *
      log(lit(1.0) - lit(2.0) * abs(u))
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .withColumn("n_released",
        greatest(lit(0L), col("__n") + round(noise).cast("long")))
      .drop("__n")
  }

  def suppressionSet(df: DataFrame, qidCols: Seq[Column],
                     qidNames: Seq[String], sensitive: Column,
                     k: Int): DataFrame = {
    val audit = kAnonymityAudit(df, qidCols, qidNames, sensitive, k, l = 1)
      .filter(!col("k_ok"))
      .select(qidNames.map(col): _*)
    val keyed = df.withColumns(
      qidNames.zip(qidCols).map { case (n, c) => n -> c }.toMap)
    keyed.join(broadcast(audit), qidNames, "left_semi")
  }
}
