package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** The release decision the audit feeds: rows whose QID group violates
    * k-anonymity (SUPPRESSION set — drop or generalize before release).
    * Broadcast of the violating groups keeps the corpus side map-only
    * when the violator set is small (it is, by definition of "tail").
    */
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
