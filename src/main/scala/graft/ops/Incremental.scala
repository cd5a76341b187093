package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view discipline
  * that makes daily 100 TB reporting affordable: keep per-key MERGEABLE
  * summaries (count, sum, min, max — each closed under pairwise merge),
  * fold each new delta into the stored summary, and derive the
  * non-mergeable readouts (avg) at presentation time. Refreshing then
  * costs O(|summary| + |delta|); the naive recompute rescans all of
  * history every day.
  *
  * The algebra: `partial(A ∪ B) == merge(partial(A), partial(B))` for any
  * disjoint split — count and sum add, min and max take the extremum, so
  * the merge is itself one grouped aggregation over the union of two
  * summary tables (both agg-sized, both tiny next to the fact table).
  * Keys appearing only in the delta enter the summary naturally; an empty
  * delta is the identity. This is exactly Spark's own partial-aggregation
  * contract lifted from within one job to ACROSS materialization
  * boundaries (days, loads, streams).
  *
  * Everything is integer-exact (counts, long-cents sums, long min/max),
  * so the maintained summary is hash-identical to the full recompute —
  * the property the oracle gate checks.
  */
object Incremental {

  /** Per-key mergeable summary of `valueCol` (must be integral — use the
    * cents discipline for money): n, sum, min, max.
    */
  def partial(df: DataFrame, keys: Seq[String],
              valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col(valueCol)).as("sum_v"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"))

  /** Fold two summaries (e.g. the stored view and a delta's [[partial]])
    * into one. Both inputs carry the (keys, n, sum_v, min_v, max_v)
    * shape. One union + one grouped aggregation over summary-sized data.
    */
  def merge(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("n")).as("n"),
        sum(col("sum_v")).as("sum_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))

  /** Presentation readout: the summary plus the derived mean (one
    * deterministic division per row).
    */
  def withAvg(summary: DataFrame): DataFrame =
    summary.withColumn("avg_v",
      col("sum_v").cast("double") / col("n"))
}
