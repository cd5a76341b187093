package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Heavy hitters over an arbitrary-cardinality column — the two-pass
  * production shape built on the [[graft.functions.MisraGriesAgg]] native
  * summary:
  *
  *  1. One MG pass: each task summarizes its partition in O(k) memory,
  *     partials merge map-side, the driver-visible result is one <= k-entry
  *     candidate list. At 100 TB this replaces the full groupBy — whose
  *     shuffle carries ONE ROW PER DISTINCT ITEM (for URLs or n-grams that
  *     is the corpus, and the hot key IS the skew hazard) — with a shuffle
  *     of one fixed-size summary per task.
  *  2. One exact pass restricted to the candidates: join against the
  *     broadcast <= k-item list (a build side of k strings — never a
  *     shuffle), count exactly, keep items at or above `minShare` of the
  *     total row count.
  *
  * The MG guarantee (every item with share > 1/(k+1) is present in the
  * summary, for any input order and merge tree) plus `minShare > 1/(k+1)`
  * makes the final result EXACT and deterministic — equal to the full
  * groupBy-and-threshold — which is how the a12 gate hash-checks a
  * sketch-powered operator against plain SQL.
  */
object HeavyHitters {

  /** The MG summary as a Column aggregate (array<struct<item, mg_count>>). */
  def misraGries(item: Column, k: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.MisraGriesAgg(
        org.apache.spark.sql.graft.ColumnBridge.expression(item), k)
        .toAggregateExpression())

  /** Exploded candidate list from one MG pass over `items`. */
  def candidates(items: DataFrame, itemCol: String, k: Int): DataFrame =
    items
      .agg(misraGries(col(itemCol), k).as("summary"))
      .select(explode(col("summary")).as("s"))
      .select(col("s.item").as("item"), col("s.mg_count").as("mg_count"))

  /** Exact heavy hitters: items whose exact count is >= `minShare` of all
    * rows. Requires `minShare > 1/(k+1)` (checked) so the MG pass cannot
    * have evicted a qualifying item.
    */
  def heavyHitters(items: DataFrame, itemCol: String, k: Int,
                   minShare: Double): DataFrame = {
    require(minShare > 1.0 / (k + 1),
      s"minShare=$minShare must exceed 1/(k+1)=${1.0 / (k + 1)} " +
        "or the summary may evict a qualifying item")
    val it = items.select(col(itemCol).as("item"))
      .filter(col("item").isNotNull)
      .cache()
    val cand = candidates(it, "item", k).select("item")
    val totals = it.agg(count(lit(1)).as("total"))
    it.join(broadcast(cand), Seq("item")) // keep candidate rows only
      .groupBy(col("item"))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(totals)) // one row
      .filter(col("cnt") >= col("total") * minShare)
      .select(col("item"), col("cnt"), col("total"))
  }
}
