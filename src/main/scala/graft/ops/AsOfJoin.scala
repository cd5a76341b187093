package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — an operator the DataFrame API lacks.
  *
  * Composed from built-ins per the preference order (SURVEY.md §7.3 /
  * spark guide: compose > custom Expression > custom SparkPlan): the two
  * sides are UNIONED, sorted within each key by (time, side-tag), and the
  * right side's payload is carried forward with
  * `last_value(..., ignoreNulls)` — so every left row picks up the most
  * recent right row with time <= its own.
  *
  * Cost shape: ONE hash-partitioned shuffle on the key + a per-partition
  * sort — the same exchange a regular equi-join needs. No range explosion,
  * no per-row probes; this is the 100 TB-safe as-of plan (a naive
  * `left.ts >= right.ts` range join materializes O(n·m) pairs per key
  * before aggregation).
  *
  * Tie semantics: a right row at exactly the left row's time MATCHES
  * (tag ordering puts right rows first at equal times) — same as DuckDB's
  * `ASOF JOIN ... ON l.ts >= r.ts`, which the oracle uses.
  *
  * Determinism among tied RIGHT rows (same key and time): the window
  * additionally orders by `valueCols.head` (nulls last, so left rows are
  * unaffected), and the backward/forward pick resolves to the
  * max/min-valued right row respectively. Without this the pick would be
  * partition-order-dependent. Full determinism requires `valueCols.head`
  * to be unique per (key, time) on the right side — true for id-like
  * payload columns.
  */
object AsOfJoin {

  /** For each row of `left`, attach `valueCols` from the most recent row of
    * `right` with the same `key` and `rightTime <= leftTime`. Left rows
    * with no prior right row keep null values (left-outer as-of).
    */
  def apply(left: DataFrame, right: DataFrame, key: String,
            leftTime: String, rightTime: String,
            valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns
    // tag 0 = right side, 1 = left side: at equal times the right row
    // sorts first, so last_value sees it (inclusive match).
    val l = left.select(
      (col(key).as("__k") +: col(leftTime).cast("timestamp").as("__t") +:
        lit(1).as("__side") +:
        leftCols.map(col)) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r = right.select(
      (col(key).as("__k") +: col(rightTime).cast("timestamp").as("__t") +:
        lit(0).as("__side") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))) ++
        valueCols.map(col): _*)
    val unioned = l.unionByName(r)
    // Third key breaks ties among right rows sharing (key, time): `last`
    // then deterministically picks the max-valued one. Left rows carry
    // null there (nulls last) so their relative order is unchanged.
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col(valueCols.head).asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = valueCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ valueCols.map(col): _*)
  }

  /** FORWARD as-of: for each row of `left`, attach `valueCols` from the
    * EARLIEST row of `right` with the same `key` and
    * `rightTime >= leftTime` (inclusive — a right row at exactly the left
    * row's time matches). Same single-shuffle union+window shape as
    * [[apply]], mirrored: the right side sorts AFTER left rows at equal
    * times and `first_value` looks over the frame from the current row
    * forward. The "next reading at or after the probe" direction —
    * next-quote-after-trade, next-error-after-release.
    */
  def forward(left: DataFrame, right: DataFrame, key: String,
              leftTime: String, rightTime: String,
              valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns
    // tag 0 = left side, 1 = right side: at equal times the left row
    // sorts first so the forward-looking frame includes the right row.
    val l = left.select(
      (col(key).as("__k") +: col(leftTime).cast("timestamp").as("__t") +:
        lit(0).as("__side") +:
        leftCols.map(col)) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r = right.select(
      (col(key).as("__k") +: col(rightTime).cast("timestamp").as("__t") +:
        lit(1).as("__side") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))) ++
        valueCols.map(col): _*)
    val unioned = l.unionByName(r)
    // Third key breaks ties among right rows sharing (key, time): `first`
    // then deterministically picks the min-valued one (mirrored in the
    // x6 oracle's window ORDER BY).
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col(valueCols.head).asc_nulls_last)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = valueCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, first(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 0)
      .select(leftCols.map(col) ++ valueCols.map(col): _*)
  }

  /** NEAREST as-of: for each row of `left`, attach `valueCols` from the
    * right row with the same `key` minimizing `|rightTime - leftTime|`;
    * equidistant candidates resolve to the PRIOR (backward) row — the
    * convention time-series libraries document for `nearest`.
    *
    * Still ONE hash exchange: the union carries BOTH a backward pick
    * (`last_value` over the preceding frame) and a forward pick
    * (`first_value` over the following frame) under the same partitioning
    * and sort; choosing between them is per-row arithmetic on the two
    * carried right-side times. A right row at exactly the left row's time
    * sorts before it (backward convention), so it lands in the backward
    * frame with distance 0 — which the tie rule prefers anyway.
    *
    * Determinism mirrors [[apply]]/[[forward]]: among right rows tied on
    * (key, time), the backward pick resolves to the max-`valueCols.head`
    * row and the forward pick to the min — the same sort key both frames
    * share.
    */
  def nearest(left: DataFrame, right: DataFrame, key: String,
              leftTime: String, rightTime: String,
              valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns
    // tag 0 = right side (sorts first at equal times, as in apply());
    // __rt carries the right row's own time so the pick can compare
    // distances after the carry.
    val l = left.select(
      (col(key).as("__k") +: col(leftTime).cast("timestamp").as("__t") +:
        lit(1).as("__side") +:
        lit(null).cast("timestamp").as("__rt") +:
        leftCols.map(col)) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r = right.select(
      (col(key).as("__k") +: col(rightTime).cast("timestamp").as("__t") +:
        lit(0).as("__side") +:
        col(rightTime).cast("timestamp").as("__rt") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))) ++
        valueCols.map(col): _*)
    val unioned = l.unionByName(r)
    val ord = Seq(col("__t"), col("__side"), col(valueCols.head).asc_nulls_last)
    val wb = Window.partitionBy(col("__k")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(col("__k")).orderBy(ord: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val withTimes = unioned
      .withColumn("__bt", last(col("__rt"), ignoreNulls = true).over(wb))
      .withColumn("__ft", first(col("__rt"), ignoreNulls = true).over(wf))
    // Backward wins when it exists and is at most as far as the forward
    // candidate (micros arithmetic — exact).
    val useB = col("__bt").isNotNull && (col("__ft").isNull ||
      unix_micros(col("__t")) - unix_micros(col("__bt")) <=
        unix_micros(col("__ft")) - unix_micros(col("__t")))
    val filled = valueCols.foldLeft(withTimes) { (df, c) =>
      df.withColumn(c,
        when(useB, last(col(c), ignoreNulls = true).over(wb))
          .otherwise(first(col(c), ignoreNulls = true).over(wf)))
    }
    filled.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ valueCols.map(col): _*)
  }

  /** Linear INTERPOLATION as-of: for each left row, reconstruct the right
    * series' value at the left row's time from the bracketing right rows —
    * `vb + (vf - vb) * (t - tb) / (tf - tb)` — the time-series alignment
    * primitive (pandas `merge_asof` + `interpolate`, but in one pass).
    * A right row exactly at the left time contributes its own value
    * (ratio 0); a missing bracket degrades to the one-sided carry
    * (backward-only → vb, forward-only → vf, neither → null).
    *
    * Same single-exchange shape as [[nearest]]: both the backward and the
    * forward (time, value) carries are frames over ONE hash partition +
    * sort of the unioned sides; the blend is per-row arithmetic. The
    * division is guarded — when both brackets exist, `tf > t >= tb` by
    * construction (right rows tied with the left time sort into the
    * backward frame), so `tf - tb > 0`.
    *
    * Determinism among right rows tied on (key, time) mirrors [[nearest]]:
    * the shared sort tie-breaks on the value column, so the backward pick
    * is the max-value row and the forward pick the min — reproduced by
    * the oracle's window ORDER BY.
    */
  def interpolate(left: DataFrame, right: DataFrame, key: String,
                  leftTime: String, rightTime: String,
                  valueCol: String): DataFrame = {
    val leftCols = left.columns
    val l = left.select(
      col(key).as("__k") +: col(leftTime).cast("timestamp").as("__t") +:
        lit(1).as("__side") +:
        lit(null).cast("timestamp").as("__rt") +:
        lit(null).cast("double").as("__v") +:
        leftCols.map(col): _*)
    val r = right.select(
      col(key).as("__k") +: col(rightTime).cast("timestamp").as("__t") +:
        lit(0).as("__side") +:
        col(rightTime).cast("timestamp").as("__rt") +:
        col(valueCol).cast("double").as("__v") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val unioned = l.unionByName(r)
    val ord = Seq(col("__t"), col("__side"), col("__v").asc_nulls_last)
    val wb = Window.partitionBy(col("__k")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(col("__k")).orderBy(ord: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = unioned
      .withColumn("__bt", last(col("__rt"), ignoreNulls = true).over(wb))
      .withColumn("__ft", first(col("__rt"), ignoreNulls = true).over(wf))
      .withColumn("__bv", last(col("__v"), ignoreNulls = true).over(wb))
      .withColumn("__fv", first(col("__v"), ignoreNulls = true).over(wf))
    val t = unix_micros(col("__t")).cast("double")
    val tb = unix_micros(col("__bt")).cast("double")
    val tf = unix_micros(col("__ft")).cast("double")
    val blend = col("__bv") +
      (col("__fv") - col("__bv")) * ((t - tb) / (tf - tb))
    val interp =
      when(col("__bt").isNotNull && col("__ft").isNotNull, blend)
        .when(col("__bt").isNotNull, col("__bv"))
        .when(col("__ft").isNotNull, col("__fv"))
    carried.filter(col("__side") === 1)
      .withColumn(valueCol + "_interp", interp)
      .select(leftCols.map(col) :+ col(valueCol + "_interp"): _*)
  }
}
