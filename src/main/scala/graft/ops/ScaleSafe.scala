package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe replacements for the global single-task sort family
  * (exact medians/ranks/running sums over unbounded input) — the
  * production paths the e21/e27/e28/x10/t31 in-file comments promise.
  *
  * Three building blocks, all EXACT (bit-identical to the global-sort
  * answer, so the same DuckDB oracle gates both paths):
  *
  *   - [[exactRankValueBracket]]: the element at a given rank in
  *     (value, tie) order, found by bracketing with `approx_percentile`
  *     (rank error ≤ n/accuracy by its sketch guarantee), counting
  *     below the bracket exactly, then rank-selecting INSIDE the
  *     bracket — the only unpartitioned window runs over ≤ ~6n/accuracy
  *     rows (bounded by construction), not over n rows.
  *   - [[rowNumberBucketed]] / [[runningSumBucketed]]: the two-level
  *     prefix scan — a DETERMINISTIC bucket function of the order key
  *     splits the input into ordered ranges (a pure row function, not a
  *     sampled `repartitionByRange`, so recomputing the input cannot
  *     re-draw different boundaries), each bucket windows locally in
  *     parallel, and a ≤#buckets-row offsets table (per-bucket
  *     count/sum, cumulated in one tiny window) broadcasts the carry
  *     back. Cost: one full-data exchange + one map-side-combined agg.
  *
  * SKEW caveat (documented, not hidden): the bucket function maps each
  * distinct order-key VALUE to one bucket, so a single value holding a
  * large fraction of all rows concentrates its rows in one task — the
  * same hot-key behavior as any hash/range partitioning. The remedy at
  * true scale is a broadcast boundary table that gives each hot value
  * DEDICATED sub-buckets split by the tie column (monotone within the
  * value, so ranks stay exact) — one small pre-aggregation to find hot
  * values, then the same two-level scan; not implemented here because
  * none of the gated order keys (event timestamps, md5 prefixes,
  * distinct cents values) can concentrate by construction, and an
  * untestable code path is worse than a documented one.
  *
  * Path selection follows the [[graft.Checkpoints.DirConf]] pattern:
  * gates that honor [[PathConf]] run the classic global window when it
  * is unset (the readout-sized default) and these operators when it is
  * `distributed`; the `*b` battery queries pin the distributed path
  * explicitly so it is oracle-gated every round.
  */
object ScaleSafe {

  /** Runtime conf selecting the rank/prefix-scan path: unset or
    * `global` → single global window (fine while the windowed input is
    * readout-sized); `distributed` → the operators in this file.
    */
  val PathConf = "spark.graft.scaleRankPath"

  def distributed(spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.conf.getOption(PathConf).exists(_ == "distributed")

  /** The exact value at rank `targetRank(n)` (1-based) of `df` ordered
    * by (`valueCol` asc, `tieCol` asc), as a 1-row DataFrame with the
    * single column `valueCol`. `q` is the approximate quantile position
    * of that rank (steers the bracket only — correctness never depends
    * on it: a bracket that misses the target rank is detected by the
    * exact boundary counts and retried 10× wider, degrading in the
    * worst case to the plain global selection).
    *
    * Two scalar jobs (count + percentile sketch, then the boundary
    * counts) before the lazy final selection — the one-row-read budget
    * the in-file collect audit already allows.
    */
  def exactRankValueBracket(df: DataFrame, valueCol: String,
                            tieCol: String, q: Double,
                            targetRank: Long => Long,
                            accuracy: Int = 10000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val probe = df.agg(
      count(lit(1)).as("n"),
      expr(s"approx_percentile($valueCol, array(" +
        s"greatest(0.0d, ${q} - 3.0d / $accuracy), " +
        s"least(1.0d, ${q} + 3.0d / $accuracy)), $accuracy)").as("b"))
      .as[(Long, Seq[Long])].head()
    val n = probe._1
    if (n == 0L) return df.select(col(valueCol)).limit(0)
    val target = targetRank(n)
    // a target outside [1, n] can never fall inside ANY bracket — the
    // widening loop below would spin full-corpus aggregations forever
    require(target >= 1L && target <= n,
      s"targetRank must map n=$n into [1, n]; got $target")

    // Widen the bracket until the exact boundary counts prove the
    // target rank falls inside it; the sketch guarantee makes the first
    // try succeed except at tiny n, where widening is free anyway.
    var lo = probe._2.head
    var hi = probe._2.last
    var margin = 3.0 / accuracy
    var bounds = df.agg(
      sum(when(col(valueCol) < lo, 1L).otherwise(0L)).as("lt"),
      sum(when(col(valueCol) <= hi, 1L).otherwise(0L)).as("le"))
      .as[(Long, Long)].head()
    while (target <= bounds._1 || target > bounds._2) {
      margin = margin * 10
      val wide = df.agg(
        expr(s"approx_percentile($valueCol, array(" +
          s"greatest(0.0d, ${q} - $margin), " +
          s"least(1.0d, ${q} + $margin)), $accuracy)").as("b"))
        .as[Seq[Long]].head()
      lo = wide.head; hi = wide.last
      bounds = df.agg(
        sum(when(col(valueCol) < lo, 1L).otherwise(0L)).as("lt"),
        sum(when(col(valueCol) <= hi, 1L).otherwise(0L)).as("le"))
        .as[(Long, Long)].head()
    }
    val cLt = bounds._1
    // All rows with value < lo precede every bracket row in
    // (value, tie) order, so bracket-local rank + cLt IS the global
    // rank; the window input is the bracket, bounded by the sketch.
    df.filter(col(valueCol) >= lo && col(valueCol) <= hi)
      .withColumn("__brn",
        row_number().over(Window.orderBy(col(valueCol), col(tieCol))))
      .filter(col("__brn") === lit(target - cLt))
      .select(col(valueCol))
  }

  /** Adds `outCol` = 1-based global row_number over `orderCols` without
    * a global single-task sort. `bucketCol` must be a deterministic
    * function of the leading order key(s) that is MONOTONE w.r.t. the
    * global order (every row of bucket i sorts before every row of
    * bucket i+1) — e.g. a fixed-width prefix of a hex digest, or an
    * integer range split of a long key. The per-bucket windows run in
    * parallel; the only unpartitioned window cumulates the ≤#buckets
    * per-bucket counts.
    *
    * The bucket aggregation recomputes `df` (a second source scan with
    * map-side combine) rather than caching the windowed child — at
    * 100 TB a re-scan is cheaper than pinning the corpus in memory, and
    * the deterministic bucket function makes the two computations agree
    * by construction.
    */
  def rowNumberBucketed(df: DataFrame, orderCols: Seq[Column],
                        bucketCol: Column, outCol: String): DataFrame = {
    val withB = df.withColumn("__b", bucketCol)
    val local = withB.withColumn("__lrn",
      row_number().over(Window.partitionBy("__b").orderBy(orderCols: _*))
        .cast("long"))
    val offs = withB.groupBy("__b").agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(
        sum("__c").over(Window.orderBy("__b")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__b"), col("__off"))
    local.join(broadcast(offs), "__b")
      .withColumn(outCol, col("__lrn") + col("__off"))
      .drop("__b", "__lrn", "__off")
  }

  /** Adds `outCol` = running sum of `valueCol` over `orderCols` (rows
    * unbounded-preceding → current) via the same two-level prefix scan
    * as [[rowNumberBucketed]]: local per-bucket cumsum in parallel,
    * per-bucket totals cumulated in a ≤#buckets-row window, carry
    * broadcast back.
    */
  def runningSumBucketed(df: DataFrame, orderCols: Seq[Column],
                         bucketCol: Column, valueCol: String,
                         outCol: String): DataFrame = {
    val withB = df.withColumn("__b", bucketCol)
    val local = withB.withColumn("__lsum",
      sum(col(valueCol)).over(Window.partitionBy("__b")
        .orderBy(orderCols: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val offs = withB.groupBy("__b").agg(sum(col(valueCol)).as("__t"))
      .withColumn("__off", coalesce(
        sum("__t").over(Window.orderBy("__b")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__b"), col("__off"))
    local.join(broadcast(offs), "__b")
      .withColumn(outCol, col("__lsum") + col("__off"))
      .drop("__b", "__lsum", "__off")
  }

  /** Monotone bucket id for a long-typed order key (a NAMED column)
    * over a known [lo, hi] domain:
    * `(k - lo) * buckets div (hi - lo + 1)` in pure BIGINT arithmetic —
    * a deterministic row function, uniform for roughly-uniform keys
    * (timestamps), and order-aligned by construction. Overflow-safe
    * while (hi - lo) * buckets < 2^63 (epoch-micros spans × any sane
    * bucket count sit far below that).
    */
  def rangeBucket(keyCol: String, lo: Long, hi: Long,
                  buckets: Int): Column =
    expr(s"($keyCol - ${lo}L) * ${buckets.toLong}L div ${hi - lo + 1L}L")

  /** Monotone bucket id for a lowercase-hex digest column (NAMED): the
    * first 4 hex chars as an integer, scaled to `buckets`.
    * Lexicographic order on fixed-width lowercase hex equals numeric
    * order on the prefix, so the bucket is order-aligned with the full
    * digest; md5 prefixes are uniform, so buckets balance.
    */
  def hexPrefixBucket(digestCol: String, buckets: Int): Column =
    expr(s"CAST(conv(substring($digestCol, 1, 4), 16, 10) AS BIGINT)" +
      s" * ${buckets.toLong}L div 65536L")
}
