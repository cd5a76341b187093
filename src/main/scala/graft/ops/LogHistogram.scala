package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Log-bucketed percentile histogram (the HdrHistogram design, Tene's
  * High Dynamic Range histogram; also the DDSketch guarantee of
  * Masson/Rim/Lee, VLDB 2019): nonneg integer values collapse onto
  * buckets that keep the top `1 + subBits` significant bits —
  * exponentially spaced buckets with `2^subBits` linear sub-buckets
  * each — so a bucket's lower bound under-reports its members by a
  * RELATIVE error below `2^-subBits` (1.6% at the default 6), at any
  * value magnitude.
  *
  * Why this beats `approx_percentile` as the 100 TB scale path: the
  * sketch is a plain `groupBy(bucket).count()` — fully mergeable,
  * map-side-combined, at most `64 * 2^subBits` rows of state (4096 at
  * the default) regardless of input size, and DETERMINISTIC: the same
  * corpus always yields the same sketch, so the gate can hash it,
  * which no randomized quantile sketch allows. One pass, no sort, no
  * per-key state growth; the only window runs over the bucket table,
  * whose cardinality is bounded by construction, not by data.
  *
  * Bucketing (integer-exact in both engines, no FP log):
  * values below `2^subBits` are their own bucket (exact); otherwise
  * with `e = length(bin(v)) - 1` (floor log2 via the binary-string
  * length — Spark and DuckDB both print BIGINT without leading zeros)
  * the bucket zeroes every bit below the top `1 + subBits`:
  * `low = (v >> (e - subBits)) << (e - subBits)`.
  */
object LogHistogram {

  /** Lower-bound bucket representative for a nonnegative long column. */
  def bucketLow(vCol: String, subBits: Int): org.apache.spark.sql.Column =
    when(col(vCol) < (1L << subBits), col(vCol))
      .otherwise(expr(
        s"shiftleft(shiftright($vCol, length(bin($vCol)) - 1 - $subBits)," +
          s" length(bin($vCol)) - 1 - $subBits)"))

  /** The mergeable sketch: (low, cnt) per occupied bucket. */
  def sketch(values: DataFrame, vCol: String,
             subBits: Int = 6): DataFrame =
    values.filter(col(vCol) >= 0)
      .select(bucketLow(vCol, subBits).as("low"))
      .groupBy("low").agg(count(lit(1)).as("cnt"))

  /** Percentile estimates read off the sketch: for each requested
    * basis-point rank, the lower bound of the bucket where the
    * cumulative count first reaches `k = ceil(n * p_bp / 10000)`.
    * The running sum rides the bucket table — at most `64 * 2^subBits`
    * rows by construction — so the unpartitioned window is bounded by
    * the sketch shape, not the data (contrast the exact-median gates,
    * which need [[ScaleSafe]] for the same step).
    */
  def percentiles(values: DataFrame, vCol: String, pBps: Seq[Int],
                  subBits: Int = 6): DataFrame =
    percentilesOfSketch(sketch(values, vCol, subBits), pBps)

  /** The readout half, decoupled so a sketch MERGED elsewhere (e.g.
    * accumulated incrementally by a streaming aggregation — st26) reads
    * identically to one built in a single batch pass: same thresholds,
    * same bucket floor, bit-equal output.
    */
  /** Per-GROUP percentiles — the segment-dashboard shape (latency
    * quantiles per endpoint, value quantiles per event type): one
    * grouped sketch pass, then the readout window PARTITIONED by the
    * group key, so every window frame is bounded by the per-group
    * bucket cardinality (≤ 64·2^subBits), never by group size — the
    * a24 group-quantile semantics at sketch cost.
    */
  def groupedPercentiles(values: DataFrame, groupCol: String,
                         vCol: String, pBps: Seq[Int],
                         subBits: Int = 6): DataFrame = {
    val spark = values.sparkSession
    import spark.implicits._
    val buckets = values.filter(col(vCol) >= 0)
      .select(col(groupCol), bucketLow(vCol, subBits).as("low"))
      .groupBy(groupCol, "low").agg(count(lit(1)).as("cnt"))
    val cum = buckets.withColumn("cum",
      sum("cnt").over(Window.partitionBy(groupCol).orderBy("low")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val totals = buckets.groupBy(groupCol).agg(sum("cnt").as("n"))
    // the threshold side descends from the same bucket lineage — alias
    // its key to dodge the self-join ambiguity
    val thresholds = totals
      .crossJoin(broadcast(pBps.map(_.toLong).toDF("p_bp")))
      .select(col(groupCol).as("__g"), col("p_bp"), col("n"),
        expr("(n * p_bp + 9999) div 10000").as("k"))
    cum.join(broadcast(thresholds),
        col(groupCol) === col("__g") && col("cum") >= col("k"))
      .groupBy(col(groupCol), col("p_bp"), col("n"), col("k"))
      .agg(min("low").as("est"))
  }

  def percentilesOfSketch(buckets: DataFrame, pBps: Seq[Int]): DataFrame = {
    val spark = buckets.sparkSession
    import spark.implicits._
    val cum = buckets.withColumn("cum",
      sum("cnt").over(Window.orderBy("low")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val thresholds = pBps.map(_.toLong).toDF("p_bp")
      .crossJoin(buckets.agg(sum("cnt").as("n")))
      .select(col("p_bp"), col("n"),
        expr("(n * p_bp + 9999) div 10000").as("k"))
    cum.join(broadcast(thresholds), col("cum") >= col("k"))
      .groupBy("p_bp", "n", "k")
      .agg(min("low").as("est"))
  }
}
