package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-table co-location: pay a table's shuffle ONCE at write time
  * ([[graft.etl.Sinks.bucketedTable]]), then every subsequent join or
  * aggregation on the bucket key runs with NO Exchange — the amortization
  * that matters most at 100 TB, where a fact table is written once and
  * joined thousands of times.
  *
  * Mechanics: both sides written with `bucketBy(n, key).sortBy(key)`.
  * The bucketed scan reports `HashPartitioning(key, n)`, so
  * `EnsureRequirements` inserts no Exchange under the sort-merge join.
  * A per-partition Sort DOES remain: since SPARK-28595 Spark ignores the
  * on-disk sort order of bucket files (it can't trust it once a bucket
  * has several files) — that sort is a cheap linear merge of already-
  * sorted runs, while the Exchange it replaces is the all-to-all network
  * move that dominates a 100 TB join.
  *
  * Cluster sizing: buckets should be a multiple of the executor-core
  * count and sized so one bucket's rows fit a task comfortably — at
  * 100 TB think 2^15+ buckets, and co-bucket every table sharing the key.
  */
object Bucketing {

  /** The co-located join the gate checks: lineitem ⋈ orders on the order
    * key, both sides bucketed on it. Writing inside the query is honest
    * accounting for the harness; the read side is split out below so the
    * plan spec asserts on what repeated queries actually pay.
    */
  def priorityRevenueBucketed(spark: SparkSession, dir: String,
                              nBuckets: Int = 8): DataFrame = {
    // Table names are per-sf-dir so harnesses on different scale factors
    // don't clobber each other's warehouse entries. md5 of the dir, not
    // String.hashCode: 32-bit collisions would alias two dirs onto one
    // table (and abs(MinValue) is negative → invalid identifier).
    val suffix = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8"))
      .take(6).map(b => f"$b%02x").mkString
    val ordersT = s"graft_orders_b$suffix"
    val lineT = s"graft_lineitem_b$suffix"
    graft.etl.Sinks.bucketedTable(
      graft.Tables.load(spark, dir, "orders")
        .select("o_orderkey", "o_orderpriority"),
      ordersT, nBuckets, Seq("o_orderkey"))
    graft.etl.Sinks.bucketedTable(
      graft.Tables.load(spark, dir, "lineitem")
        .select("l_orderkey", "l_extendedprice"),
      lineT, nBuckets, Seq("l_orderkey"))
    bucketedJoin(spark, ordersT, lineT)
  }

  /** The read-side join over already-bucketed tables. The `merge` hint
    * keeps the small side out of a broadcast at test scale; at real scale
    * the optimizer picks SMJ on its own and the bucketed layout is what
    * saves the two shuffles.
    */
  def bucketedJoin(spark: SparkSession, ordersT: String,
                   lineT: String): DataFrame =
    spark.table(lineT)
      .hint("merge")
      .join(spark.table(ordersT),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(round(col("l_extendedprice") * 100).cast("long"))
          .as("price_cents"))
      .orderBy("o_orderpriority")
}
