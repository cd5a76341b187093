package graft

import org.apache.spark.sql.functions._
import graft.ops.Bucketing

/** Bucketed co-location: the join over two tables bucketed on the join
  * key must plan with no Exchange UNDER the join — the write-time shuffle
  * is the whole point, so the read-side plan is the evidence. (A Sort
  * under the SMJ legitimately remains: SPARK-28595 made Spark ignore
  * on-disk bucket sort order; the Exchange is what bucketing removes.)
  */
class BucketSpec extends SparkSpec {
  import spark.implicits._

  private val nBuckets = 4

  private def writeTables(): (String, String) = {
    val left = (1 to 200).map(i => (i.toLong % 50, i.toDouble))
      .toDF("l_orderkey", "l_extendedprice")
    val right = (0 to 49).map(i => (i.toLong, s"PRIO-${i % 5}"))
      .toDF("o_orderkey", "o_orderpriority")
    graft.etl.Sinks.bucketedTable(left, "bspec_line", nBuckets,
      Seq("l_orderkey"))
    graft.etl.Sinks.bucketedTable(right, "bspec_orders", nBuckets,
      Seq("o_orderkey"))
    ("bspec_orders", "bspec_line")
  }

  test("bucketed join: SMJ with no Exchange under it; result matches plain") {
    val (o, l) = writeTables()
    // The full gate query's trailing orderBy adds a legitimate range
    // Exchange, so assert on the join+agg subtree.
    val joined = spark.table(l).hint("merge")
      .join(spark.table(o), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(plan.contains("Bucketed: true"), s"scan not bucket-aware:\n$plan")
    // Exactly ONE hash Exchange: the group-by-priority aggregation (a
    // different key). Zero on the join inputs.
    val exchanges = "Exchange hashpartitioning".r
      .findAllMatchIn(plan).length
    assert(exchanges === 1,
      s"expected only the agg exchange, found $exchanges:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
      !plan.contains("Exchange hashpartitioning(o_orderkey"),
      s"join inputs must not shuffle:\n$plan")
    val plain = spark.table(l).join(spark.table(o),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    assert(joined.exceptAll(plain).isEmpty && plain.exceptAll(joined).isEmpty)
  }

  test("each bucket is a single file (repartition-by-bucket-key trick)") {
    writeTables()
    val loc = spark.sessionState.catalog.defaultTablePath(
      org.apache.spark.sql.catalyst.TableIdentifier("bspec_line"))
    val dir = new java.io.File(new java.net.URI(loc.toString))
    val parts = dir.listFiles().filter(_.getName.startsWith("part-"))
    assert(parts.length === nBuckets,
      s"expected $nBuckets bucket files, got ${parts.map(_.getName).toSeq}")
  }

  test("aggregation on the bucket key needs no Exchange either") {
    val (_, l) = writeTables()
    val agg = spark.table(l).groupBy("l_orderkey")
      .agg(count(lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed scan satisfies the aggregate's distribution:\n$plan")
    assert(agg.count() === 50)
  }

  test("stale warehouse directory from a dead catalog is cleared") {
    // Simulate a previous JVM's leftovers: a table DIRECTORY with no
    // catalog entry (DROP TABLE can't produce this — it deletes the dir).
    spark.sql("DROP TABLE IF EXISTS bspec_line")
    val loc = spark.sessionState.catalog.defaultTablePath(
      org.apache.spark.sql.catalyst.TableIdentifier("bspec_line"))
    val dir = new java.io.File(new java.net.URI(loc.toString))
    assert(dir.mkdirs())
    assert(new java.io.File(dir, "orphan.parquet").createNewFile())
    // Re-create must succeed, not die with LOCATION_ALREADY_EXISTS.
    val (_, l) = writeTables()
    assert(spark.table(l).count() === 200)
  }
}
