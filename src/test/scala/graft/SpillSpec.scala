package graft

import org.apache.spark.sql.functions._

/** Spill-correctness: the 100 TB contract is that partitions LARGER than
  * memory still compute exactly — the sorters behind windows and
  * sort-merge joins spill to disk and merge back without changing a row.
  * These specs force the spill path with tiny in-memory thresholds and
  * pin bit-identical results against the default path, so a future
  * operator that sneaks per-key state onto the heap (where spilling
  * can't save it) fails CI here.
  */
class SpillSpec extends SparkSpec {

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def rowsOf(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, sf).collect().map(_.toString).toSeq

  test("window aggregation is bit-identical when forced to spill") {
    val baseline = rowsOf("w2_running_sum")
    val spilled = withConf(
      "spark.sql.windowExec.buffer.in.memory.threshold" -> "4",
      "spark.sql.windowExec.buffer.spill.threshold" -> "4") {
      rowsOf("w2_running_sum")
    }
    assert(spilled === baseline)
  }

  test("sort-merge join is bit-identical when forced to spill") {
    val q = () => {
      val orders = Tables.load(spark, sf, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"))
      Tables.load(spark, sf, "lineitem")
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(round(col("l_extendedprice") * 100).cast("long")).as("cents"))
        .orderBy("o_orderpriority")
        .collect().map(_.toString).toSeq
    }
    val baseline = withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") { q() }
    val spilled = withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.sortMergeJoinExec.buffer.in.memory.threshold" -> "4",
      "spark.sql.sortMergeJoinExec.buffer.spill.threshold" -> "4") { q() }
    assert(spilled === baseline)
  }

  test("sessionization window is spill-stable at per-user granularity") {
    val baseline = rowsOf("st2_sessionize")
    val spilled = withConf(
      "spark.sql.windowExec.buffer.in.memory.threshold" -> "2",
      "spark.sql.windowExec.buffer.spill.threshold" -> "2") {
      rowsOf("st2_sessionize")
    }
    assert(spilled === baseline)
  }
}
