package graft

import org.apache.spark.sql.functions._

class MetricsSpec extends SparkSpec {

  test("listener records completed actions with durations") {
    val collector = Metrics.attach(spark)
    try {
      Tables.load(spark, sf, "customer").filter(col("c_custkey") <= 10)
        .collect()
      Tables.load(spark, sf, "region").count()
      // listener delivery is asynchronous — poll until records arrive
      val deadline = System.currentTimeMillis() + 30000
      while (collector.snapshot().size < 2 &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      val recs = collector.snapshot()
      assert(recs.size >= 2)
      assert(recs.forall(!_.failed))
      assert(recs.forall(_.durationNs > 0))
      assert(collector.totalSeconds > 0)
    } finally collector.detach(spark)
  }
}
