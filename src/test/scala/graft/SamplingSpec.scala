package graft

import org.apache.spark.sql.functions._
import graft.ops.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("split assignment is stable under data growth") {
    val small = (1L to 100L).toDF("id")
    val big = (1L to 1000L).toDF("id")
    val a = Sampling.trainTestSplit(small, "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.trainTestSplit(big, "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // every id that existed in the small set keeps its assignment
    assert(a.forall { case (id, split) => b(id) == split })
    // the cut is roughly a quarter
    val testFrac = b.values.count(_ == "test").toDouble / b.size
    assert(testFrac > 0.15 && testFrac < 0.35, s"test fraction $testFrac")
  }

  test("stratified sample: exactly n per stratum, reproducible") {
    val df = (1L to 200L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "stratum")
    val s1 = Sampling.stratifiedSample(df, "stratum", "id", 5)
      .collect().map(_.getLong(0)).sorted
    val s2 = Sampling.stratifiedSample(df.repartition(7), "stratum", "id", 5)
      .collect().map(_.getLong(0)).sorted
    assert(s1.length === 10)
    assert(s1.toSeq === s2.toSeq) // partitioning-independent
  }
}
