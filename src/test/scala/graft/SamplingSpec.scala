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

  test("mixture: quotas honor weights, unlisted sources excluded") {
    val df = (1L to 400L).map(i => (i, s"src${i % 4}")).toDF("id", "source")
    // budget 50% of 400 = 200; weights 60/40 → quotas 120/80
    val got = Sampling.mixture(df, "source", "id",
        weights = Seq("src0" -> 60, "src1" -> 40), budgetPct = 50)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val bySrc = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc === Map("src0" -> 100, "src1" -> 80),
      s"src0 capped by availability (100 rows), src1 fills its quota: $bySrc")
    assert(got.forall(r => r._2 == "src0" || r._2 == "src1"))
  }

  test("mixture selection is partitioning-independent and rerun-stable") {
    val df = (1L to 300L).map(i => (i, s"s${i % 3}")).toDF("id", "source")
    val pick = Sampling.mixture(df, "source", "id",
      Seq("s0" -> 50, "s1" -> 50), budgetPct = 20)
    val a = pick.collect().map(_.getLong(0)).sorted.toSeq
    val b = Sampling.mixture(df.repartition(11), "source", "id",
        Seq("s0" -> 50, "s1" -> 50), budgetPct = 20)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }
}
