package graft

import graft.ops.Profile

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile counts rows, nulls, distincts per column in one pass") {
    val df = Seq((1L, Some("a")), (2L, None), (3L, Some("a")))
      .toDF("id", "v")
    val got = Profile.profile(df, Seq("id", "v")).orderBy("col_name")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // count(DISTINCT) ignores nulls in both engines: v has {a} only.
    assert(got.toSeq === Seq(("id", 3L, 0L, 3L), ("v", 3L, 1L, 1L)))
  }

  test("empty input profiles to zeros, not nulls") {
    val df = Seq.empty[(Long, String)].toDF("id", "v")
    val got = Profile.profile(df, Seq("id", "v")).orderBy("col_name")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(("id", 0L, 0L, 0L), ("v", 0L, 0L, 0L)))
  }

  test("exact profile expands; approx profile does not") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val exactPlan = Profile.profile(df, Seq("id", "v"))
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"),
      s"multi-column exact distinct should plan an Expand:\n$exactPlan")
    val approx = Profile.profile(df, Seq("id", "v"), exact = false)
    val approxPlan = approx.queryExecution.executedPlan.toString
    assert(!approxPlan.contains("Expand"),
      s"HLL sketches must aggregate without Expand:\n$approxPlan")
    // On tiny cardinalities the sketch is exact.
    val got = approx.orderBy("col_name").collect()
      .map(r => (r.getString(0), r.getLong(3)))
    assert(got.toSeq === Seq(("id", 2L), ("v", 2L)))
  }
}
