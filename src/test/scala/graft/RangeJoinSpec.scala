package graft

import org.apache.spark.sql.functions._

import graft.ops.RangeJoin

/** Bucketized interval join: inclusive bounds, bin-spanning intervals, and
  * equivalence with the naive inequality join.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("containment is exact and inclusive across bin boundaries") {
    val points = Seq((1, 0L), (1, 10L), (1, 25L), (1, 26L), (2, 10L))
      .toDF("k", "p")
    val ranges = Seq((1, 10L, 25L, "a"), (2, 0L, 9L, "b"))
      .toDF("k", "s", "e", "tag")
    // binWidth 7 → the [10,25] interval spans bins 1..3
    val out = RangeJoin(points, ranges, "p", "s", "e", Seq("k"), 7L)
      .select("k", "p", "tag").collect().map(r =>
        (r.getInt(0), r.getLong(1), r.getString(2))).toSet
    // inclusive both ends: p=10 and p=25 match; p=26 and (2,10) don't
    assert(out === Set((1, 10L, "a"), (1, 25L, "a")))
  }

  test("bucketized join == naive inequality join on random data") {
    val rnd = new scala.util.Random(42)
    val points = Seq.tabulate(300)(i =>
      (rnd.nextInt(5), rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "p", "pid")
    val ranges = Seq.tabulate(60)(i =>
      { val s = rnd.nextInt(900).toLong
        (rnd.nextInt(5), s, s + rnd.nextInt(200).toLong, i.toLong) })
      .toDF("k", "s", "e", "rid")
    val fast = RangeJoin(points, ranges, "p", "s", "e", Seq("k"), 64L)
      .select("pid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val naive = points.join(ranges, Seq("k"))
      .filter(col("p") >= col("s") && col("p") <= col("e"))
      .select("pid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(fast === naive)
    assert(fast.nonEmpty)
  }
}
