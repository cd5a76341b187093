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

  test("interval overlap emits each pair EXACTLY ONCE (no dedup pass)") {
    // [0,100] and [50,150] share bins 5..10 at width 10 — must appear once
    val l = Seq((1, 0L, 100L, "L1")).toDF("k", "ls", "le", "lid")
    val r = Seq((1, 50L, 150L, "R1"), (1, 200L, 210L, "R2"))
      .toDF("k", "rs", "re", "rid")
    val rows = RangeJoin.intervalOverlap(l, r, "ls", "le", "rs", "re",
        Seq("k"), 10L)
      .select("lid", "rid").collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq === Seq("L1" -> "R1"),
      s"expected one (L1,R1) row, got ${rows.toSeq}")
  }

  test("interval overlap == naive inequality join, multiplicity included") {
    val rnd = new scala.util.Random(11)
    val left = Seq.tabulate(80) { i =>
      val s = rnd.nextInt(800).toLong
      (rnd.nextInt(4), s, s + rnd.nextInt(150).toLong, i.toLong)
    }.toDF("k", "ls", "le", "lid")
    // duplicate right rows on purpose: multiplicity must be preserved
    val base = Seq.tabulate(40) { i =>
      val s = rnd.nextInt(800).toLong
      (rnd.nextInt(4), s, s + rnd.nextInt(150).toLong, i.toLong)
    }
    val right = (base ++ base.take(10)).toDF("k", "rs", "re", "rid")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("lid", "rid").count()
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
        .toMap
    val fast = pairs(RangeJoin.intervalOverlap(left, right,
      "ls", "le", "rs", "re", Seq("k"), 64L))
    val naive = pairs(left.join(right, Seq("k"))
      .filter(col("ls") <= col("re") && col("rs") <= col("le")))
    assert(fast === naive)
    assert(fast.nonEmpty)
  }

  test("adjacent touching endpoints overlap; disjoint intervals don't") {
    val l = Seq((1, 0L, 10L, 1L)).toDF("k", "ls", "le", "lid")
    val r = Seq((1, 10L, 20L, 1L), (1, 11L, 20L, 2L))
      .toDF("k", "rs", "re", "rid")
    val got = RangeJoin.intervalOverlap(l, r, "ls", "le", "rs", "re",
        Seq("k"), 5L)
      .select("rid").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L), "inclusive endpoint [10,10] must match only rid=1")
  }
}
