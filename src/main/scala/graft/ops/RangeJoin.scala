package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-containment (range) join — with [[AsOfJoin]], the second
  * temporal operator the DataFrame API lacks a scalable plan for: Spark
  * plans a naive `point BETWEEN start AND end` join as a broadcast
  * nested-loop / cartesian filter, O(n·m) pairs per key.
  *
  * Shape here: each right-side interval explodes into the coarse time BINS
  * it covers; each left-side point computes its single bin; the join is an
  * EQUALITY join on (keys, bin) followed by the exact containment filter.
  * A (point, interval) pair can only meet in the point's bin, so no dedup
  * pass is needed. One hash shuffle on (keys, bin) — the same exchange a
  * plain equi-join pays.
  *
  * `binWidth` trades replication for candidate precision: an interval
  * explodes into (length / binWidth) + 1 rows, a bin holds candidates
  * within binWidth of a match. Pick roughly the TYPICAL interval length;
  * degenerate long intervals are the skew hazard (cap or split upstream).
  * Point/start/end are non-negative integer columns (e.g. epoch micros),
  * inclusive on both ends.
  */
object RangeJoin {

  def apply(left: DataFrame, right: DataFrame, pointCol: String,
            startCol: String, endCol: String, keys: Seq[String],
            binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(!left.columns.contains("__graft_bin") &&
      !right.columns.contains("__graft_bin"),
      "__graft_bin is reserved by RangeJoin; rename the input column")
    // integral `div`, not `/` — double division drops precision past 2^53
    def bin(c: Column): Column = call_function("div", c, lit(binWidth))
    val lb = left.withColumn("__graft_bin", bin(col(pointCol)))
    val rb = right.withColumn("__graft_bin",
      explode(sequence(bin(col(startCol)), bin(col(endCol)))))
    lb.join(rb, (keys :+ "__graft_bin").toSeq)
      .filter(col(pointCol) >= col(startCol) &&
        col(pointCol) <= col(endCol))
      .drop("__graft_bin")
  }

  /** Interval-OVERLAP join: pairs of intervals (one from each side, same
    * keys) with `[s1,e1] ∩ [s2,e2] ≠ ∅` — the both-sides generalization of
    * the point-in-interval join above, which Spark would likewise plan as
    * a nested-loop filter.
    *
    * Both sides explode into the bins they cover and meet on an EQUALITY
    * key (keys, bin). An overlapping pair shares every bin of the overlap,
    * so to emit it exactly once WITHOUT a distinct pass, a match only
    * counts in the bin containing the overlap's start, `max(s1, s2)` —
    * both intervals cover that point, so both explodes produced that bin,
    * and it is unique per pair. Multiplicity is therefore preserved for
    * duplicate rows, and no exchange beyond the one hash join is needed.
    *
    * Left columns are `(startCol, endCol)`; the right side's interval
    * columns must be DIFFERENTLY named (rename before calling). Inclusive
    * bounds, non-negative integers.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      startCol: String, endCol: String,
                      rStartCol: String, rEndCol: String,
                      keys: Seq[String], binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(!left.columns.contains("__graft_bin") &&
      !right.columns.contains("__graft_bin"),
      "__graft_bin is reserved by RangeJoin; rename the input column")
    def bin(c: Column): Column = call_function("div", c, lit(binWidth))
    val lb = left.withColumn("__graft_bin",
      explode(sequence(bin(col(startCol)), bin(col(endCol)))))
    val rb = right.withColumn("__graft_bin",
      explode(sequence(bin(col(rStartCol)), bin(col(rEndCol)))))
    lb.join(rb, (keys :+ "__graft_bin").toSeq)
      .filter(col(startCol) <= col(rEndCol) &&
        col(rStartCol) <= col(endCol) &&
        col("__graft_bin") === bin(greatest(col(startCol), col(rStartCol))))
      .drop("__graft_bin")
  }
}
