package graft

import java.sql.Timestamp
import graft.ops.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("picks the most recent prior right row; null when none; inclusive tie") {
    val trades = Seq(
      (1L, "A", ts("2026-01-01 10:00:00")),
      (2L, "A", ts("2026-01-01 10:05:00")),
      (3L, "A", ts("2026-01-01 09:00:00")), // before any quote → null
      (4L, "B", ts("2026-01-01 10:00:00"))  // equal time → inclusive match
    ).toDF("trade_id", "sym", "t")
    val quotes = Seq(
      ("A", ts("2026-01-01 09:30:00"), 10.0),
      ("A", ts("2026-01-01 10:03:00"), 11.0),
      ("B", ts("2026-01-01 10:00:00"), 20.0)
    ).toDF("sym", "qt", "px")

    val out = AsOfJoin(trades, quotes, "sym", "t", "qt", Seq("px"))
      .orderBy("trade_id").collect()
    assert(out.map(r => Option(r.get(r.fieldIndex("px")))).toSeq ===
      Seq(Some(10.0), Some(11.0), None, Some(20.0)))
  }

  test("forward as-of picks the EARLIEST later row; null when none; " +
      "inclusive tie") {
    val probes = Seq(
      (1L, "A", ts("2026-01-01 10:00:00")), // next quote 10:03
      (2L, "A", ts("2026-01-01 10:04:00")), // after last quote → null
      (3L, "A", ts("2026-01-01 09:00:00")), // earliest future = 09:30
      (4L, "B", ts("2026-01-01 10:00:00"))  // equal time → inclusive match
    ).toDF("trade_id", "sym", "t")
    val quotes = Seq(
      ("A", ts("2026-01-01 09:30:00"), 10.0),
      ("A", ts("2026-01-01 10:03:00"), 11.0),
      ("B", ts("2026-01-01 10:00:00"), 20.0)
    ).toDF("sym", "qt", "px")

    val out = AsOfJoin.forward(probes, quotes, "sym", "t", "qt", Seq("px"))
      .orderBy("trade_id").collect()
    assert(out.map(r => Option(r.get(r.fieldIndex("px")))).toSeq ===
      Seq(Some(11.0), None, Some(10.0), Some(20.0)))
  }

  test("nearest as-of picks the closest row either direction; " +
      "backward wins ties; equal time is distance 0") {
    val probes = Seq(
      (1L, "A", ts("2026-01-01 10:00:00")), // 09:58 (2min) vs 10:03 (3min) → backward
      (2L, "A", ts("2026-01-01 10:02:00")), // 09:58 (4min) vs 10:03 (1min) → forward
      (3L, "A", ts("2026-01-01 09:00:00")), // nothing before → forward 09:58
      (4L, "A", ts("2026-01-01 11:00:00")), // nothing after → backward 10:03
      (5L, "B", ts("2026-01-01 10:00:00")), // equal time → that row
      (6L, "B", ts("2026-01-01 10:02:00")), // 10:00 (2min) vs 10:04 (2min) tie → backward
      (7L, "C", ts("2026-01-01 10:00:00"))  // no right rows at all → null
    ).toDF("trade_id", "sym", "t")
    val quotes = Seq(
      ("A", ts("2026-01-01 09:58:00"), 10.0),
      ("A", ts("2026-01-01 10:03:00"), 11.0),
      ("B", ts("2026-01-01 10:00:00"), 20.0),
      ("B", ts("2026-01-01 10:04:00"), 21.0)
    ).toDF("sym", "qt", "px")

    val out = AsOfJoin.nearest(probes, quotes, "sym", "t", "qt", Seq("px"))
      .orderBy("trade_id").collect()
    assert(out.map(r => Option(r.get(r.fieldIndex("px")))).toSeq ===
      Seq(Some(10.0), Some(11.0), Some(10.0), Some(11.0), Some(20.0),
        Some(20.0), None))
  }

  test("interpolate blends the bracketing rows linearly; one-sided carry " +
      "at the edges; exact-time row passes through; null when no rows") {
    val probes = Seq(
      (1L, "A", ts("2026-01-01 10:01:00")), // 1/3 of 10:00→10:03: 10 + 3*(1/3)
      (2L, "A", ts("2026-01-01 10:00:00")), // exact match → 10.0
      (3L, "A", ts("2026-01-01 09:00:00")), // before first → forward carry 10.0
      (4L, "A", ts("2026-01-01 11:00:00")), // after last → backward carry 13.0
      (5L, "C", ts("2026-01-01 10:00:00"))  // no right rows → null
    ).toDF("trade_id", "sym", "t")
    val quotes = Seq(
      ("A", ts("2026-01-01 10:00:00"), 10.0),
      ("A", ts("2026-01-01 10:03:00"), 13.0)
    ).toDF("sym", "qt", "px")

    val out = AsOfJoin.interpolate(probes, quotes, "sym", "t", "qt", "px")
      .orderBy("trade_id").collect()
    assert(out.map(r => Option(r.get(r.fieldIndex("px_interp")))).toSeq ===
      Seq(Some(11.0), Some(10.0), Some(10.0), Some(13.0), None))
  }
}
