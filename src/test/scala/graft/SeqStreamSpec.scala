package graft

import org.apache.spark.sql.functions._
import graft.sources.SeqOffset
import graft.streaming.StreamOps

/** The custom DSv2 MicroBatchStream: admission control, exact replay
  * equality with the batch scan, offset serialization.
  */
class SeqStreamSpec extends SparkSpec {

  test("available-now drain honors ReadLimit: 10k rows at 2.5k/batch " +
      "takes >= 4 micro-batches and equals the batch aggregate") {
    val (df, batches) = StreamOps.seqStreamAgg(spark, n = 10000L,
      parts = 4, batchRows = 2500L, queryName = "seqstream_spec")
    assert(batches >= 4L,
      s"admission control ignored: drained in $batches batch(es)")
    val streamed = df.orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val batch = spark.read.format("graft.sources.SeqSourceProvider")
      .option("n", "10000").load()
      .groupBy((col("id") % 10).as("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("val")).as("sum_val"))
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(streamed === batch)
  }

  test("offset JSON round-trips through the checkpoint format") {
    val off = SeqOffset(123456789L)
    assert(SeqOffset.parse(off.json()) === 123456789L)
    intercept[IllegalArgumentException] { SeqOffset.parse("{}") }
  }

  test("event-time windows merge state across admission-controlled " +
      "triggers: 3600-row hours split over 2000-row batches") {
    // every hourly window's rows span two triggers (3600 > 2000, not a
    // multiple) — the windowed state MUST merge across batches
    val (df, batches) = StreamOps.seqStreamWindowed(spark, n = 7200L,
      parts = 2, batchRows = 2000L, epoch = 1704067200L,
      queryName = "seqwin_spec")
    assert(batches >= 4L, s"drained in $batches batches")
    val rows = df.orderBy("hour_str").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.map(_._2).toSeq === Seq(3600L, 3600L))
    assert(rows.map(_._1).toSeq ===
      Seq("2024-01-01 00:00:00", "2024-01-01 01:00:00"))
  }

  test("without a batchRows limit the drain is a single micro-batch") {
    val (df, batches) = StreamOps.seqStreamAgg(spark, n = 5000L,
      parts = 2, batchRows = Long.MaxValue,
      queryName = "seqstream_spec_all")
    assert(batches === 1L, s"expected one batch, got $batches")
    assert(df.agg(sum("n")).collect()(0).getLong(0) === 5000L)
  }
}
