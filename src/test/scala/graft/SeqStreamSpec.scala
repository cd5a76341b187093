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

  test("without a batchRows limit the drain is a single micro-batch") {
    val (df, batches) = StreamOps.seqStreamAgg(spark, n = 5000L,
      parts = 2, batchRows = Long.MaxValue,
      queryName = "seqstream_spec_all")
    assert(batches === 1L, s"expected one batch, got $batches")
    assert(df.agg(sum("n")).collect()(0).getLong(0) === 5000L)
  }
}
