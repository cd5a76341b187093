package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Checkpoint recovery: a streaming query stopped and restarted from its
  * checkpoint processes each input file EXACTLY once into a file sink —
  * the fault-tolerance contract a 100 TB ingest pipeline stands on (a
  * failed executor/driver must neither drop nor duplicate a day of
  * files). The file source tracks consumed files in the checkpoint log;
  * the parquet sink commits atomically per batch via its own log.
  */
class StreamingRecoverySpec extends SparkSpec {
  import spark.implicits._

  test("restart from checkpoint neither reprocesses nor drops files") {
    val root = Files.createTempDirectory("graft_recovery").toString
    val in = s"$root/in"; val out = s"$root/out"; val ck = s"$root/ck"
    new java.io.File(in).mkdirs()

    // Generation 1: one input file, run to completion, stop.
    (0 until 100).map(i => (i.toLong, s"a_$i")).toDF("id", "payload")
      .coalesce(1).write.mode("append").parquet(in)
    def runOnce(): Unit = {
      val q = spark.readStream
        .schema("id BIGINT, payload STRING")
        .parquet(in)
        .withColumn("tagged", concat(col("payload"), lit("!")))
        .writeStream
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .format("parquet")
        .start(out)
      q.processAllAvailable()
      q.stop()
    }
    runOnce()
    assert(spark.read.parquet(out).count() === 100L)

    // Generation 2: a second file arrives; restart from the SAME
    // checkpoint — only the new file flows through.
    (100 until 150).map(i => (i.toLong, s"b_$i")).toDF("id", "payload")
      .coalesce(1).write.mode("append").parquet(in)
    runOnce()
    val result = spark.read.parquet(out)
    assert(result.count() === 150L, "dropped or duplicated rows on restart")
    assert(result.select(countDistinct(col("id"))).as[Long].head === 150L,
      "ids duplicated across restarts")

    // Generation 3: restart with NO new input — exactly-once means zero
    // new output, not a re-emission of the last batch.
    runOnce()
    assert(spark.read.parquet(out).count() === 150L)
  }
}
