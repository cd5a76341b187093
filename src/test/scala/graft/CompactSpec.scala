package graft

import java.nio.file.Files
import org.apache.spark.sql.functions.sum
import graft.etl.Sinks

class CompactSpec extends SparkSpec {
  import spark.implicits._

  test("compaction collapses many small files, preserves data") {
    val tmp = Files.createTempDirectory("graft_compact").toString + "/t"
    // simulate an append-heavy table: 40 tiny files
    (1 to 10).foreach { i =>
      ((i * 1000) until (i * 1000 + 100)).toDF("v")
        .repartition(4).write.mode("append").parquet(tmp)
    }
    def parquetFiles = new java.io.File(tmp).listFiles()
      .count(_.getName.endsWith(".parquet"))
    val before = parquetFiles
    assert(before >= 40)
    val sumBefore = spark.read.parquet(tmp).agg(sum($"v")).head().getLong(0)

    val n = Sinks.compactParquet(spark, tmp, targetFileMB = 128)
    assert(n === 1000L)
    assert(parquetFiles < before / 10, s"still $parquetFiles files")
    assert(spark.read.parquet(tmp).agg(sum($"v")).head().getLong(0)
      === sumBefore)
  }
}
