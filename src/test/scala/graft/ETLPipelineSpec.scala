package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import graft.etl.{ETLPipeline, PipelineSpec, Sinks}

/** End-to-end config-driven run: JSON → flows → parquet destinations,
  * replicating the reference's `php etl.php config.json` entry point
  * (SURVEY.md §3.1) including re-run idempotence (second run appends 0
  * rows because every mapped row anti-joins against the destination).
  */
class ETLPipelineSpec extends SparkSpec {

  test("config run writes destinations; re-run appends nothing") {
    val tmp = Files.createTempDirectory("graft_etl").toString
    val spec = PipelineSpec.parse(
      """{"tables":[
        | {"flow":"customer -> dim_segment",
        |  "columns":{"cust_id":"[c_custkey]","segment":"[c_mktsegment]",
        |             "source_system":"etl-test"},
        |  "unique":["segment"]},
        | {"flow":"supplier -> dim_supplier",
        |  "columns":["s_suppkey <- [s_suppkey]", "s_name"],
        |  "unique":["s_suppkey"]}
        |]}""".stripMargin)

    def loadDest(name: String): Option[DataFrame] = {
      val p = s"$tmp/$name"
      if (Files.exists(java.nio.file.Paths.get(p)))
        Some(spark.read.parquet(p))
      else None
    }

    def runOnce(): Seq[(String, Long)] = ETLPipeline.run(
      spec,
      loadTable = name => Tables.load(spark, sf, name),
      loadDestination = loadDest,
      writeDestination = (name, df) =>
        Sinks.appendParquet(df, s"$tmp/$name"))

    val first = runOnce()
    assert(first.toMap.apply("dim_segment") === 5L) // 5 distinct segments
    assert(first.toMap.apply("dim_supplier") === 10L)
    // columns follow the mapping (arrow list form incl. self-mapping)
    assert(spark.read.parquet(s"$tmp/dim_supplier").columns.sorted.toSeq ===
      Seq("s_name", "s_suppkey"))

    val second = runOnce()
    assert(second.toMap.apply("dim_segment") === 0L) // idempotent
    assert(second.toMap.apply("dim_supplier") === 0L)
  }
}
