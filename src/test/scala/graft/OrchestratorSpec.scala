package graft

import java.nio.file.Files
import scala.concurrent.ExecutionContext.Implicits.global
import org.apache.spark.sql.functions._
import graft.etl.{Orchestrator, PipelineSpec, Sinks}

class OrchestratorSpec extends SparkSpec {

  test("parallel stage runs concurrent Spark jobs; stages barrier") {
    val tmp = Files.createTempDirectory("graft_orch").toString
    val cust = Tables.load(spark, sf, "customer")
    val sup = Tables.load(spark, sf, "supplier")

    val results = Orchestrator.runStages(Seq(
      // stage 1: two independent writes in parallel (import.sh:93-100)
      Seq(
        () => Sinks.overwriteParquet(cust.select("c_custkey", "c_name"),
          s"$tmp/a"),
        () => Sinks.overwriteParquet(sup.select("s_suppkey", "s_name"),
          s"$tmp/b")),
      // stage 2: depends on stage 1 outputs (import.sh:85-91 sequencing)
      Seq(() => spark.read.parquet(s"$tmp/a").count() +
        spark.read.parquet(s"$tmp/b").count())))

    assert(results(0).sorted === Seq(10L, 150L))
    assert(results(1) === Seq(160L))
  }

  test("flows targeting the same destination stay ordered") {
    val spec = PipelineSpec.parse(
      """{"tables":[
        |  {"flow":"a -> x"}, {"flow":"b -> y"},
        |  {"flow":"c -> x"}, {"flow":"d -> z"}]}""".stripMargin)
    val stages = Orchestrator.stagesByDestination(spec)
    // a->x and b->y are independent; c->x must wait for a->x
    assert(stages.length === 2)
    assert(stages(0).map(_.to) === Seq("x", "y"))
    assert(stages(1).map(_.to) === Seq("x", "z"))
  }
}
