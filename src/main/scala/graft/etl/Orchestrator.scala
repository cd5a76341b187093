package graft.etl

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Orchestration parity with the reference's shell layer (reference:
  * sdk/shell/import.sh): migrations with dependencies run sequentially
  * (`migrate_employeur` before `migrate_assures` — import.sh:85-91),
  * independent migrations run as parallel background processes
  * (`migrate_enfants` ∥ `migrate_conjoint` — import.sh:93-100;
  * import_users.sh:62-66).
  *
  * Here: a stage is a set of independent jobs launched on the driver as
  * futures — Spark actions are thread-safe and the DAG scheduler interleaves
  * their tasks across the executor pool (FAIR/FIFO per config). Stages
  * barrier like the shell's `wait`. The reference's scatter of 500-key
  * chunks to worker processes (sdk/process.php:129-147) needs no analogue:
  * partitioning IS the scatter.
  */
object Orchestrator {

  /** Run stages in order; jobs within a stage concurrently. Returns each
    * job's result in submission order. A failed job fails its stage (like
    * `set -e` around the shell's foreground steps).
    */
  def runStages[T](stages: Seq[Seq[() => T]])
                  (implicit ec: ExecutionContext): Seq[Seq[T]] =
    stages.map { stage =>
      Await.result(Future.sequence(stage.map(job => Future(job()))),
        Duration.Inf)
    }

  /** Convenience: run one config's flows as a single parallel stage per
    * contiguous group of independent destinations (flows writing the same
    * destination stay ordered).
    */
  def stagesByDestination(spec: PipelineSpec): Seq[Seq[FlowSpec]] = {
    val seen = scala.collection.mutable.Set[String]()
    val stages = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer[FlowSpec]())
    spec.flows.foreach { f =>
      if (seen.contains(f.to) || seen.contains(f.from)) {
        stages += scala.collection.mutable.ArrayBuffer(f)
        seen.clear()
      } else stages.last += f
      seen += f.to
    }
    stages.map(_.toSeq).toSeq
  }
}
