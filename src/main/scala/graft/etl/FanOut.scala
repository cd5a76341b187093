package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-table fan-out: one source row becomes rows in several destination
  * tables that share freshly generated surrogate ids (reference:
  * sdk/migrate_assures.php:99-163 — one `assure` row fans out to
  * ass_persons / ass_policy_holders / contacts / addresses / 2× ancestors,
  * all linked by client-side UUIDs).
  *
  * In Spark the ids must be generated ONCE and reused across projections —
  * `uuid()` is nondeterministic, so each projection of an unmaterialized
  * plan would regenerate different ids and break the linkage. We therefore
  * `localCheckpoint` the id-augmented frame: unlike `.cache()`, a
  * checkpoint TRUNCATES the lineage, so a lost partition cannot be
  * recomputed with fresh uuids — eviction/executor loss surfaces as a
  * retryable error instead of silently corrupted linkage.
  *
  * Scale note: the checkpoint holds source-width rows once, not once per
  * destination; at 100 TB set `spark.graft.checkpointDir` so
  * [[graft.Checkpoints.sever]] writes a reliable checkpoint instead of
  * executor-local blocks — `withIds` takes the already-materialized frame
  * either way, keeping the operator itself scan-shaped and shuffle-free
  * (pure projections).
  */
object FanOut {

  /** Add one nondeterministic surrogate-id column per name and materialize
    * eagerly with lineage truncation, so every downstream projection
    * observes identical ids — under recomputation too.
    */
  def withIds(df: DataFrame, idCols: Seq[String]): DataFrame =
    graft.Checkpoints.sever(
      idCols.foldLeft(df)((d, c) => d.withColumn(c, expr("uuid()"))),
      eager = true)

  /** Project the id-augmented frame into each destination shape. */
  def apply(withIds: DataFrame,
            projections: Map[String, Seq[Column]]): Map[String, DataFrame] =
    projections.map { case (name, cols) => name -> withIds.select(cols: _*) }
}
