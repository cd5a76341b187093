package graft

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative operators (PageRank, connected
  * components, BFS/SSSP, k-core, fan-out surrogate ids), switchable
  * between the two Spark checkpoint flavors:
  *
  *   - `localCheckpoint` (the default): blocks live on executor local
  *     storage — no distributed-FS round trip, right for the single-JVM
  *     harness, but a lost executor loses its blocks and the truncated
  *     lineage means they CANNOT be recomputed; the job fails.
  *   - reliable `checkpoint`: blocks are written to a fault-tolerant
  *     directory (HDFS/object store), so on a 1000-executor cluster an
  *     executor loss mid-iteration recovers by re-reading, not by
  *     failing the round. This is the mode every in-file scale note
  *     promises; set `spark.graft.checkpointDir` to turn it on.
  *
  * The switch is a runtime conf, not a code path: results are
  * bit-identical either way (asserted by `CheckpointsSpec`), only the
  * storage/recovery story changes. The conf is read per call, so a
  * session can flip modes between jobs.
  */
object Checkpoints {

  /** Runtime conf naming the reliable-checkpoint directory. Unset or
    * empty → executor-local checkpoints.
    */
  val DirConf = "spark.graft.checkpointDir"

  /** Materialize `df` with its lineage truncated, per the session's
    * [[DirConf]] setting. `SparkContext.setCheckpointDir` appends a
    * random run-scoped subdirectory, so repeated calls with the same
    * conf value reuse the already-set directory instead of minting a
    * new one per round.
    */
  def sever(df: DataFrame, eager: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(DirConf).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        this.synchronized {
          // getCheckpointDir is the qualified run subdir (scheme-prefixed,
          // uuid-suffixed) — substring match against the configured root.
          val already =
            sc.getCheckpointDir.exists(_.contains(dir.stripSuffix("/")))
          if (!already) sc.setCheckpointDir(dir)
        }
        if (eager) {
          // reliable checkpointing runs TWO jobs — the eager count and
          // the checkpoint file write — and without a persist the write
          // job recomputes the full lineage (Spark's own guidance is
          // persist-before-checkpoint). Both jobs run inside this call,
          // so the pin can be released immediately after — but ONLY a
          // pin THIS call introduced: unconditionally unpersisting
          // would silently evict a caller's own cache (r11 review).
          // Note the pin only reaches the checkpoint plan when df has
          // not already been executed un-cached — callers should pass
          // a frame whose query has not yet run, which every in-repo
          // call site does (each severs a freshly built plan).
          val introduced =
            df.storageLevel == org.apache.spark.storage.StorageLevel.NONE
          if (introduced) df.persist()
          try df.checkpoint(eager = true)
          finally if (introduced) df.unpersist()
        } else df.checkpoint(eager = false)
      case None => df.localCheckpoint(eager)
    }
  }
}
