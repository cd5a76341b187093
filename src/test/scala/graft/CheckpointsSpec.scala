package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.ops.{ConnectedComponents, Graph}

/** The reliable-checkpoint knob: `spark.graft.checkpointDir` must switch
  * every iterative op from executor-local to fault-tolerant checkpoints
  * WITHOUT changing a single result bit — the conf trades recovery story
  * for storage, never semantics.
  */
class CheckpointsSpec extends SparkSpec {
  import spark.implicits._

  private def withReliableDir[A](body: => A): A = {
    val dir = Files.createTempDirectory("graft-ckpt").toString
    spark.conf.set(Checkpoints.DirConf, dir)
    try body
    finally spark.conf.unset(Checkpoints.DirConf)
  }

  test("sever writes reliable checkpoints when the conf is set") {
    withReliableDir {
      val out = Checkpoints.sever(Seq(1L, 2L, 3L).toDF("x"))
      assert(out.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L))
      // the context now points at the configured root (uuid subdir)
      assert(spark.sparkContext.getCheckpointDir.isDefined)
    }
  }

  test("connected components: identical labels under both modes") {
    val edges = Seq((1L, 2L), (2L, 3L), (9L, 8L), (20L, 25L), (25L, 21L))
      .toDF("a", "b")
    val local = ConnectedComponents.run(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val reliable = withReliableDir {
      ConnectedComponents.run(edges, "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(reliable === local)
  }

  test("pagerank: bit-identical fixed-point scores under both modes") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 2L), (2L, 1L),
      (1L, 3L)).toDF("s", "d")
    val local = Graph.pageRank(edges, "s", "d", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val reliable = withReliableDir {
      Graph.pageRank(edges, "s", "d", iterations = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(reliable === local)
  }

  test("fan-out surrogate ids stay stable across projections (reliable mode)") {
    withReliableDir {
      val withIds = graft.etl.FanOut.withIds(
        Seq(("r1", "x"), ("r2", "y")).toDF("k", "v"), Seq("id"))
      val first = withIds.select("k", "id").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      val second = withIds.select("id", "v").collect()
        .map(r => r.getString(1) -> r.getString(0))
      // same ids observed by two independent projections
      assert(second.map { case (v, id) => id }.toSet === first.values.toSet)
    }
  }
}
