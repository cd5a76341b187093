package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Reader snapshot isolation for the served ANN index (r11-verdict
  * item 4): mutators swap by committing `_graft_manifest` atomically
  * and DEFER deleting replaced files one maintenance cycle, so a
  * reader that pinned the index before a swap keeps a consistent view
  * — no duplicate ids, no missing ids — even though the compaction
  * completed underneath it. The raw directory listing, by contrast,
  * shows old+new files together in that window: exactly the mid-swap
  * hazard the manifest removes.
  */
class IndexSnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def writeCells(dir: String): Unit =
    Seq(
      (1L, Array(1.0f, 0.0f), 1L, 1L),
      (2L, Array(0.9f, 0.1f), 1L, 1L),
      (3L, Array(0.0f, 1.0f), 2L, 2L),
      (4L, Array(0.1f, 0.9f), 2L, 2L))
      .toDF("c_id", "c_vec", "c_norm", "c_cell")
      .repartition(col("c_cell"))
      .write.mode("overwrite").partitionBy("c_cell")
      .parquet(dir)

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("c_id").as[Long].collect().sorted.toSeq

  test("a reader pinned before a compaction keeps its snapshot across " +
    "the whole swap: no duplicate and no missing ids") {
    val tmp = Files.createTempDirectory("graft_snapshot_spec").toString
    writeCells(tmp + "/cells")
    // enter manifest mode (a no-op fold bootstraps version 1)
    assert(Similarity.ivfCompact(spark, tmp + "/cells",
      Seq(999L).toDF("t_id"), "t_id", tmp + "/stage0").isEmpty)
    // reader pins the pre-swap snapshot, then an ENTIRE compaction
    // (stage, append, manifest commit) runs before it materializes —
    // the file-listing race window, stretched to its worst case
    val pinned = Similarity.ivfOpenIndex(spark, tmp + "/cells")
    Similarity.ivfCompact(spark, tmp + "/cells",
      Seq(2L, 3L).toDF("t_id"), "t_id", tmp + "/stage")
    assert(ids(pinned) === Seq(1L, 2L, 3L, 4L)) // snapshot intact
    // the hazard the manifest removes: a raw listing-based read in
    // this window sees replaced and replacement files TOGETHER
    assert(ids(spark.read.parquet(tmp + "/cells")) !== Seq(1L, 4L))
    // a fresh open serves exactly the post-swap live set
    assert(ids(Similarity.ivfOpenIndex(spark, tmp + "/cells"))
      === Seq(1L, 4L))
  }

  test("a pinned reader excludes a later manifest-committed append; a " +
    "fresh open includes it") {
    val tmp = Files.createTempDirectory("graft_snapshot_append").toString
    writeCells(tmp + "/cells")
    assert(Similarity.ivfCompact(spark, tmp + "/cells",
      Seq(999L).toDF("t_id"), "t_id", tmp + "/stage0").isEmpty)
    val pinned = Similarity.ivfOpenIndex(spark, tmp + "/cells")
    Similarity.withMaintenanceLock(spark, tmp + "/cells", "refresh") {
      Similarity.ivfAppendCells(spark, tmp + "/cells",
        Seq((5L, Array(0.8f, 0.2f), 1L, 1L))
          .toDF("c_id", "c_vec", "c_norm", "c_cell"))
    }
    assert(ids(pinned) === Seq(1L, 2L, 3L, 4L))
    assert(ids(Similarity.ivfOpenIndex(spark, tmp + "/cells"))
      === Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("uncommitted crash garbage is invisible to manifest readers and " +
    "swept by the next maintenance op") {
    val tmp = Files.createTempDirectory("graft_snapshot_orphan").toString
    writeCells(tmp + "/cells")
    assert(Similarity.ivfCompact(spark, tmp + "/cells",
      Seq(999L).toDF("t_id"), "t_id", tmp + "/stage0").isEmpty)
    // simulate a mutator that died between writing a file and its
    // manifest commit: duplicate an existing cell file under a name
    // the manifest does not reference
    val cellDir = Paths.get(tmp + "/cells/c_cell=1")
    val dataFile = Files.list(cellDir)
      .filter(p => !p.getFileName.toString.startsWith("_") &&
        !p.getFileName.toString.startsWith("."))
      .findFirst().get()
    val orphan = cellDir.resolve("part-orphan-crash.parquet")
    Files.copy(dataFile, orphan)
    // invisible to every manifest read (no duplicated ids)...
    assert(ids(Similarity.ivfOpenIndex(spark, tmp + "/cells"))
      === Seq(1L, 2L, 3L, 4L))
    // ...and physically swept when the next locked op runs
    assert(Similarity.ivfCompact(spark, tmp + "/cells",
      Seq(998L).toDF("t_id"), "t_id", tmp + "/stage1").isEmpty)
    assert(!Files.exists(orphan))
    assert(ids(spark.read.parquet(tmp + "/cells"))
      === Seq(1L, 2L, 3L, 4L))
  }
}
