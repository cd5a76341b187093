package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Versioned snapshots with bounded retention (round 12 — the
  * "deployment-grade upgrade" the r11 verdict named): with
  * `spark.graft.indexRetainVersions = K`, a compaction's replaced
  * files fall due only once the live manifest version has advanced K
  * commits past the version that retired them, every retained
  * version's manifest survives as `_graft_manifest.v{N}`, and
  * [[Similarity.ivfOpenIndexAt]] pins any retained version exactly.
  * Default K = 0 keeps the pre-r12 single-cycle grace timing
  * bit-for-bit (Round10OpsSpec pins that path).
  */
class IndexRetentionSpec extends SparkSpec {
  import spark.implicits._

  private def writeCells(dir: String): Unit =
    Seq(
      (1L, Array(1.0f, 0.0f), 1L, 1L),
      (2L, Array(0.9f, 0.1f), 1L, 1L),
      (3L, Array(0.0f, 1.0f), 2L, 2L),
      (4L, Array(0.1f, 0.9f), 2L, 2L),
      (5L, Array(0.5f, 0.5f), 1L, 3L))
      .toDF("c_id", "c_vec", "c_norm", "c_cell")
      .repartition(col("c_cell"))
      .write.mode("overwrite").partitionBy("c_cell")
      .parquet(dir)

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("c_id").as[Long].collect().sorted.toSeq

  private def withRetain[A](k: Int)(body: => A): A = {
    val prev = spark.conf.getOption(Similarity.RetainVersionsConf)
    spark.conf.set(Similarity.RetainVersionsConf, k.toString)
    try body finally prev match {
      case Some(v) => spark.conf.set(Similarity.RetainVersionsConf, v)
      case None => spark.conf.unset(Similarity.RetainVersionsConf)
    }
  }

  test("retain=2: three successive maintenance ops leave v1, v2, v3 " +
    "all fully readable, and time travel reproduces each exactly") {
    withRetain(2) {
      val tmp = Files.createTempDirectory("graft_retention").toString
      writeCells(tmp + "/cells")
      // op 1: bootstrap v1 (pristine) + commit v2 (minus id 2)
      Similarity.ivfCompact(spark, tmp + "/cells",
        Seq(2L).toDF("t_id"), "t_id", tmp + "/s1")
      // op 2: commit v3 (minus 2 and 5 — cell 3 dies entirely)
      Similarity.ivfCompact(spark, tmp + "/cells",
        Seq(5L).toDF("t_id"), "t_id", tmp + "/s2")
      assert(ids(Similarity.ivfOpenIndexAt(spark, tmp + "/cells", 1L))
        === Seq(1L, 2L, 3L, 4L, 5L))
      assert(ids(Similarity.ivfOpenIndexAt(spark, tmp + "/cells", 2L))
        === Seq(1L, 3L, 4L, 5L))
      assert(ids(Similarity.ivfOpenIndexAt(spark, tmp + "/cells", 3L))
        === Seq(1L, 3L, 4L))
      assert(ids(Similarity.ivfOpenIndex(spark, tmp + "/cells"))
        === Seq(1L, 3L, 4L))
    }
  }

  test("a reader pinned on an old version survives MULTIPLE subsequent " +
    "maintenance ops inside the retention window — the gap the " +
    "single-cycle grace could not close") {
    withRetain(2) {
      val tmp = Files.createTempDirectory("graft_retention_pin").toString
      writeCells(tmp + "/cells")
      Similarity.ivfCompact(spark, tmp + "/cells",
        Seq(2L).toDF("t_id"), "t_id", tmp + "/s1") // v1 + v2
      // pin v2 now, BEFORE two more ops run
      val pinned = Similarity.ivfOpenIndexAt(spark, tmp + "/cells", 2L)
      Similarity.ivfCompact(spark, tmp + "/cells",
        Seq(4L).toDF("t_id"), "t_id", tmp + "/s2") // v3
      Similarity.ivfCompact(spark, tmp + "/cells",
        Seq(5L).toDF("t_id"), "t_id", tmp + "/s3") // v4
      // two whole maintenance cycles later the pinned plan still reads
      // every one of its files
      assert(ids(pinned) === Seq(1L, 3L, 4L, 5L))
    }
  }

  test("expiry still happens: outside the window the version's " +
    "manifest is pruned, open-at fails fast, and the files are " +
    "physically deleted") {
    withRetain(1) {
      val tmp = Files.createTempDirectory("graft_retention_exp").toString
      writeCells(tmp + "/cells")
      Similarity.ivfCompact(spark, tmp + "/cells",
        Seq(2L).toDF("t_id"), "t_id", tmp + "/s1") // v1 + v2
      Similarity.ivfCompact(spark, tmp + "/cells",
        Seq(4L).toDF("t_id"), "t_id", tmp + "/s2") // v3 prunes v1
      val e = intercept[IllegalArgumentException] {
        Similarity.ivfOpenIndexAt(spark, tmp + "/cells", 1L)
      }
      assert(e.getMessage.contains("not retained"))
      assert(e.getMessage.contains("2, 3"))
      // v1's replaced files (stamped at v2, retain 1 → due at v3) are
      // swept by the next op's entry replay
      Similarity.ivfCompact(spark, tmp + "/cells",
        spark.emptyDataset[Long].toDF("t_id"), "t_id", tmp + "/s3")
      val live = ids(Similarity.ivfOpenIndex(spark, tmp + "/cells"))
      assert(live === Seq(1L, 3L, 5L))
      // on disk: the live files, MINUS v1's retirees (stamped at v2,
      // due at v3 — swept by that last op's entry replay), PLUS v2's
      // retirees (stamped at v3, still inside their window)
      val rawIds = ids(spark.read.parquet(tmp + "/cells"))
      assert(!rawIds.contains(2L)) // v1 retiree: physically gone
      assert(rawIds.contains(4L)) // v2 retiree: still inside window
    }
  }

  test("a cell resurrected by appends after its full tombstoning " +
    "keeps the appended LIVE files when the dir's pending delete " +
    "falls due") {
    withRetain(0) {
      val tmp = Files.createTempDirectory("graft_retention_res").toString
      writeCells(tmp + "/cells")
      // kill cell 3 entirely → pending entry for the c_cell=3 DIRECTORY
      Similarity.ivfCompact(spark, tmp + "/cells",
        Seq(5L).toDF("t_id"), "t_id", tmp + "/s1")
      // a streaming refresh assigns a new vector to cell 3 and commits
      Similarity.withMaintenanceLock(spark, tmp + "/cells", "append") {
        Similarity.ivfAppendCells(spark, tmp + "/cells",
          Seq((9L, Array(0.5f, 0.5f), 1L, 3L))
            .toDF("c_id", "c_vec", "c_norm", "c_cell"))
      }
      // the next op replays the dir entry — the recursive delete of
      // old behavior would take the committed live file with it
      Similarity.ivfCompact(spark, tmp + "/cells",
        spark.emptyDataset[Long].toDF("t_id"), "t_id", tmp + "/s2")
      assert(ids(Similarity.ivfOpenIndex(spark, tmp + "/cells"))
        === Seq(1L, 2L, 3L, 4L, 9L))
      // the dead original row is gone from disk too
      assert(!ids(spark.read.parquet(tmp + "/cells")).contains(5L))
    }
  }

  test("a crash between manifest commit and pending write cannot " +
    "orphan retained files: the history manifest shields them from " +
    "the sweep and time travel stays whole") {
    withRetain(2) {
      val tmp = Files.createTempDirectory("graft_retention_crash").toString
      writeCells(tmp + "/cells")
      Similarity.ivfCompact(spark, tmp + "/cells",
        Seq(2L).toDF("t_id"), "t_id", tmp + "/s1") // v1 + v2
      // simulate the crash: the compaction committed v2 but died
      // before writing its pending-delete manifest
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(tmp + "/cells/_graft_pending_delete"))
      // the next op's sweepOrphanFiles must NOT treat v1's files
      // (absent from the live manifest, now absent from pending) as
      // crash garbage — .v1 still references them
      Similarity.ivfCompact(spark, tmp + "/cells",
        Seq(4L).toDF("t_id"), "t_id", tmp + "/s2") // v3
      assert(ids(Similarity.ivfOpenIndexAt(spark, tmp + "/cells", 1L))
        === Seq(1L, 2L, 3L, 4L, 5L))
      assert(ids(Similarity.ivfOpenIndexAt(spark, tmp + "/cells", 2L))
        === Seq(1L, 3L, 4L, 5L))
      assert(ids(Similarity.ivfOpenIndex(spark, tmp + "/cells"))
        === Seq(1L, 3L, 5L))
    }
  }

  test("retention RAISED between ops cannot keep a version whose files " +
    "already fell due under the smaller window: open-at fails fast, " +
    "never mid-scan (r12 ADVICE)") {
    val tmp = Files.createTempDirectory("graft_retention_raise").toString
    writeCells(tmp + "/cells")
    withRetain(1) {
      Similarity.ivfCompact(spark, tmp + "/cells",
        Seq(2L).toDF("t_id"), "t_id", tmp + "/s1") // v1 + v2; v1 retirees due at 3
    }
    withRetain(10) {
      Similarity.ivfCompact(spark, tmp + "/cells",
        Seq(4L).toDF("t_id"), "t_id", tmp + "/s2") // v3
      // this op's entry replay deletes v1's retirees (due at 3) — under
      // the old conf-at-prune-time boundary (3 - 10) the .v1 manifest
      // would have survived them and readAt(1) would die mid-scan on a
      // missing parquet file
      Similarity.ivfCompact(spark, tmp + "/cells",
        spark.emptyDataset[Long].toDF("t_id"), "t_id", tmp + "/s3")
      val e = intercept[IllegalArgumentException] {
        Similarity.ivfOpenIndexAt(spark, tmp + "/cells", 1L)
      }
      assert(e.getMessage.contains("not retained"))
      // versions whose files are intact still serve under the new conf
      assert(ids(Similarity.ivfOpenIndexAt(spark, tmp + "/cells", 2L))
        === Seq(1L, 3L, 4L, 5L))
    }
  }

  test("retention LOWERED mid-window keeps versions promised under the " +
    "larger window readable until their stamps fall due (r12 ADVICE)") {
    val tmp = Files.createTempDirectory("graft_retention_lower").toString
    writeCells(tmp + "/cells")
    withRetain(3) {
      Similarity.ivfCompact(spark, tmp + "/cells",
        Seq(2L).toDF("t_id"), "t_id", tmp + "/s1") // v1 + v2; v1 retirees due at 5
    }
    withRetain(0) {
      // appends retire nothing — they only advance the version clock
      Similarity.withMaintenanceLock(spark, tmp + "/cells", "append") {
        Similarity.ivfAppendCells(spark, tmp + "/cells",
          Seq((8L, Array(0.4f, 0.6f), 1L, 2L))
            .toDF("c_id", "c_vec", "c_norm", "c_cell")) // v3
      }
      // old behavior: the conf-at-prune-time boundary (3 - 0 = 3)
      // dropped .v1 here though its retirees sit safely inside the
      // window stamped at retirement (due at 5) — the promise made
      // under retain=3 was broken by the new conf. Now the STAMP
      // extends v1 past the window. v2 carries no retirement promise
      // (its files were never retired), so retain=0 expires it at the
      // very next commit — an OLDER version can legitimately outlive a
      // newer one when only the older one holds a frozen promise.
      assert(ids(Similarity.ivfOpenIndexAt(spark, tmp + "/cells", 1L))
        === Seq(1L, 2L, 3L, 4L, 5L))
      val e2 = intercept[IllegalArgumentException] {
        Similarity.ivfOpenIndexAt(spark, tmp + "/cells", 2L)
      }
      assert(e2.getMessage.contains("not retained"))
      // ... and the window still CLOSES on schedule: two more version
      // advances put the live version at the stamp (5) — v1 expires
      // exactly then, failing fast
      Similarity.withMaintenanceLock(spark, tmp + "/cells", "append") {
        Similarity.ivfAppendCells(spark, tmp + "/cells",
          Seq((18L, Array(0.3f, 0.7f), 1L, 2L))
            .toDF("c_id", "c_vec", "c_norm", "c_cell")) // v4
      }
      assert(ids(Similarity.ivfOpenIndexAt(spark, tmp + "/cells", 1L))
        === Seq(1L, 2L, 3L, 4L, 5L)) // due 5 > 4: still promised
      Similarity.withMaintenanceLock(spark, tmp + "/cells", "append") {
        Similarity.ivfAppendCells(spark, tmp + "/cells",
          Seq((28L, Array(0.2f, 0.8f), 1L, 2L))
            .toDF("c_id", "c_vec", "c_norm", "c_cell")) // v5
      }
      val e = intercept[IllegalArgumentException] {
        Similarity.ivfOpenIndexAt(spark, tmp + "/cells", 1L)
      }
      assert(e.getMessage.contains("not retained"))
    }
  }

  test("legacy unstamped pending entries from a pre-retention index " +
    "replay immediately under any retention setting") {
    withRetain(2) {
      val tmp = Files.createTempDirectory("graft_retention_leg").toString
      writeCells(tmp + "/cells")
      // hand-write a legacy-format pending file: a bare cell id
      java.nio.file.Files.write(
        java.nio.file.Paths.get(tmp + "/cells/_graft_pending_delete"),
        "3".getBytes("UTF-8"))
      val replayed = Similarity.replayPendingDeletes(spark, tmp + "/cells")
      assert(replayed === Seq("3"))
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(tmp + "/cells/c_cell=3")))
    }
  }
}
