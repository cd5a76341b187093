package graft

import org.apache.spark.sql.functions._

import graft.etl.VersionedTable

/** Lifecycle, crash-safety and retention-invariant pins for the
  * manifest-versioned ETL destination layer (r12-verdict item 1) — the
  * IndexRetentionSpec mold applied to [[graft.etl.VersionedTable]]:
  * commit atomicity, file-pruned rewrites, snapshot isolation, time
  * travel, orphan sweep, deferred deletes, and BOTH retention-conf-change
  * scenarios from the r12 ADVICE (raise after delete → fail fast; lower
  * mid-window → honor the promised window).
  */
class VersionedTableSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_vt").toString

  private def withRetain[A](n: String)(body: => A): A = {
    val key = VersionedTable.RetainVersionsConf
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, n)
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def base(n: Int) = spark.range(n.toLong)
    .select(col("id").as("k"), (col("id") * 10).as("v"),
      (col("id") % 3).cast("long").as("grp"))
    .repartition(4) // several data files → the pruned rewrite has pruning to do

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "v").as[(Long, Long)].collect().toSet

  test("init + read round-trips; merge replaces matched rows, keeps " +
    "unmatched, inserts new — and only touched files rewrite") {
    val dir = tmp()
    VersionedTable.init(spark, dir, base(100))
    assert(VersionedTable.currentVersion(spark, dir) === 1L)
    val v1Files = VersionedTable.readManifest(spark, dir).get._2.toSet
    val updates = Seq((5L, 999L, 0L), (200L, 111L, 1L))
      .toDF("k", "v", "grp")
    val v2 = VersionedTable.merge(spark, dir, updates, Seq("k"))
    assert(v2 === 2L)
    val got = rows(VersionedTable.read(spark, dir))
    assert(got.contains((5L, 999L)))      // updated
    assert(got.contains((200L, 111L)))    // inserted
    assert(got.contains((6L, 60L)))       // untouched
    assert(got.size === 101)
    // file pruning: the files NOT containing k=5 carried over by reference
    val v2Files = VersionedTable.readManifest(spark, dir).get._2.toSet
    assert((v1Files intersect v2Files).nonEmpty,
      "merge rewrote every file — the input_file_name pruning is dead")
  }

  test("deleteWhere removes matching rows only; NULL predicate keeps") {
    val dir = tmp()
    val df = Seq((1L, Some(10L)), (2L, None), (3L, Some(30L)))
      .toDF("k", "v").withColumn("grp", lit(0L))
    VersionedTable.init(spark, dir, df)
    VersionedTable.deleteWhere(spark, dir, col("v") > 15L)
    val got = VersionedTable.read(spark, dir)
      .select("k").as[Long].collect().toSet
    // v=30 deleted; v=10 kept; v=NULL kept (SQL DELETE semantics)
    assert(got === Set(1L, 2L))
  }

  test("replaceChildren is one atomic commit: parent's old children " +
    "gone, recomputed set in, other parents untouched") {
    val dir = tmp()
    val children = spark.range(30)
      .select((col("id") % 5).as("parent"), col("id").as("child"),
        lit(0L).as("grp"))
      .withColumnRenamed("parent", "k").withColumnRenamed("child", "v")
    VersionedTable.init(spark, dir, children)
    val recomputed = Seq((2L, 1000L, 0L), (2L, 1001L, 0L))
      .toDF("k", "v", "grp")
    VersionedTable.replaceChildren(spark, dir, recomputed, Seq("k"))
    val got = rows(VersionedTable.read(spark, dir))
    assert(got.filter(_._1 == 2L).map(_._2) === Set(1000L, 1001L))
    assert(got.count(_._1 == 3L) === 6) // sibling parent intact
  }

  test("snapshot isolation: a reader pinned before an overwrite still " +
    "scans the old version's files after the commit") {
    val dir = tmp()
    withRetain("2") {
      VersionedTable.init(spark, dir, base(50))
      // the reader's FILE LIST is resolved here, before the swap
      val pinned = VersionedTable.read(spark, dir)
      val pinnedRows = rows(pinned)
      VersionedTable.overwrite(spark, dir, base(10).withColumn("v", lit(0L)))
      // re-executing the pinned plan re-reads ITS file list post-swap:
      // deferred deletes keep those files alive inside the retention
      // window, so the snapshot is stable, not torn
      assert(rows(pinned) === pinnedRows)
      assert(rows(VersionedTable.read(spark, dir)).forall(_._2 == 0L))
    }
  }

  test("time travel: readAt(v) reproduces each committed state; expired " +
    "versions fail fast with the retained list") {
    val dir = tmp()
    withRetain("1") {
      VersionedTable.init(spark, dir, base(20))                  // v1
      VersionedTable.merge(spark, dir,
        Seq((0L, 777L, 0L)).toDF("k", "v", "grp"), Seq("k"))     // v2
      assert(rows(VersionedTable.readAt(spark, dir, 1L))
        .contains((0L, 0L)))
      assert(rows(VersionedTable.readAt(spark, dir, 2L))
        .contains((0L, 777L)))
      VersionedTable.merge(spark, dir,
        Seq((1L, 888L, 1L)).toDF("k", "v", "grp"), Seq("k"))     // v3
      VersionedTable.merge(spark, dir,
        Seq((2L, 999L, 2L)).toDF("k", "v", "grp"), Seq("k"))     // v4
      VersionedTable.vacuum(spark, dir)
      // v1's touched file fell due and was deleted → v1 must be GONE
      // from the retained list, not a mid-scan missing-parquet error
      val ex = intercept[IllegalArgumentException] {
        VersionedTable.readAt(spark, dir, 1L)
      }
      assert(ex.getMessage.contains("not retained"))
      // the window itself still serves
      assert(rows(VersionedTable.readAt(spark, dir, 4L))
        .contains((2L, 999L)))
    }
  }

  test("crash safety: files written without a commit are invisible to " +
    "readers, ignored by mutations, and collected by vacuum") {
    val dir = tmp()
    VersionedTable.init(spark, dir, base(10))
    val before = VersionedTable.read(spark, dir).count()
    // simulate a writer dying between data write and manifest commit
    base(5).withColumn("v", lit(-1L)).write.mode("append")
      .parquet(dir + "/cm99-deadbeef")
    assert(VersionedTable.read(spark, dir).count() === before,
      "uncommitted files leaked into the live read")
    VersionedTable.append(spark, dir, Seq((500L, 1L, 0L))
      .toDF("k", "v", "grp"))
    // mutations no longer walk the table (O(commit) discipline): the
    // orphans are still on disk but never surface in a read
    assert(VersionedTable.read(spark, dir).count() === before + 1)
    assert(VersionedTable.read(spark, dir)
      .filter(col("v") === -1L).isEmpty)
    // the scheduled vacuum owns the full-walk sweep
    VersionedTable.vacuum(spark, dir)
    val dead = java.nio.file.Paths.get(dir, "cm99-deadbeef")
    val leftover =
      if (!java.nio.file.Files.exists(dead)) Nil
      else {
        val s = java.nio.file.Files.walk(dead)
        try s.filter(java.nio.file.Files.isRegularFile(_))
          .map[String](_.getFileName.toString)
          .filter(n => !n.startsWith("_") && !n.startsWith("."))
          .toArray.toList
        finally s.close()
      }
    assert(leftover.isEmpty, s"vacuum left the dead writer's files: $leftover")
    assert(VersionedTable.read(spark, dir).count() === before + 1)
  }

  test("O(commit) appends: a commit's new files land in its own " +
    "subdirectory, and mutations never touch foreign files") {
    val dir = tmp()
    VersionedTable.init(spark, dir, base(10))
    val v1Files = VersionedTable.readManifest(spark, dir).get._2.toSet
    VersionedTable.append(spark, dir,
      Seq((500L, 1L, 0L)).toDF("k", "v", "grp"))
    val v2Files = VersionedTable.readManifest(spark, dir).get._2.toSet
    val fresh = v2Files -- v1Files
    assert(fresh.nonEmpty)
    // each commit's files live in data/ under a cm<version>-<uuid>
    // filename prefix — written via the commit's own staging dir, so
    // discovery listed only that staging dir, never the table
    val prefixes = fresh.map(_.split("/").last.split("-").take(2)
      .mkString("-"))
    assert(fresh.forall(_.startsWith("data/")) && prefixes.size === 1 &&
      prefixes.head.startsWith("cm2-"),
      s"append's files not commit-isolated: $fresh")
    // carry-over is by reference — v1's files untouched on disk
    v1Files.foreach { f =>
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(dir, f)))
    }
    // a foreign (non-graft) file planted at the root survives every
    // mutation — proof no mutation runs a full-listing sweep
    val foreign = java.nio.file.Paths.get(dir, "keepme.dat")
    java.nio.file.Files.write(foreign, "hands off".getBytes)
    VersionedTable.merge(spark, dir,
      Seq((0L, 9L, 0L)).toDF("k", "v", "grp"), Seq("k"))
    VersionedTable.deleteWhere(spark, dir, col("k") === 1L)
    assert(java.nio.file.Files.exists(foreign),
      "a mutation swept a file it never wrote")
    java.nio.file.Files.delete(foreign)
  }

  test("commit latency is flat in table file count (the O(commit) " +
    "ladder): a 1-row append costs the same against 40 and 4000 files") {
    // adopt() a directory of N pre-made files (content never read —
    // appends carry foreign files by reference), then time appends.
    val seedDir = tmp()
    Seq((0L, 0L, 0L)).toDF("k", "v", "grp").coalesce(1)
      .write.mode("overwrite").parquet(seedDir)
    val seedBytes = {
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(seedDir))
      val f = try s.filter(_.getFileName.toString.endsWith(".parquet"))
        .findFirst().get()
      finally s.close()
      java.nio.file.Files.readAllBytes(f)
    }
    def mkTable(n: Int): String = {
      val dir = tmp()
      val sub = java.nio.file.Paths.get(dir, "seed")
      java.nio.file.Files.createDirectories(sub)
      (0 until n).foreach { i =>
        java.nio.file.Files.write(sub.resolve(f"f$i%05d.parquet"), seedBytes)
      }
      VersionedTable.adopt(spark, dir)
      dir
    }
    def appendNanos(dir: String): Long = {
      val row = Seq((999999L, 1L, 0L)).toDF("k", "v", "grp")
      val t0 = System.nanoTime()
      VersionedTable.append(spark, dir, row)
      System.nanoTime() - t0
    }
    val small = mkTable(40)
    val big = mkTable(4000)
    appendNanos(small) // warm both paths once
    appendNanos(big)
    val tSmall = (0 until 3).map(_ => appendNanos(small)).min
    val tBig = (0 until 3).map(_ => appendNanos(big)).min
    assert(VersionedTable.readManifest(spark, big).get._2.size >= 4000)
    // flat means flat: 100x the files must not cost even 3x the time
    // (pre-r14, the double full listing made this ratio ~O(n))
    assert(tBig < tSmall * 3 + 100000000L,
      s"append not O(commit): 40 files -> ${tSmall / 1000000} ms, " +
        s"4000 files -> ${tBig / 1000000} ms")
  }

  test("ADVICE scenario A — retention RAISED after data left: the " +
    "expired version fails fast instead of resurrecting a hole-y scan") {
    val dir = tmp()
    withRetain("0") {
      VersionedTable.init(spark, dir, base(20))                  // v1
      VersionedTable.overwrite(spark, dir, base(5))              // v2
      VersionedTable.overwrite(spark, dir, base(3))              // v3 (v1 files due)
      VersionedTable.vacuum(spark, dir)
    }
    withRetain("5") {
      // raising the conf must NOT bring back v1: its files are gone
      val ex = intercept[IllegalArgumentException] {
        VersionedTable.readAt(spark, dir, 1L)
      }
      assert(ex.getMessage.contains("not retained"))
      // and new commits under the bigger window work normally
      VersionedTable.append(spark, dir,
        Seq((99L, 99L, 0L)).toDF("k", "v", "grp"))
      assert(VersionedTable.readAt(spark, dir, 3L).count() === 3)
    }
  }

  test("ADVICE scenario B — retention LOWERED mid-window: versions " +
    "promised under the larger window stay readable until their stamps " +
    "fall due") {
    val dir = tmp()
    withRetain("3") {
      VersionedTable.init(spark, dir, base(20))                  // v1
      VersionedTable.overwrite(spark, dir, base(10))             // v2: v1 due at 2+3=5
    }
    withRetain("0") {
      // one more commit under the smaller conf — v1's files are NOT yet
      // due (stamped under retain=3), so v1 must still time-travel
      VersionedTable.append(spark, dir,
        Seq((77L, 77L, 0L)).toDF("k", "v", "grp"))               // v3
      assert(VersionedTable.readAt(spark, dir, 1L).count() === 20)
      // advance past the PROMISED window: v4, v5 → stamps (due 5) fall due
      VersionedTable.append(spark, dir,
        Seq((78L, 78L, 0L)).toDF("k", "v", "grp"))               // v4
      VersionedTable.append(spark, dir,
        Seq((79L, 79L, 0L)).toDF("k", "v", "grp"))               // v5
      VersionedTable.vacuum(spark, dir)
      val ex = intercept[IllegalArgumentException] {
        VersionedTable.readAt(spark, dir, 1L)
      }
      assert(ex.getMessage.contains("not retained"))
    }
  }

  test("adopt snapshots an existing plain directory as v1 without " +
    "rewriting; subsequent merges version it") {
    val dir = tmp()
    base(12).write.mode("overwrite").parquet(dir)
    assert(VersionedTable.adopt(spark, dir) === 1L)
    assert(rows(VersionedTable.read(spark, dir)).size === 12)
    VersionedTable.merge(spark, dir,
      Seq((0L, 42L, 0L)).toDF("k", "v", "grp"), Seq("k"))
    assert(rows(VersionedTable.read(spark, dir)).contains((0L, 42L)))
    assert(rows(VersionedTable.readAt(spark, dir, 1L)).contains((0L, 0L)))
  }

  test("partitioned table: layout survives every rewrite, and a " +
    "partition-predicate delete touches ONLY that partition's files") {
    val dir = tmp()
    val df = base(60).withColumn("grp", col("k") % 3)
    VersionedTable.init(spark, dir, df, partitionBy = Seq("grp"))
    assert(VersionedTable.partitioning(spark, dir) === Seq("grp"))
    // Hive dirs nest INSIDE the per-commit subdirectory since r14:
    // cm1-xxxx/grp=0/part-...parquet
    def partOf(f: String) =
      f.split("/").find(_.startsWith("grp=")).getOrElse("")
    val v1Files = VersionedTable.readManifest(spark, dir).get._2
    assert(v1Files.forall(f => partOf(f).startsWith("grp=")),
      v1Files.take(3).toString)
    VersionedTable.deleteWhere(spark, dir, col("grp") === 1L)
    val v2Files = VersionedTable.readManifest(spark, dir).get._2
    // grp=0 and grp=2 files carried over BY REFERENCE (byte-identical
    // paths); every grp=1 file retired; nothing rewritten outside it
    val untouched = v1Files.filterNot(f => partOf(f) == "grp=1")
    assert(untouched.forall(v2Files.contains),
      "a partition outside the predicate was rewritten")
    assert(!v2Files.exists(f => partOf(f) == "grp=1"))
    val got = VersionedTable.read(spark, dir)
    assert(got.filter(col("grp") === 1L).isEmpty)
    assert(got.count() === 40)
    // a merge that MOVES a row across partitions lands it in the new dir
    VersionedTable.merge(spark, dir,
      Seq((0L, 5L, 2L)).toDF("k", "v", "grp"), Seq("k"))
    val after = VersionedTable.read(spark, dir)
      .filter(col("k") === 0L).select("v", "grp")
      .as[(Long, Long)].collect().toSeq
    assert(after === Seq((5L, 2L)))
  }

  test("compact folds the live set into fewer files as a versioned " +
    "commit: content identical, old version still time-travels") {
    val dir = tmp()
    withRetain("2") {
      VersionedTable.init(spark, dir, base(50))
      VersionedTable.append(spark, dir, base(50)
        .withColumn("k", col("k") + 100L))
      val beforeFiles = VersionedTable.readManifest(spark, dir).get._2.size
      val beforeRows = rows(VersionedTable.read(spark, dir))
      val v = VersionedTable.compact(spark, dir, targetFiles = 1)
      assert(v === 3L)
      val afterFiles = VersionedTable.readManifest(spark, dir).get._2.size
      assert(afterFiles < beforeFiles && afterFiles <= 1)
      assert(rows(VersionedTable.read(spark, dir)) === beforeRows)
      // pre-compaction version stays readable inside the window
      assert(rows(VersionedTable.readAt(spark, dir, 2L)) === beforeRows)
      // compacting an already-compact table is a version-stable no-op
      assert(VersionedTable.compact(spark, dir, targetFiles = 1) === 3L)
    }
  }

  test("appendStreamBatch is exactly-once: a replayed batch id is a " +
    "no-op, and the epoch survives an interleaved compaction") {
    val dir = tmp()
    VersionedTable.init(spark, dir, base(10))
    val b0 = Seq((100L, 1L, 0L)).toDF("k", "v", "grp")
    VersionedTable.appendStreamBatch(spark, dir, b0, batchId = 0L)
    assert(VersionedTable.lastStreamEpoch(spark, dir) === 0L)
    // the at-least-once replay: same id, same (or different) data
    VersionedTable.appendStreamBatch(spark, dir, b0, batchId = 0L)
    assert(VersionedTable.read(spark, dir)
      .filter(col("k") === 100L).count() === 1, "replayed batch double-applied")
    // a compaction BETWEEN batches must carry the epoch forward
    VersionedTable.compact(spark, dir, targetFiles = 1)
    assert(VersionedTable.lastStreamEpoch(spark, dir) === 0L)
    VersionedTable.appendStreamBatch(spark, dir,
      Seq((101L, 2L, 0L)).toDF("k", "v", "grp"), batchId = 1L)
    assert(VersionedTable.read(spark, dir).count() === 12)
  }

  test("mergeStreamBatch: idempotent upsert per micro-batch") {
    val dir = tmp()
    VersionedTable.init(spark, dir, base(10))
    val b = Seq((3L, 999L, 0L), (200L, 1L, 2L)).toDF("k", "v", "grp")
    VersionedTable.mergeStreamBatch(spark, dir, b, Seq("k"), batchId = 0L)
    VersionedTable.mergeStreamBatch(spark, dir, b, Seq("k"), batchId = 0L)
    val got = rows(VersionedTable.read(spark, dir))
    assert(got.contains((3L, 999L)))     // updated once
    assert(got.count(_._1 == 200L) === 1) // inserted once
    assert(got.size === 11)
  }

  test("a table deleted down to zero rows stays readable as empty — " +
    "even after its last data files physically leave the disk") {
    val dir = tmp()
    withRetain("0") {
      VersionedTable.init(spark, dir, base(10))
      VersionedTable.deleteWhere(spark, dir, lit(true))      // v2: empty
      assert(VersionedTable.read(spark, dir).count() === 0)
      VersionedTable.append(spark, dir, base(0))             // v3
      VersionedTable.vacuum(spark, dir) // v1's files fall due and GO
      // the _vt_schema sidecar serves the shape: no footers remain
      val got = VersionedTable.read(spark, dir)
      assert(got.count() === 0)
      assert(got.columns.toSeq === Seq("k", "v", "grp"))
    }
  }

  test("a phantom history manifest (crashed commit that never flipped " +
    "live) is excluded from versions()/readAt and pruned by the next " +
    "mutation") {
    val dir = tmp()
    VersionedTable.init(spark, dir, base(10))
    // simulate the crash: a .v99 history copy exists, live stays at v1
    val manifest = java.nio.file.Paths.get(dir, "_vt_manifest")
    val phantom = java.nio.file.Paths.get(dir, "_vt_manifest.v99")
    java.nio.file.Files.copy(manifest, phantom)
    assert(VersionedTable.versions(spark, dir) === Seq(1L))
    val e = intercept[IllegalArgumentException] {
      VersionedTable.readAt(spark, dir, 99L)
    }
    assert(e.getMessage.contains("not retained"))
    VersionedTable.append(spark, dir, Seq((50L, 1L, 0L))
      .toDF("k", "v", "grp")) // v2: prune collects the phantom
    assert(!java.nio.file.Files.exists(phantom))
    assert(VersionedTable.read(spark, dir).count() === 11)
  }

  test("a lost live pointer (crash inside the swap window) is recovered " +
    "from the highest history manifest — the table never reads as " +
    "uninitialized") {
    val dir = tmp()
    VersionedTable.init(spark, dir, base(10))
    VersionedTable.append(spark, dir, Seq((50L, 1L, 0L))
      .toDF("k", "v", "grp")) // v2
    java.nio.file.Files.delete(java.nio.file.Paths.get(dir, "_vt_manifest"))
    // reader recovers v2 (the highest .vN is byte-identical to the lost
    // pointer), and the next mutation re-publishes a live pointer
    assert(VersionedTable.currentVersion(spark, dir) === 2L)
    assert(VersionedTable.read(spark, dir).count() === 11)
    VersionedTable.append(spark, dir, Seq((51L, 1L, 0L))
      .toDF("k", "v", "grp")) // v3 heals the pointer
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "_vt_manifest")))
    assert(VersionedTable.read(spark, dir).count() === 12)
  }

  test("append-only history stays bounded by the retention window " +
    "(no retirements ≠ keep every version forever)") {
    val dir = tmp()
    withRetain("2") {
      VersionedTable.init(spark, dir, base(5))
      (1 to 6).foreach { i =>
        VersionedTable.append(spark, dir,
          Seq((100L + i, i.toLong, 0L)).toDF("k", "v", "grp"))
      }
      // live v7; window keeps v5..v7 → at most retain+1 manifests
      val vs = VersionedTable.versions(spark, dir)
      assert(vs.max === 7L)
      assert(vs.size <= 3, s"history unbounded: $vs")
      assert(vs === Seq(5L, 6L, 7L))
    }
  }

  test("changesBetween: insert/delete/update images from the manifest " +
    "diff; rewrite survivors that merely moved files produce NO change") {
    val dir = tmp()
    withRetain("3") {
      VersionedTable.init(spark, dir, base(30))                    // v1
      VersionedTable.merge(spark, dir,
        Seq((5L, 999L, 0L), (100L, 1L, 1L)).toDF("k", "v", "grp"),
        Seq("k"))                                                  // v2
      VersionedTable.deleteWhere(spark, dir, col("k") === 7L)      // v3
      val ch = VersionedTable.changesBetween(spark, dir, 1L, 3L, Seq("k"))
        .select("k", "v", "_change_type")
        .as[(Long, Long, String)].collect().toSet
      assert(ch === Set(
        (100L, 1L, "insert"),
        (7L, 70L, "delete"),
        (5L, 50L, "update_preimage"),
        (5L, 999L, "update_postimage")),
        s"unexpected change set: $ch")
      // survivors of the rewritten files (every other k in 5's and 7's
      // files) moved files but did not change — the value compare
      // filtered them; nothing else leaks into the feed (asserted by
      // the exact-set equality above). Adjacent-version feeds compose:
      val ch12 = VersionedTable.changesBetween(spark, dir, 1L, 2L, Seq("k"))
      assert(ch12.filter(col("_change_type") === "delete").isEmpty)
      assert(ch12.filter(col("_change_type") === "insert").count() === 1)
    }
  }

  test("data skipping: a point merge against a key-clustered table " +
    "probes ONLY range-overlapping files — every out-of-range file is " +
    "corrupted first, so a single stray read would throw") {
    val dir = tmp()
    val df = spark.range(0L, 1000L).select(col("id").as("k"),
      (col("id") * 10).as("v"), (col("id") % 3).as("grp"))
      .repartitionByRange(10, col("k"))
    VersionedTable.init(spark, dir, df)
    val v1Files = VersionedTable.readManifest(spark, dir).get._2
    assert(v1Files.size >= 8, s"want ~10 range files, got $v1Files")
    val holdsKey = v1Files.filter { f =>
      spark.read.parquet(dir + "/" + f)
        .filter(col("k") === 5L).count() > 0
    }.toSet
    assert(holdsKey.size === 1)
    // tripwire: every file that cannot contain k=5 becomes unreadable
    v1Files.filterNot(holdsKey).foreach { f =>
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, f),
        Array[Byte](1, 2, 3))
    }
    // pre-r14 the probe scanned ALL live files and this merge threw;
    // with manifest stats the probe opens only the overlapping file
    val v = VersionedTable.merge(spark, dir,
      Seq((5L, 999L, 2L)).toDF("k", "v", "grp"), Seq("k"))
    assert(v === 2L)
    val v2Files = VersionedTable.readManifest(spark, dir).get._2
    val fresh = v2Files.filterNot(v1Files.toSet)
    assert(fresh.nonEmpty)
    val freshDf = spark.read.parquet(fresh.map(dir + "/" + _): _*)
    assert(freshDf.filter(col("k") === 5L && col("v") === 999L)
      .count() === 1)
    // the never-touched (corrupted) files carried over by reference
    assert(v1Files.filterNot(holdsKey).forall(v2Files.contains))
  }

  test("clusterBy compaction turns skipping ON for an unclustered " +
    "table: after the OPTIMIZE-style rewrite a point merge probes only " +
    "the owning file (corrupt tripwire on every other file)") {
    val dir = tmp()
    // hash-spread init: every file spans the whole key domain, so
    // stats alone can prune nothing
    VersionedTable.init(spark, dir, base(400).repartition(8))
    val v = VersionedTable.compact(spark, dir, targetFiles = 8,
      clusterBy = Seq("k"))
    assert(v === 2L, "clusterBy request must rewrite even at target")
    val files = VersionedTable.readManifest(spark, dir).get._2
    assert(files.size >= 4)
    val holdsKey = files.filter { f =>
      spark.read.parquet(dir + "/" + f)
        .filter(col("k") === 5L).count() > 0
    }.toSet
    assert(holdsKey.size === 1, "clustered files must own disjoint ranges")
    files.filterNot(holdsKey).foreach { f =>
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, f),
        Array[Byte](9, 9, 9))
    }
    VersionedTable.merge(spark, dir,
      Seq((5L, 777L, 0L)).toDF("k", "v", "grp"), Seq("k"))
    val fresh = VersionedTable.readManifest(spark, dir).get._2
      .filterNot(files.toSet)
    assert(spark.read.parquet(fresh.map(dir + "/" + _): _*)
      .filter(col("k") === 5L && col("v") === 777L).count() === 1)
  }

  test("data skipping changes no results: stats-on and stats-off " +
    "tables agree after the same merge; all-null source keys probe " +
    "nothing and insert cleanly") {
    def build(statsOn: Boolean): Set[(Long, Long)] = {
      val key = VersionedTable.FileStatsConf
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, statsOn.toString)
      try {
        val dir = tmp()
        VersionedTable.init(spark, dir, base(200))
        VersionedTable.merge(spark, dir,
          Seq((7L, 700L, 1L), (500L, 1L, 2L)).toDF("k", "v", "grp"),
          Seq("k"))
        rows(VersionedTable.read(spark, dir))
      } finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
    assert(build(statsOn = true) === build(statsOn = false))
    // all-null keys: the stats fast-path concludes no file can match
    val dir = tmp()
    VersionedTable.init(spark, dir, base(50))
    val nullKeys = Seq((Option.empty[Long], 1L, 0L))
      .toDF("k", "v", "grp")
    VersionedTable.merge(spark, dir, nullKeys, Seq("k"))
    val got = VersionedTable.read(spark, dir)
    assert(got.count() === 51)
    assert(got.filter(col("k").isNull).count() === 1)
  }

  test("stream epochs are scoped per stream identity: a second stream's " +
    "batch 0 is NOT a replay, replay within an identity still skips, " +
    "and a compaction carries every identity's mark forward") {
    val dir = tmp()
    VersionedTable.init(spark, dir, base(5))
    VersionedTable.appendStreamBatch(spark, dir,
      Seq((100L, 1L, 0L)).toDF("k", "v", "grp"), 0L, streamId = "a")
    // same batch id, DIFFERENT identity — must land (the r13 ADVICE
    // scenario: a single global epoch dropped it silently)
    VersionedTable.appendStreamBatch(spark, dir,
      Seq((200L, 2L, 0L)).toDF("k", "v", "grp"), 0L, streamId = "b")
    assert(VersionedTable.read(spark, dir).count() === 7)
    VersionedTable.appendStreamBatch(spark, dir,
      Seq((100L, 1L, 0L)).toDF("k", "v", "grp"), 0L, streamId = "a")
    assert(VersionedTable.read(spark, dir).count() === 7,
      "replay within an identity double-applied")
    VersionedTable.compact(spark, dir, targetFiles = 1)
    assert(VersionedTable.lastStreamEpoch(spark, dir, "a") === 0L)
    assert(VersionedTable.lastStreamEpoch(spark, dir, "b") === 0L)
    assert(VersionedTable.lastStreamEpoch(spark, dir, "never") === -1L)
    VersionedTable.appendStreamBatch(spark, dir,
      Seq((300L, 3L, 0L)).toDF("k", "v", "grp"), 1L, streamId = "a")
    assert(VersionedTable.read(spark, dir).count() === 8)
  }

  test("schema evolution: mergeSchema widens the table, pre-evolution " +
    "rows read NULL, readAt keeps the old shape, strict mode fails fast") {
    val dir = tmp()
    VersionedTable.init(spark, dir, base(10))                        // v1
    val src = Seq((3L, 999L, 0L, "x"), (100L, 1L, 1L, "y"))
      .toDF("k", "v", "grp", "tag")
    val e = intercept[IllegalArgumentException] {
      VersionedTable.merge(spark, dir, src, Seq("k"))
    }
    assert(e.getMessage.contains("mergeSchema"))
    VersionedTable.merge(spark, dir, src, Seq("k"),
      mergeSchema = true)                                            // v2
    val live = VersionedTable.read(spark, dir)
    assert(live.columns.toSeq === Seq("k", "v", "grp", "tag"))
    val byK = live.select("k", "tag").as[(Long, Option[String])]
      .collect().toMap
    assert(byK(3L) === Some("x") && byK(100L) === Some("y"))
    assert(byK(5L) === None,
      "pre-evolution row (carried over by reference) must read NULL")
    assert(VersionedTable.readAt(spark, dir, 1L).columns.toSeq ===
      Seq("k", "v", "grp"), "time travel must keep the old shape")
    // the widened shape persists through schema-neutral commits
    VersionedTable.deleteWhere(spark, dir, col("k") === 4L)          // v3
    assert(VersionedTable.read(spark, dir).columns.toSeq ===
      Seq("k", "v", "grp", "tag"))
    // CDF across the evolution reads both sides under the NEW shape
    val ch = VersionedTable.changesBetween(spark, dir, 1L, 2L, Seq("k"))
    assert(ch.columns.contains("tag"))
    assert(ch.filter(col("_change_type") === "insert")
      .select("tag").as[Option[String]].collect().toSeq === Seq(Some("y")))
  }

  test("restore re-references a retained version as a NEW commit " +
    "(no data copied); stream replay protection survives the rollback") {
    val dir = tmp()
    withRetain("3") {
      VersionedTable.init(spark, dir, base(20))                      // v1
      VersionedTable.appendStreamBatch(spark, dir,
        Seq((100L, 1L, 0L)).toDF("k", "v", "grp"), 0L, streamId = "s") // v2
      VersionedTable.deleteWhere(spark, dir, col("k") < 5L)          // v3
      val v1Rows = rows(VersionedTable.readAt(spark, dir, 1L))
      assert(VersionedTable.restore(spark, dir, 1L) === 4L)          // v4
      assert(rows(VersionedTable.read(spark, dir)) === v1Rows)
      // pure metadata: v4's file list is exactly v1's
      val v1Files = scala.io.Source.fromFile(
        new java.io.File(dir, "_vt_manifest.v1")).getLines()
        .drop(1).filterNot(_.startsWith("#")).toSet
      assert(VersionedTable.readManifest(spark, dir).get._2.toSet ===
        v1Files)
      // restore-to-live is a version-stable no-op
      assert(VersionedTable.restore(spark, dir, 4L) === 4L)
      // epoch marks carried: the rolled-back batch is still "seen"
      VersionedTable.appendStreamBatch(spark, dir,
        Seq((100L, 1L, 0L)).toDF("k", "v", "grp"), 0L, streamId = "s")
      assert(rows(VersionedTable.read(spark, dir)) === v1Rows)
      // history in between stayed auditable
      assert(rows(VersionedTable.readAt(spark, dir, 3L))
        .forall(_._1 >= 5L))
    }
  }

  test("concurrent mutators serialize under the lock: parallel merges " +
    "all land, version count equals mutation count") {
    val dir = tmp()
    VersionedTable.init(spark, dir, base(40))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futs = (0 until 4).map { i =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = VersionedTable.merge(spark, dir,
            Seq((i.toLong, 1000L + i, 0L)).toDF("k", "v", "grp"), Seq("k"))
        })
      }
      val versionsGot = futs.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
      assert(versionsGot.toSet === Set(2L, 3L, 4L, 5L))
      val got = rows(VersionedTable.read(spark, dir))
      (0 until 4).foreach(i => assert(got.contains((i.toLong, 1000L + i))))
      assert(got.size === 40)
    } finally pool.shutdownNow()
  }
}
