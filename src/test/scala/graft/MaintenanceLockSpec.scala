package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** The ANN index maintenance-serialization protocol (r10-verdict item 1):
  * mutual exclusion between the streaming refresh's appends and the
  * compaction's staged swap, lease-steal of a crashed holder's lock,
  * and the pending-delete manifest that makes the compaction's
  * swap+delete pair atomic-on-restart (r10 ADVICE: a driver dying
  * between the dynamic overwrite and the fully-dead directory deletes
  * resurrected every deleted row).
  */
class MaintenanceLockSpec extends SparkSpec {
  import spark.implicits._

  test("withMaintenanceLock serializes concurrent mutators — no two " +
    "bodies overlap") {
    val dir = Files.createTempDirectory("graft_lock_spec").toString
    val inSection = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxSeen = new java.util.concurrent.atomic.AtomicInteger(0)
    val done = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 4).map { i =>
      new Thread(() => {
        Similarity.withMaintenanceLock(spark, dir, s"t$i",
          timeoutMs = 30000L) {
          val now = inSection.incrementAndGet()
          maxSeen.getAndUpdate(m => math.max(m, now))
          Thread.sleep(30)
          inSection.decrementAndGet()
        }
        done.incrementAndGet()
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(60000))
    assert(done.get === 4)
    assert(maxSeen.get === 1) // never two holders at once
    // lock released after the last holder
    assert(!Files.exists(Paths.get(dir, "_graft_maint_lock")))
  }

  test("a crashed holder's lock is stolen after its lease expires; a " +
    "live one blocks until timeout") {
    val dir = Files.createTempDirectory("graft_lock_lease").toString
    val lock = Paths.get(dir, "_graft_maint_lock")
    Files.writeString(lock, "dead-driver 0")
    // a lease in the past: acquisition steals it and proceeds
    Files.setLastModifiedTime(lock,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 60000))
    var ran = false
    Similarity.withMaintenanceLock(spark, dir, "steal", leaseMs = 1000L,
      timeoutMs = 5000L) { ran = true }
    assert(ran)
    assert(!Files.exists(lock))
    // a lease still live: acquisition must NOT steal, and times out
    Files.writeString(lock, "live-driver")
    intercept[IllegalStateException] {
      Similarity.withMaintenanceLock(spark, dir, "blocked",
        leaseMs = 600000L, timeoutMs = 300L) { fail("must not enter") }
    }
    Files.delete(lock)
  }

  test("replayPendingDeletes finishes a crashed compaction's directory " +
    "deletes, and ivfCompact replays it on entry") {
    val tmp = Files.createTempDirectory("graft_replay_spec").toString
    val cells = Seq(
      (1L, Array(1.0f, 0.0f), 1L, 1L),
      (2L, Array(0.9f, 0.1f), 1L, 1L),
      (3L, Array(0.0f, 1.0f), 2L, 2L),
      (4L, Array(0.1f, 0.9f), 2L, 2L))
      .toDF("c_id", "c_vec", "c_norm", "c_cell")
    cells.repartition(col("c_cell"))
      .write.mode("overwrite").partitionBy("c_cell")
      .parquet(tmp + "/cells")
    // simulate the crash window: cell 2 was fully tombstoned, the
    // manifest was persisted, the overwrite ran, the driver died
    // before deleting the directory — its rows would resurrect
    Files.writeString(Paths.get(tmp + "/cells/_graft_pending_delete"),
      "2")
    // the serving OPEN path replays the manifest before loading
    val opened = Similarity.ivfOpenIndex(spark, tmp + "/cells")
    assert(!Files.exists(Paths.get(tmp + "/cells/c_cell=2")))
    assert(!Files.exists(Paths.get(tmp + "/cells/_graft_pending_delete")))
    assert(opened.select("c_id").as[Long].collect().toSet === Set(1L, 2L))
    // replay is idempotent when there is nothing pending
    assert(Similarity.replayPendingDeletes(spark, tmp + "/cells").isEmpty)
    // and ivfCompact replays a leftover manifest on ENTRY: a stale
    // manifest naming cell 1 is folded before the new compaction runs
    Files.writeString(Paths.get(tmp + "/cells/_graft_pending_delete"),
      "1")
    val affected = Similarity.ivfCompact(spark, tmp + "/cells",
      Seq(999L).toDF("t_id"), "t_id", tmp + "/stage")
    assert(affected.isEmpty) // 999 tombstones nothing
    assert(!Files.exists(Paths.get(tmp + "/cells/c_cell=1")))
    assert(!Files.exists(Paths.get(tmp + "/cells/_graft_pending_delete")))
    // the index is now EMPTY (no cell directories at all) — a
    // schema-less parquet read can't prove that, the listing can
    assert(Files.list(Paths.get(tmp + "/cells"))
      .filter(p => p.getFileName.toString.startsWith("c_cell="))
      .count() === 0L)
  }

  test("two compactors racing on the same tombstone set are idempotent: " +
    "whichever wins the lock folds, the loser is a no-op") {
    val tmp = Files.createTempDirectory("graft_twocompact").toString
    Seq(
      (1L, Array(1.0f, 0.0f), 1L, 1L),
      (2L, Array(0.9f, 0.1f), 1L, 1L),
      (3L, Array(0.0f, 1.0f), 2L, 2L),
      (4L, Array(0.1f, 0.9f), 2L, 2L))
      .toDF("c_id", "c_vec", "c_norm", "c_cell")
      .repartition(col("c_cell"))
      .write.mode("overwrite").partitionBy("c_cell")
      .parquet(tmp + "/cells")
    val tombs = Seq(2L, 3L).map(Tuple1(_)).toDF("t_id")
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Seq[Long]]()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 2).map { i =>
      new Thread(() => {
        try results.add(graft.ops.Similarity.ivfCompact(spark,
          tmp + "/cells", tombs, "t_id", tmp + s"/stage$i"))
        catch { case t: Throwable => errs.add(t) }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    assert(errs.isEmpty, errs.toString)
    // one folded {1,2}, the other saw an already-clean index ({} —
    // or the same {1,2} if it read before the winner's swap landed;
    // either way the FINAL state below is the single source of truth)
    assert(results.size === 2)
    val after = spark.read.parquet(tmp + "/cells")
      .select("c_id").as[Long].collect().sorted.toSeq
    assert(after === Seq(1L, 4L))
    assert(!Files.exists(Paths.get(tmp + "/cells/_graft_maint_lock")))
    assert(!Files.exists(Paths.get(tmp + "/cells/_graft_pending_delete")))
  }

  test("ivfOpenIndex with no pending manifest is lock-free: it returns " +
    "immediately while another writer holds the maintenance lock") {
    val tmp = Files.createTempDirectory("graft_openfast").toString
    Seq((1L, Array(1.0f, 0.0f), 1L, 1L))
      .toDF("c_id", "c_vec", "c_norm", "c_cell")
      .repartition(col("c_cell"))
      .write.mode("overwrite").partitionBy("c_cell")
      .parquet(tmp + "/cells")
    val inLock = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val holder = new Thread(() =>
      Similarity.withMaintenanceLock(spark, tmp + "/cells", "holder") {
        inLock.countDown()
        release.await()
      })
    holder.start()
    assert(inLock.await(30, java.util.concurrent.TimeUnit.SECONDS))
    try {
      // no manifest -> the open must NOT queue behind the live writer
      val t0 = System.nanoTime()
      val opened = Similarity.ivfOpenIndex(spark, tmp + "/cells")
      assert((System.nanoTime() - t0) / 1e9 < 30.0) // returns promptly
      assert(opened.count() === 1L)
    } finally {
      release.countDown()
      holder.join(30000)
    }
  }

  test("ivfCompact swaps by manifest commit with deletes DEFERRED one " +
    "maintenance cycle; the next op catches physical state up") {
    val tmp = Files.createTempDirectory("graft_manifest_spec").toString
    Seq(
      (1L, Array(1.0f, 0.0f), 1L, 1L),
      (2L, Array(0.0f, 1.0f), 1L, 2L),
      (3L, Array(0.1f, 0.9f), 2L, 2L))
      .toDF("c_id", "c_vec", "c_norm", "c_cell")
      .repartition(col("c_cell"))
      .write.mode("overwrite").partitionBy("c_cell")
      .parquet(tmp + "/cells")
    // cell 1 dies entirely (sole row tombstoned), cell 2 keeps one row
    val affected = Similarity.ivfCompact(spark, tmp + "/cells",
      Seq(1L, 2L).toDF("t_id"), "t_id", tmp + "/stage")
    assert(affected.toSet === Set(1L, 2L))
    // the swap IS the manifest commit: the live view is survivors only
    assert(Files.exists(Paths.get(tmp + "/cells/_graft_manifest")))
    assert(Similarity.ivfOpenIndex(spark, tmp + "/cells")
      .select("c_id").as[Long].collect().toSeq === Seq(3L))
    // ...while the replaced files stay on disk for readers that pinned
    // the pre-swap manifest, listed for the next op's deferred delete
    assert(Files.exists(Paths.get(tmp + "/cells/c_cell=1")))
    assert(Files.exists(Paths.get(tmp + "/cells/_graft_pending_delete")))
    assert(!Files.exists(Paths.get(tmp + "/cells/_graft_maint_lock")))
    // the NEXT maintenance op (a no-op fold here) replays the deferred
    // deletes on entry — physical state catches up with the manifest
    assert(Similarity.ivfCompact(spark, tmp + "/cells",
      Seq(999L).toDF("t_id"), "t_id", tmp + "/stage2").isEmpty)
    assert(!Files.exists(Paths.get(tmp + "/cells/c_cell=1")))
    assert(!Files.exists(Paths.get(tmp + "/cells/_graft_pending_delete")))
    assert(!Files.exists(Paths.get(tmp + "/cells/_graft_maint_lock")))
    assert(spark.read.parquet(tmp + "/cells")
      .select("c_id").as[Long].collect().toSeq === Seq(3L))
  }
}
