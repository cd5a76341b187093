package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MANIFEST-VERSIONED PARQUET DESTINATION TABLES — ACID-ish merge /
  * delete / replace-children plus time travel for ETL sinks, the
  * SURVEY-§2.1 mapping for the reference's update sink (S9), delete
  * sink (S10) and pre-write backup (S12) at 100 TB (reference:
  * `sdk/shell/import.sh:74-83` backs a destination up by copying it
  * before a run; `sdk/migrate_assures.php:205-227` delete-then-inserts
  * children inside a transaction). Plain parquet directories give an
  * ETL pipeline neither isolation (a reader mid-overwrite sees a torn
  * table) nor history (yesterday's state is gone) — this layer is the
  * r12-verdict generalization of the ANN index's snapshot machinery
  * ([[graft.ops.Similarity]] `_graft_manifest`, r11/r12) to ARBITRARY
  * destination tables, built on the same three primitives every table
  * format (Iceberg, Delta) rests on:
  *
  *   1. a LIVE-FILE MANIFEST (`_vt_manifest`: version + the exact
  *      relative data-file list) committed by write-temp-then-atomic-
  *      rename — readers pin a whole version, never a directory
  *      listing mid-swap; new data files are written BEFORE the commit
  *      so a crash leaves the old version serving and the new files as
  *      sweepable orphans;
  *   2. per-version HISTORY manifests (`_vt_manifest.vN`) retained for
  *      `spark.graft.tableRetainVersions` commits → [[readAt]] time
  *      travel, with an AVAILABILITY-BASED prune (below);
  *   3. version-stamped DEFERRED DELETES (`_vt_pending`,
  *      `<dueAtVersion>:<relPath>`): a commit retires replaced files
  *      into the calendar instead of deleting them, so readers pinned
  *      on any retained version never lose a file however many commits
  *      land meanwhile; entries fall due when the live version reaches
  *      their stamp and are replayed at the start of every later
  *      mutation (and by [[vacuum]]).
  *
  * RETENTION-CONF CHANGE SAFETY (the r12 ADVICE finding, fixed here by
  * construction and back-ported to Similarity): history manifests are
  * pruned by AVAILABILITY, not by the retention conf in force at prune
  * time — `.vN` stays exactly as long as EVERY file it references is
  * either live or still awaiting a scheduled delete (`dueAt` beyond the
  * current version), and is dropped the moment any referenced file is
  * gone or due. Raising the retention conf between ops therefore cannot
  * resurrect a version whose data was already deleted under the earlier
  * smaller window ([[readAt]] fails fast, never mid-scan), and lowering
  * it cannot break the window PROMISED at retirement time (the stamps,
  * frozen at retirement, keep both the files and their manifests alive
  * until due). Under a constant conf the rule reproduces the fixed
  * `version - retain` boundary exactly.
  *
  * WRITER SERIALIZATION uses the same two-layer maintenance lock as the
  * index (in-JVM monitor + create-no-overwrite `_vt_lock` with lease
  * steal); readers never lock — [[read]]/[[readAt]] are manifest loads.
  *
  * SCALE SHAPE: [[merge]], [[deleteWhere]] and [[replaceChildren]] are
  * FILE-PRUNED rewrites (the Delta/Iceberg MERGE strategy): one
  * `input_file_name()` semi-join finds the files that actually contain
  * affected rows (driver-side list bounded by the FILE count, never
  * rows), only those files are rewritten, untouched files carry over
  * into the new manifest by reference. A 100-file update against a
  * 100k-file table rewrites 0.1% of the bytes; the update keys ride a
  * broadcast when small (AQE decides), and the rewrite itself is one
  * anti-join + union — no full-table shuffle anywhere.
  */
object VersionedTable {

  /** Session conf: how many PREVIOUS versions stay fully readable
    * alongside the latest (see retention notes above). Default 2 —
    * destination tables exist to be audited; `0` restores
    * delete-at-next-commit.
    */
  val RetainVersionsConf = "spark.graft.tableRetainVersions"

  private val ManifestName = "_vt_manifest"
  private val PendingName = "_vt_pending"
  private val LockName = "_vt_lock"
  private val PartitioningName = "_vt_partitioning"
  private val SchemaName = "_vt_schema"
  private val PendingStamp = "^([0-9]+):(.+)$".r

  private def retain(spark: SparkSession): Long =
    spark.conf.getOption(RetainVersionsConf)
      .flatMap(v => scala.util.Try(v.toLong).toOption)
      .map(math.max(0L, _)).getOrElse(2L)

  // ------------------------------------------------------------------
  // filesystem plumbing
  // ------------------------------------------------------------------

  private def fsOf(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Relative paths of every data file (no `_`/`.`-prefixed segment). */
  private[etl] def listDataFiles(spark: SparkSession,
                                 dir: String): Seq[String] = {
    val (fs, root) = fsOf(spark, dir)
    if (!fs.exists(root)) return Seq.empty
    val rootStr = fs.makeQualified(root).toString
    def walk(p: org.apache.hadoop.fs.Path): Seq[String] =
      fs.listStatus(p).toSeq.flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) Seq.empty
        else if (st.isDirectory) walk(st.getPath)
        else Seq(st.getPath.toString.stripPrefix(rootStr)
          .stripPrefix("/"))
      }
    walk(root).sorted
  }

  private def readLines(fs: org.apache.hadoop.fs.FileSystem,
                        p: org.apache.hadoop.fs.Path): List[String] = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(_.nonEmpty).toList
    finally in.close()
  }

  private def writeAtomic(fs: org.apache.hadoop.fs.FileSystem,
                          dst: org.apache.hadoop.fs.Path,
                          body: String): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(dst.getParent,
      dst.getName + ".tmp")
    val out = fs.create(tmp, true)
    out.write(body.getBytes("UTF-8"))
    out.close()
    fs.delete(dst, false)
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"rename $tmp -> $dst failed")
  }

  /** The live manifest's raw lines, resilient to the swap: the live
    * pointer is published by delete-then-rename (portable across FSes
    * that refuse rename-over), so a lock-free reader can catch the
    * microsecond window where `_vt_manifest` is absent — and a writer
    * crash INSIDE that window loses the pointer entirely. Both resolve
    * the same way: the HIGHEST `.vN` history manifest is byte-identical
    * to what the rename would have published (commitManifest writes it
    * first, and its data files are fully on disk before any manifest
    * write), so it serves as the fallback truth. None only when neither
    * exists — a genuinely uninitialized directory.
    */
  private def liveManifestLines(spark: SparkSession,
                                dir: String): Option[List[String]] = {
    val (fs, root) = fsOf(spark, dir)
    val p = new org.apache.hadoop.fs.Path(root, ManifestName)
    if (fs.exists(p))
      try return Some(readLines(fs, p))
      catch { case _: java.io.FileNotFoundException => () } // lost the race
    if (!fs.exists(root)) return None
    val hist = fs.listStatus(root).toSeq.map(_.getPath.getName)
      .filter(_.startsWith(ManifestName + ".v"))
      .flatMap(n => scala.util.Try(
        n.stripPrefix(ManifestName + ".v").toLong).toOption)
    if (hist.isEmpty) None
    else Some(readLines(fs,
      new org.apache.hadoop.fs.Path(root, ManifestName + ".v" + hist.max)))
  }

  /** The live manifest: (version, relative file paths), None before
    * [[init]]. Header lines (`#key=value`, e.g. the streaming epoch)
    * are filtered out — they ride the SAME atomic rename as the file
    * list, which is what makes [[appendStreamBatch]] exactly-once.
    */
  def readManifest(spark: SparkSession,
                   dir: String): Option[(Long, Seq[String])] =
    liveManifestLines(spark, dir).map {
      case v :: rest => (v.toLong, rest.filterNot(_.startsWith("#")))
      case Nil => (0L, Nil)
    }

  /** The last streaming batch id committed INTO the live manifest (the
    * `#epoch=` header), -1 before any streaming commit.
    */
  def lastStreamEpoch(spark: SparkSession, dir: String): Long =
    liveManifestLines(spark, dir).flatMap(_.collectFirst {
      case l if l.startsWith("#epoch=") =>
        scala.util.Try(l.stripPrefix("#epoch=").toLong).getOrElse(-1L)
    }).getOrElse(-1L)

  /** The table's Hive partition columns (empty = flat), recorded at
    * [[init]]/[[adopt]] so every later rewrite reproduces the layout.
    */
  def partitioning(spark: SparkSession, dir: String): Seq[String] = {
    val (fs, root) = fsOf(spark, dir)
    val p = new org.apache.hadoop.fs.Path(root, PartitioningName)
    if (!fs.exists(p)) Seq.empty else readLines(fs, p)
  }

  def currentVersion(spark: SparkSession, dir: String): Long =
    readManifest(spark, dir).map(_._1).getOrElse(
      throw new IllegalArgumentException(s"$dir is not a versioned table"))

  /** Retained (fully readable) versions, ascending. A `.vN` beyond the
    * live version is a PHANTOM — the history copy of a commit that died
    * before its live flip — and is excluded: it was never committed, so
    * serving it would expose a write that did not happen (the next
    * mutation overwrites or prunes it).
    */
  def versions(spark: SparkSession, dir: String): Seq[Long] = {
    val (fs, root) = fsOf(spark, dir)
    if (!fs.exists(root)) return Seq.empty
    val cur = readManifest(spark, dir).map(_._1)
    fs.listStatus(root).toSeq.map(_.getPath.getName)
      .filter(_.startsWith(ManifestName + ".v"))
      .flatMap(n => scala.util.Try(
        n.stripPrefix(ManifestName + ".v").toLong).toOption)
      .filter(n => cur.forall(n <= _))
      .sorted
  }

  private def pendingEntries(spark: SparkSession,
                             dir: String): Seq[String] = {
    val (fs, root) = fsOf(spark, dir)
    val p = new org.apache.hadoop.fs.Path(root, PendingName)
    if (!fs.exists(p)) Seq.empty else readLines(fs, p)
  }

  private def writePending(spark: SparkSession, dir: String,
                           entries: Seq[String]): Unit = {
    val (fs, root) = fsOf(spark, dir)
    val p = new org.apache.hadoop.fs.Path(root, PendingName)
    if (entries.isEmpty) { fs.delete(p, false); () }
    else writeAtomic(fs, p, entries.mkString("\n"))
  }

  /** Files some reader may still open: live + every retained history
    * manifest's list. The protection set for replay and orphan sweep.
    */
  private def protectedFiles(spark: SparkSession,
                             dir: String): Set[String] = {
    val (fs, root) = fsOf(spark, dir)
    if (!fs.exists(root)) return Set.empty
    val hist = fs.listStatus(root).toSeq
      .filter(_.getPath.getName.startsWith(ManifestName + ".v"))
      .flatMap(st => readLines(fs, st.getPath).drop(1)
        .filterNot(_.startsWith("#")))
    (readManifest(spark, dir).map(_._2).getOrElse(Seq.empty) ++ hist).toSet
  }

  /** Commit manifest `version` (file list), keep a `.vN` history copy,
    * then prune history by AVAILABILITY (header notes). Callers stamp
    * retirements into the pending calendar BEFORE this commit, so the
    * prune sees the just-retired files as still-pending (available) and
    * keeps the versions that reference them.
    */
  private def commitManifest(spark: SparkSession, dir: String,
                             version: Long, files: Seq[String],
                             epoch: Option[Long] = None): Unit = {
    val (fs, root) = fsOf(spark, dir)
    // the epoch header carries FORWARD through non-streaming commits:
    // a compaction between two micro-batches must not reset it, or the
    // next batch replay would double-apply
    val eff = epoch.orElse(
      Some(lastStreamEpoch(spark, dir)).filter(_ >= 0))
    val headers = eff.map(e => s"#epoch=$e").toSeq
    val body = ((version.toString +: headers) ++ files.sorted)
      .mkString("\n")
    // history copy FIRST, then the live flip. A crash between the two
    // leaves a PHANTOM `.vN` (readAt/versions exclude N > live; the
    // next mutation overwrites or prunes it); a crash INSIDE the flip's
    // delete-rename window loses the live pointer, and readers recover
    // from the highest `.vN` — byte-identical to what the rename would
    // have published. Both writes are temp-then-rename: a reader must
    // never observe a TORN list — a truncated `.vN` would silently
    // serve partial table contents.
    writeAtomic(fs,
      new org.apache.hadoop.fs.Path(root, ManifestName + ".v" + version),
      body)
    writeAtomic(fs, new org.apache.hadoop.fs.Path(root, ManifestName), body)
    pruneHistory(spark, dir)
  }

  /** The AVAILABILITY-based history prune (header notes): drop every
    * `.vN` (N < live version) referencing a file that is neither live
    * nor still awaiting its scheduled delete — [[readAt]] on it would
    * fail mid-scan, so the version must fail fast as "not retained"
    * instead. Runs after every commit AND after every replay (a replay
    * physically deletes files, which can expire versions).
    */
  private def pruneHistory(spark: SparkSession, dir: String): Unit = {
    val (fs, root) = fsOf(spark, dir)
    readManifest(spark, dir).foreach { case (version, files) =>
      // three tiers per referenced file: LIVE → available; covered by a
      // pending stamp → available exactly while the stamp is not due
      // (metadata expiry LEADS physical deletion — the window closes
      // when the promise does, even if the replay lags a commit);
      // covered by NO stamp → fall back to on-disk existence (a writer
      // that crashed after its commit but before re-stamping cannot
      // expire versions whose files this very manifest still shields).
      val stamped: Map[String, Seq[Long]] = pendingEntries(spark, dir)
        .flatMap {
          case PendingStamp(due, rel) => Some(rel -> due.toLong)
          case _ => None
        }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
      val liveSet = files.toSet
      lazy val onDisk = listDataFiles(spark, dir).toSet
      def available(rel: String): Boolean =
        liveSet(rel) || (stamped.get(rel) match {
          case Some(dues) => dues.exists(_ > version)
          case None => onDisk(rel)
        })
      // a version is KEPT while its files are all available AND it is
      // either inside the retention window or extended by a retirement
      // stamp still running (the promise frozen when its files retired).
      // The window bound matters on APPEND-ONLY workloads: appends
      // retire nothing, so availability alone would keep every version
      // forever — O(N²) manifest metadata after N micro-batches.
      val keepFrom = version - retain(spark)
      fs.listStatus(root).foreach { st =>
        val n = st.getPath.getName
        val v = if (n.startsWith(ManifestName + ".v"))
          scala.util.Try(n.stripPrefix(ManifestName + ".v").toLong).toOption
        else None
        // N > version is a PHANTOM (a crashed commit's history copy
        // that never flipped live): never readable, pruned on sight
        v.filter(_ > version).foreach(_ => fs.delete(st.getPath, false))
        v.filter(_ < version).foreach { nv =>
          val refs = readLines(fs, st.getPath).drop(1)
            .filterNot(_.startsWith("#"))
          val extended = refs.exists(r =>
            stamped.get(r).exists(_.exists(_ > version)))
          val keep = refs.forall(available) &&
            (nv >= keepFrom || extended)
          if (!keep) fs.delete(st.getPath, false)
        }
      }
    }
  }

  /** Replay due deferred deletes: entries whose stamped due-version the
    * live version has reached, skipping anything a retained manifest
    * still protects. Runs at the top of every mutation; [[vacuum]] is
    * the standalone form. Returns the deleted relative paths.
    */
  private def replayPending(spark: SparkSession, dir: String): Seq[String] = {
    val (fs, root) = fsOf(spark, dir)
    val entries = pendingEntries(spark, dir)
    if (entries.isEmpty) return Seq.empty
    val latest = readManifest(spark, dir).map(_._1).getOrElse(0L)
    val (due, notDue) = entries.partition {
      case PendingStamp(d, _) => latest >= d.toLong
      case _ => true
    }
    val shield = protectedFiles(spark, dir)
    val deleted = scala.collection.mutable.ArrayBuffer[String]()
    val held = scala.collection.mutable.ArrayBuffer[String]()
    due.foreach { e =>
      val rel = PendingStamp.findFirstMatchIn(e).map(_.group(2)).getOrElse(e)
      if (shield(rel)) held += e
      else {
        fs.delete(new org.apache.hadoop.fs.Path(root, rel), false)
        deleted += rel
      }
    }
    writePending(spark, dir, notDue ++ held)
    // a replay can expire versions (their files just left the disk) —
    // their manifests must fail fast, not mid-scan
    if (deleted.nonEmpty) pruneHistory(spark, dir)
    deleted.toSeq
  }

  /** Delete data files on disk but absent from every manifest and the
    * pending calendar — crash garbage from a writer that died between
    * writing files and committing.
    */
  private def sweepOrphans(spark: SparkSession, dir: String): Unit = {
    val (fs, root) = fsOf(spark, dir)
    if (readManifest(spark, dir).isEmpty) return
    val shield = protectedFiles(spark, dir)
    val pending = pendingEntries(spark, dir).map { e =>
      PendingStamp.findFirstMatchIn(e).map(_.group(2)).getOrElse(e)
    }.toSet
    listDataFiles(spark, dir).filterNot(shield).filterNot(pending)
      .foreach(rel =>
        fs.delete(new org.apache.hadoop.fs.Path(root, rel), false))
  }

  // ------------------------------------------------------------------
  // writer lock (the Similarity two-layer discipline; see its scaladoc
  // for the steal protocol rationale)
  // ------------------------------------------------------------------

  private val jvmLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private[etl] def withLock[T](spark: SparkSession, dir: String,
                               owner: String, leaseMs: Long = 600000L,
                               timeoutMs: Long = 600000L)(body: => T): T = {
    val mon = jvmLocks.computeIfAbsent(dir, _ => new Object)
    mon.synchronized {
      val (fs, root) = fsOf(spark, dir)
      val lock = new org.apache.hadoop.fs.Path(root, LockName)
      fs.mkdirs(root)
      val deadline = System.currentTimeMillis() + timeoutMs
      val token = owner + ":" + java.util.UUID.randomUUID()
      var held = false
      while (!held) {
        try {
          val out = fs.create(lock, false)
          out.write(s"$token ${System.currentTimeMillis()}".getBytes("UTF-8"))
          out.close()
          held = true
        } catch {
          case _: java.io.IOException =>
            val stale =
              try System.currentTimeMillis() -
                fs.getFileStatus(lock).getModificationTime > leaseMs
              catch { case _: java.io.IOException => false }
            if (stale) fs.delete(lock, false)
            else if (System.currentTimeMillis() > deadline)
              throw new IllegalStateException(
                s"versioned-table lock on $dir not released in $timeoutMs ms")
            else Thread.sleep(50)
        }
      }
      try body
      finally {
        val ours =
          try {
            val in = fs.open(lock)
            val head =
              try scala.io.Source.fromInputStream(in, "UTF-8").mkString
              finally in.close()
            head.startsWith(token + " ")
          } catch { case _: java.io.IOException => false }
        if (ours) fs.delete(lock, false)
      }
    }
  }

  // ------------------------------------------------------------------
  // reads
  // ------------------------------------------------------------------

  /** Persist the table's read schema as `_vt_schema` (JSON) at
    * init/adopt — the canonical shape an EMPTY version falls back to:
    * once a full delete's retired files physically leave the disk there
    * is no footer left to infer from, and a legitimately-empty table
    * must still read as zero rows, not an AnalysisException.
    */
  private def writeSchema(spark: SparkSession, dir: String,
                          schema: org.apache.spark.sql.types.StructType)
      : Unit = {
    val (fs, root) = fsOf(spark, dir)
    writeAtomic(fs, new org.apache.hadoop.fs.Path(root, SchemaName),
      schema.json)
  }

  private def storedSchema(spark: SparkSession, dir: String)
      : Option[org.apache.spark.sql.types.StructType] = {
    val (fs, root) = fsOf(spark, dir)
    val p = new org.apache.hadoop.fs.Path(root, SchemaName)
    if (!fs.exists(p)) None
    else scala.util.Try(org.apache.spark.sql.types.DataType
      .fromJson(readLines(fs, p).mkString("\n"))
      .asInstanceOf[org.apache.spark.sql.types.StructType]).toOption
  }

  private def loadFiles(spark: SparkSession, dir: String,
                        files: Seq[String]): DataFrame =
    if (files.nonEmpty)
      spark.read.option("basePath", dir)
        .parquet(files.map(f => dir + "/" + f): _*)
    else storedSchema(spark, dir) match {
      case Some(sch) => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], sch)
      // pre-sidecar table: on-disk footers (throws only when the
      // directory holds no parquet at all — nothing to infer from)
      case None => spark.read.parquet(dir).limit(0)
    }

  /** The live snapshot — exactly the committed file list, lock-free;
    * consistent even while a mutation swaps underneath.
    */
  def read(spark: SparkSession, dir: String): DataFrame =
    readManifest(spark, dir) match {
      case Some((_, files)) => loadFiles(spark, dir, files)
      case None => throw new IllegalArgumentException(
        s"$dir is not a versioned table (no $ManifestName) — init() first")
    }

  /** TIME TRAVEL: the table exactly as version `version` committed it.
    * Retained versions are complete by construction (availability
    * prune); an expired version fails fast here, never mid-scan.
    */
  def readAt(spark: SparkSession, dir: String, version: Long): DataFrame = {
    val (fs, root) = fsOf(spark, dir)
    val p = new org.apache.hadoop.fs.Path(root, ManifestName + ".v" + version)
    // the <= live check rejects PHANTOM versions (a crashed commit's
    // history copy that never flipped live) alongside missing ones
    val committed = readManifest(spark, dir).exists(version <= _._1)
    if (!fs.exists(p) || !committed)
      throw new IllegalArgumentException(
        s"table version $version not retained under $dir " +
          s"(retained: ${versions(spark, dir).mkString(", ")}) — raise " +
          s"$RetainVersionsConf to keep more history")
    loadFiles(spark, dir,
      readLines(fs, p).drop(1).filterNot(_.startsWith("#")))
  }

  // ------------------------------------------------------------------
  // writes
  // ------------------------------------------------------------------

  /** Append `df` as new data files and commit the next version: the new
    * files land first, the manifest flip publishes them atomically.
    * Returns the committed version.
    */
  private def appendCommit(spark: SparkSession, dir: String, df: DataFrame,
                           carryOver: Seq[String],
                           retired: Seq[String],
                           epoch: Option[Long] = None): Long = {
    val before = listDataFiles(spark, dir).toSet
    val parts = partitioning(spark, dir)
    val writer = df.write.mode("append")
    (if (parts.nonEmpty) writer.partitionBy(parts: _*) else writer)
      .parquet(dir)
    val newFiles = listDataFiles(spark, dir).filterNot(before)
    val version = readManifest(spark, dir).map(_._1).getOrElse(0L) + 1
    // retirement stamps land BEFORE the manifest flip: the commit's
    // availability prune must see the retired files as still-pending
    // (else it would expire the immediately-previous version), and a
    // crash between the two leaves stamped entries whose files the old
    // live manifest still shields — held at replay, retried harmlessly.
    if (retired.nonEmpty) {
      val dueAt = version + retain(spark)
      writePending(spark, dir,
        pendingEntries(spark, dir) ++ retired.map(r => s"$dueAt:$r"))
    }
    commitManifest(spark, dir, version, carryOver ++ newFiles, epoch)
    version
  }

  private def writePartitioning(spark: SparkSession, dir: String,
                                cols: Seq[String]): Unit =
    if (cols.nonEmpty) {
      val (fs, root) = fsOf(spark, dir)
      fs.mkdirs(root)
      writeAtomic(fs, new org.apache.hadoop.fs.Path(root, PartitioningName),
        cols.mkString("\n"))
    }

  /** Create the table: `df` becomes version 1. Fails if a manifest
    * already exists (use [[overwrite]] to replace content).
    * `partitionBy` makes it a Hive-partitioned table — every later
    * commit reproduces the layout, partition-predicate reads and
    * rewrites prune whole directories at planning time, and the 100 TB
    * destination shape (date/region-partitioned facts) keeps its
    * pruning UNDER versioning.
    */
  def init(spark: SparkSession, dir: String, df: DataFrame,
           partitionBy: Seq[String] = Seq.empty): Long =
    withLock(spark, dir, "init") {
      require(readManifest(spark, dir).isEmpty,
        s"$dir is already a versioned table")
      writePartitioning(spark, dir, partitionBy)
      val v = appendCommit(spark, dir, df, Seq.empty, Seq.empty)
      // canonical READ schema (partition columns land last), the empty-
      // version fallback shape
      scala.util.Try(writeSchema(spark, dir, read(spark, dir).schema))
      v
    }

  /** ADOPT an existing plain parquet directory: snapshot its current
    * listing as version 1 without rewriting a byte — the migration path
    * for destinations the pipeline already owns (the
    * [[graft.ops.Similarity]] bootstrapManifest discipline). For a
    * Hive-partitioned directory, pass its partition columns so later
    * commits keep the layout.
    */
  def adopt(spark: SparkSession, dir: String,
            partitionBy: Seq[String] = Seq.empty): Long =
    withLock(spark, dir, "adopt") {
      require(readManifest(spark, dir).isEmpty,
        s"$dir is already a versioned table")
      writePartitioning(spark, dir, partitionBy)
      commitManifest(spark, dir, 1L, listDataFiles(spark, dir))
      scala.util.Try(writeSchema(spark, dir, read(spark, dir).schema))
      1L
    }

  /** Append rows (the S6/S8 sink shape) as a new version. */
  def append(spark: SparkSession, dir: String, df: DataFrame): Long =
    withLock(spark, dir, "append") {
      replayPending(spark, dir); sweepOrphans(spark, dir)
      val live = readManifest(spark, dir).map(_._2).getOrElse(
        throw new IllegalArgumentException(s"$dir: init() first"))
      appendCommit(spark, dir, df, live, Seq.empty)
    }

  /** Replace the whole table content (the reference's pre-write-backup
    * overwrite, S12): old files retire into the calendar, previous
    * versions stay readable for the retention window.
    */
  def overwrite(spark: SparkSession, dir: String, df: DataFrame): Long =
    withLock(spark, dir, "overwrite") {
      replayPending(spark, dir); sweepOrphans(spark, dir)
      val live = readManifest(spark, dir).map(_._2).getOrElse(
        throw new IllegalArgumentException(s"$dir: init() first"))
      appendCommit(spark, dir, df, Seq.empty, live)
    }

  /** The shared file-pruned rewrite: `touched` = live files holding at
    * least one affected row (via one `input_file_name()` semi-join —
    * the collect is bounded by the FILE count); those files' survivor
    * rows plus `extra` are rewritten as new files, untouched files
    * carry over BY REFERENCE into the new manifest.
    */
  private def prunedRewrite(spark: SparkSession, dir: String,
                            touchRows: DataFrame => DataFrame,
                            survivors: DataFrame => DataFrame,
                            extra: Option[DataFrame],
                            epoch: Option[Long] = None): Long = {
    val live = readManifest(spark, dir).map(_._2).getOrElse(
      throw new IllegalArgumentException(s"$dir: init() first"))
    val liveDf = loadFiles(spark, dir, live)
    val (fs, root) = fsOf(spark, dir)
    // scheme-robust relativization: input_file_name() returns a URI
    // (possibly %-encoded, `file:///...`), manifest paths are raw and
    // root-relative — compare URI *paths*, not prefix strings (a
    // `file:/x` vs `file:///x` qualification mismatch would silently
    // touch zero files)
    val rootPath = fs.makeQualified(root).toUri.getPath
    val touchedAbs = touchRows(
      liveDf.withColumn("_vt_file", input_file_name()))
      .select("_vt_file").distinct().collect().map(_.getString(0))
    val touched = touchedAbs.map { f =>
      new java.net.URI(f).getPath.stripPrefix(rootPath).stripPrefix("/")
    }.toSeq.sorted
    val touchedSet = touched.toSet
    val carryOver = live.filterNot(touchedSet)
    // inserts aligned to the live schema's column order in EVERY branch:
    // parquet files with permuted column order would poison later reads
    val aligned = extra.map(_.select(
      liveDf.columns.map(col).toIndexedSeq: _*))
    val rewritten =
      if (touched.isEmpty) aligned.getOrElse(liveDf.limit(0))
      else {
        val kept = survivors(loadFiles(spark, dir, touched))
        aligned.map(kept.unionByName(_)).getOrElse(kept)
      }
    appendCommit(spark, dir, rewritten, carryOver, touched, epoch)
  }

  /** MERGE (upsert): `src` rows replace matched live rows wholly (the
    * [[Upsert]] semantics — the reference updates every mapped column),
    * unmatched live rows persist, unmatched `src` rows insert. Only
    * files containing matched keys are rewritten.
    */
  def merge(spark: SparkSession, dir: String, src: DataFrame,
            keys: Seq[String]): Long =
    withLock(spark, dir, "merge") {
      replayPending(spark, dir); sweepOrphans(spark, dir)
      val srcKeys = src.select(keys.map(col): _*).distinct()
      prunedRewrite(spark, dir,
        touchRows = _.join(srcKeys, keys, "left_semi"),
        survivors = _.join(srcKeys, keys, "left_anti"),
        extra = Some(src))
    }

  /** DELETE WHERE `cond` (S10): only files holding a matching row are
    * rewritten; survivors are the rows where `cond` is not TRUE (SQL
    * DELETE semantics — a NULL predicate keeps the row).
    */
  def deleteWhere(spark: SparkSession, dir: String, cond: Column): Long =
    withLock(spark, dir, "delete") {
      replayPending(spark, dir); sweepOrphans(spark, dir)
      prunedRewrite(spark, dir,
        touchRows = _.filter(cond),
        survivors = _.filter(!coalesce(cond, lit(false))),
        extra = None)
    }

  /** DELETE-THEN-INSERT CHILDREN (J7/S10, reference
    * `sdk/migrate_assures.php:205-227`): drop every live row whose
    * parent key appears in `recomputed`, insert the recomputed set —
    * one atomic commit, so readers never observe the deleted-but-not-
    * yet-reinserted intermediate state the reference needed a DB
    * transaction for.
    */
  def replaceChildren(spark: SparkSession, dir: String,
                      recomputed: DataFrame,
                      parentKeys: Seq[String]): Long =
    withLock(spark, dir, "replace-children") {
      replayPending(spark, dir); sweepOrphans(spark, dir)
      val parents = recomputed.select(parentKeys.map(col): _*).distinct()
      prunedRewrite(spark, dir,
        touchRows = _.join(parents, parentKeys, "left_semi"),
        survivors = _.join(parents, parentKeys, "left_anti"),
        extra = Some(recomputed))
    }

  /** SMALL-FILE COMPACTION as a versioned commit: rewrite the live
    * file set into ~`targetFiles` files (per partition directory when
    * the table is partitioned) and swap manifests — readers keep their
    * snapshot, old files retire into the calendar. The maintenance op a
    * streaming-fed destination runs on a schedule: micro-batch appends
    * accumulate one small file per batch-task, and at 100 TB the FILE
    * COUNT (listing, footers, task scheduling) becomes the bottleneck
    * before the bytes do. No-op (returns the current version) when the
    * live set is already within target.
    */
  def compact(spark: SparkSession, dir: String,
              targetFiles: Int = 1): Long =
    withLock(spark, dir, "compact") {
      replayPending(spark, dir); sweepOrphans(spark, dir)
      val (version, live) = readManifest(spark, dir).getOrElse(
        throw new IllegalArgumentException(s"$dir: init() first"))
      val parts = partitioning(spark, dir)
      val threshold = targetFiles * math.max(1,
        if (parts.isEmpty) 1
        else live.map(_.split("/").dropRight(1).mkString("/"))
          .distinct.size)
      if (live.size <= threshold) version
      else {
        val liveDf = loadFiles(spark, dir, live)
        val rewritten =
          if (parts.isEmpty) liveDf.repartition(targetFiles)
          // cluster by partition value so each task holds whole
          // partitions → targetFiles-ish files per directory, never a
          // per-task file in every directory
          else liveDf.repartition(
            math.max(targetFiles, spark.sparkContext.defaultParallelism),
            parts.map(col): _*)
        appendCommit(spark, dir, rewritten, Seq.empty, live)
      }
    }

  /** EXACTLY-ONCE streaming append: the foreachBatch body for a
    * versioned destination. The micro-batch's id is committed INTO the
    * manifest (`#epoch=` header) by the same atomic rename that
    * publishes its files, so a batch REPLAY after a crash — Structured
    * Streaming's at-least-once contract — is recognized
    * (`batchId <= lastStreamEpoch`) and skipped whole: the data landed
    * iff the manifest flipped, there is no half state. Replays of a
    * batch that died BEFORE its flip find its files unreferenced (the
    * orphan sweep collects them) and re-append cleanly.
    *
    *   stream.writeStream.foreachBatch { (b, id) =>
    *     VersionedTable.appendStreamBatch(spark, dir, b, id) }
    */
  def appendStreamBatch(spark: SparkSession, dir: String, df: DataFrame,
                        batchId: Long): Long =
    withLock(spark, dir, "stream-append") {
      val last = lastStreamEpoch(spark, dir)
      if (batchId <= last)
        readManifest(spark, dir).map(_._1).getOrElse(0L) // replay: no-op
      else {
        replayPending(spark, dir); sweepOrphans(spark, dir)
        val live = readManifest(spark, dir).map(_._2).getOrElse(
          throw new IllegalArgumentException(s"$dir: init() first"))
        appendCommit(spark, dir, df, live, Seq.empty, Some(batchId))
      }
    }

  /** [[appendStreamBatch]]'s MERGE sibling: upsert the micro-batch on
    * `keys` with the same manifest-epoch idempotence — the streaming
    * CDC-apply shape (reference: the row-cursor upsert loop of
    * sdk/migrate_assures.php, fed by a stream instead of a cursor).
    */
  def mergeStreamBatch(spark: SparkSession, dir: String, df: DataFrame,
                       keys: Seq[String], batchId: Long): Long =
    withLock(spark, dir, "stream-merge") {
      val last = lastStreamEpoch(spark, dir)
      if (batchId <= last)
        readManifest(spark, dir).map(_._1).getOrElse(0L)
      else {
        replayPending(spark, dir); sweepOrphans(spark, dir)
        val srcKeys = df.select(keys.map(col): _*).distinct()
        prunedRewrite(spark, dir,
          touchRows = _.join(srcKeys, keys, "left_semi"),
          survivors = _.join(srcKeys, keys, "left_anti"),
          extra = Some(df), epoch = Some(batchId))
      }
    }

  /** CHANGE DATA FEED between two retained versions (the Delta CDF
    * analog): every row inserted, deleted, or updated between `fromV`
    * and `toV`, tagged `_change_type` ∈ {insert, delete,
    * update_preimage, update_postimage}. `keys` must identify a row
    * uniquely within a version (the usual CDF contract).
    *
    * FILE-PRUNED BY THE MANIFEST DIFF — the reason this belongs to the
    * versioned layer instead of a generic snapshot diff: files the two
    * manifests SHARE are carried by reference, so their rows are
    * physically identical and can never produce a change; only the
    * symmetric difference of the two file lists is read. Diff cost is
    * therefore ∝ CHURN (files touched by the commits in between), not
    * table size — on a 100k-file table where ten commits rewrote 100
    * files, the feed reads 200 files, no matter how many rows the
    * table holds. Rows that merely MOVED files without changing (a
    * rewrite's survivors) meet themselves in the full-outer join and
    * are filtered by the value comparison.
    */
  def changesBetween(spark: SparkSession, dir: String,
                     fromV: Long, toV: Long,
                     keys: Seq[String]): DataFrame = {
    require(fromV < toV, s"changesBetween needs fromV < toV, got $fromV, $toV")
    def filesAt(v: Long): Seq[String] = {
      val (fs, root) = fsOf(spark, dir)
      val p = new org.apache.hadoop.fs.Path(root, ManifestName + ".v" + v)
      val committed = readManifest(spark, dir).exists(v <= _._1)
      if (!fs.exists(p) || !committed)
        throw new IllegalArgumentException(
          s"table version $v not retained under $dir " +
            s"(retained: ${versions(spark, dir).mkString(", ")})")
      readLines(fs, p).drop(1).filterNot(_.startsWith("#"))
    }
    val from = filesAt(fromV).toSet
    val to = filesAt(toV).toSet
    val before = loadFiles(spark, dir, (from -- to).toSeq.sorted)
    val after = loadFiles(spark, dir, (to -- from).toSeq.sorted)
    val cols = before.columns.toSeq
    val nonKeys = cols.filterNot(keys.contains)
    val b = before.select(cols.map(c => col(c).as("_b_" + c)): _*)
    val a = after.select(cols.map(c => col(c).as("_a_" + c)): _*)
    val joinCond = keys.map(k => col("_b_" + k) === col("_a_" + k))
      .reduce(_ && _)
    val joined = b.join(a, joinCond, "full_outer")
    val bKey = col("_b_" + keys.head)
    val aKey = col("_a_" + keys.head)
    // null-safe per-column difference: a row that moved files unchanged
    // compares equal and drops out
    val differs = nonKeys.map(c => !(col("_b_" + c) <=> col("_a_" + c)))
      .reduceOption(_ || _).getOrElse(lit(false))
    val inserts = joined.filter(bKey.isNull)
      .select((cols.map(c => col("_a_" + c).as(c)) :+
        lit("insert").as("_change_type")): _*)
    val deletes = joined.filter(aKey.isNull)
      .select((cols.map(c => col("_b_" + c).as(c)) :+
        lit("delete").as("_change_type")): _*)
    val updatedPairs = joined.filter(bKey.isNotNull && aKey.isNotNull &&
      differs)
    val pre = updatedPairs
      .select((cols.map(c => col("_b_" + c).as(c)) :+
        lit("update_preimage").as("_change_type")): _*)
    val post = updatedPairs
      .select((cols.map(c => col("_a_" + c).as(c)) :+
        lit("update_postimage").as("_change_type")): _*)
    inserts.unionByName(deletes).unionByName(pre).unionByName(post)
  }

  /** Standalone deferred-delete replay + orphan sweep (the maintenance
    * entry point a scheduler calls; every mutation also runs it).
    * Returns the physically deleted relative paths.
    */
  def vacuum(spark: SparkSession, dir: String): Seq[String] =
    withLock(spark, dir, "vacuum") {
      val deleted = replayPending(spark, dir)
      sweepOrphans(spark, dir)
      deleted
    }
}
