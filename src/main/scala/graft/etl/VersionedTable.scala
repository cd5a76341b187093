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

  private[etl] val ManifestName = "_vt_manifest"
  private val PendingName = "_vt_pending"
  private val LockName = "_vt_lock"
  private val PartitioningName = "_vt_partitioning"
  private val SchemaName = "_vt_schema"
  private val PendingStamp = "^([0-9]+):(.+)$".r

  /** Effective retention: an explicit per-call `retain` parameter wins
    * over the session conf (r13-verdict item 7 — gate bodies used to
    * set/unset the conf around mutations, which races under a shared
    * SparkSession; the parameter is thread-confined by construction).
    * The conf stays as the session-wide default.
    */
  private def effRetain(spark: SparkSession, ov: Option[Long]): Long =
    ov.map(math.max(0L, _)).getOrElse(
      spark.conf.getOption(RetainVersionsConf)
        .flatMap(v => scala.util.Try(v.toLong).toOption)
        .map(math.max(0L, _)).getOrElse(2L))

  // ------------------------------------------------------------------
  // filesystem plumbing
  // ------------------------------------------------------------------

  private[etl] def fsOf(spark: SparkSession, dir: String) = {
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

  private[etl] def readLines(fs: org.apache.hadoop.fs.FileSystem,
                        p: org.apache.hadoop.fs.Path): List[String] = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(_.nonEmpty).toList
    finally in.close()
  }

  private[etl] def writeAtomic(fs: org.apache.hadoop.fs.FileSystem,
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

  private val EpochHeader =
    "^#epoch(?:\\.([A-Za-z0-9._-]+))?=(-?[0-9]+)$".r

  /** Per-stream-identity committed epochs from the live manifest's
    * `#epoch.<streamId>=N` headers. SCOPED idempotence (r13 ADVICE): a
    * single global epoch would silently drop a SECOND stream's batches
    * (its fresh batch ids start at 0, "already seen") — data loss. Each
    * stream identity (Delta's txnAppId analog) tracks its own high-water
    * mark; a legacy unscoped `#epoch=` header reads as identity
    * `default`.
    */
  def streamEpochs(spark: SparkSession, dir: String): Map[String, Long] =
    liveManifestLines(spark, dir).getOrElse(Nil).collect {
      case EpochHeader(id, n) =>
        (Option(id).getOrElse("default"), n.toLong)
    }.toMap

  /** The last batch id `streamId` committed INTO the live manifest, -1
    * before any streaming commit under that identity.
    */
  def lastStreamEpoch(spark: SparkSession, dir: String,
                      streamId: String = "default"): Long =
    streamEpochs(spark, dir).getOrElse(streamId, -1L)

  /** The version's committed read schema (`#schema=` manifest header),
    * absent on pre-r14 manifests. The schema rides the SAME atomic
    * rename as the file list, so it is versioned for free: [[readAt]]
    * on a pre-evolution version serves the old shape, and an
    * [[overwrite]] with a new shape can never leave a stale sidecar
    * behind (the r13 ADVICE `_vt_schema` finding — the sidecar is now
    * only a legacy fallback).
    */
  private def schemaOf(lines: Seq[String])
      : Option[org.apache.spark.sql.types.StructType] =
    lines.collectFirst {
      case l if l.startsWith("#schema=") =>
        org.apache.spark.sql.types.DataType
          .fromJson(l.stripPrefix("#schema="))
          .asInstanceOf[org.apache.spark.sql.types.StructType]
    }

  // ------------------------------------------------------------------
  // per-file column statistics (DATA SKIPPING — the Delta/Iceberg
  // min-max stats analog, r14). Each committed file may carry a
  // `#stats=<relpath>\t{"col":["lo","hi"], ...}` manifest header,
  // harvested from its parquet FOOTER at commit time (O(files written),
  // never a table walk; row-group stats are free metadata the writer
  // already produced). Carried files keep their lines verbatim. The
  // merge/replace probe then skips files whose key range provably
  // misses the source keys — on a key-clustered table (range layout,
  // z-order) a small merge PROBES as few files as it REWRITES, where
  // the plain probe scans the whole table to find them. Stats cover
  // integral/floating columns and ASCII-only strings (parquet binary
  // stats order is UTF-8 bytewise; ASCII is where it provably agrees
  // with Spark's string ordering — anything else is dropped rather
  // than risking a wrong skip). Absent stats = never skipped.
  // ------------------------------------------------------------------

  /** Session conf: harvest per-file min/max stats at commit (default
    * true). Reading existing stats never needs the conf.
    */
  val FileStatsConf = "spark.graft.tableFileStats"

  private def statsEnabled(spark: SparkSession): Boolean =
    spark.conf.getOption(FileStatsConf).forall(_.toBoolean)

  private def asciiOnly(s: String): Boolean = s.forall(_ < 128)

  /** Footer-harvested [lo, hi] per eligible top-level column, or None
    * when the file yields nothing usable. Values are rendered as
    * strings in the JSON; numeric-ness is re-derived from the table
    * schema at skip time.
    */
  private def harvestStats(spark: SparkSession, dir: String, rel: String,
                           schema: org.apache.spark.sql.types.StructType)
      : Option[String] = scala.util.Try {
    import org.apache.spark.sql.types._
    val eligible = schema.fields.collect {
      case f if Seq(ByteType, ShortType, IntegerType, LongType,
        FloatType, DoubleType, StringType).contains(f.dataType) => f.name
    }.toSet
    if (eligible.isEmpty) return None
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(dir + "/" + rel),
      spark.sparkContext.hadoopConfiguration)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    val perCol = scala.collection.mutable.HashMap[String, (String, String)]()
    val dropped = scala.collection.mutable.HashSet[String]()
    try {
      reader.getFooter.getBlocks.forEach { block =>
        block.getColumns.forEach { cc =>
          val name = cc.getPath.toDotString
          if (eligible(name) && !dropped(name)) {
            val st = cc.getStatistics
            if (st == null || st.isEmpty || !st.hasNonNullValue) {
              dropped += name; perCol.remove(name)
            } else {
              val (lo, hi) = (st.genericGetMin, st.genericGetMax) match {
                case (a: org.apache.parquet.io.api.Binary,
                      b: org.apache.parquet.io.api.Binary) =>
                  (a.toStringUsingUTF8, b.toStringUsingUTF8)
                case (a, b) => (a.toString, b.toString)
              }
              if (!asciiOnly(lo) || !asciiOnly(hi)) {
                dropped += name; perCol.remove(name)
              } else perCol.get(name) match {
                case None => perCol(name) = (lo, hi)
                case Some((plo, phi)) =>
                  // blocks merge under the SAME ordering skipping uses
                  val num = schema(name).dataType != StringType
                  def less(x: String, y: String) =
                    if (num) BigDecimal(x) < BigDecimal(y) else x < y
                  perCol(name) = (if (less(lo, plo)) lo else plo,
                    if (less(phi, hi)) hi else phi)
              }
            }
          }
        }
      }
    } finally reader.close()
    if (perCol.isEmpty) None
    else {
      def q(s: String) = "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
      Some(perCol.toSeq.sortBy(_._1).map { case (c, (lo, hi)) =>
        s"${q(c)}:[${q(lo)},${q(hi)}]"
      }.mkString("{", ",", "}"))
    }
  }.toOption.flatten

  /** `relpath -> raw stats json` from a manifest's header lines. */
  private def statsOf(lines: Seq[String]): Map[String, String] =
    lines.collect {
      case l if l.startsWith("#stats=") && l.indexOf('\t') > 7 =>
        val t = l.indexOf('\t')
        (l.substring(7, t), l.substring(t + 1))
    }.toMap

  private val StatsEntry = "\"((?:[^\"\\\\]|\\\\.)*)\":\\[\"((?:[^\"\\\\]|\\\\.)*)\",\"((?:[^\"\\\\]|\\\\.)*)\"\\]".r

  private def unq(s: String): String = {
    val b = new StringBuilder
    var i = 0
    while (i < s.length) {
      s(i) match {
        case '\\' if i + 1 < s.length =>
          s(i + 1) match {
            case 'u' if i + 5 < s.length =>
              b += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar
              i += 5
            case c => b += c; i += 1
          }
        case c => b += c
      }
      i += 1
    }
    b.toString
  }

  /** The subset of `files` a key-equality probe must scan: a file is
    * skipped only when, for some key column, its [lo, hi] provably
    * misses the source keys' range. Files without stats (pre-stats
    * commits, adopt-ed files, dropped columns) always qualify — skipping
    * is an optimization, never a semantics change. An empty source
    * range (no non-null keys) qualifies NO files: the semi-join could
    * not match anything either.
    */
  private[etl] def statsCandidates(spark: SparkSession, dir: String,
                                   files: Seq[String],
                                   stats: Map[String, String],
                                   keys: Seq[String],
                                   srcKeys: DataFrame): Seq[String] = {
    import org.apache.spark.sql.types._
    if (stats.isEmpty) return files
    val usable = srcKeys.schema.fields.filter(f =>
      keys.contains(f.name) && Seq(ByteType, ShortType, IntegerType,
        LongType, FloatType, DoubleType, StringType).contains(f.dataType))
    if (usable.isEmpty) return files
    val aggs = usable.flatMap(f =>
      Seq(min(col(f.name)).cast("string").as("lo_" + f.name),
        max(col(f.name)).cast("string").as("hi_" + f.name)))
    val row = srcKeys.agg(aggs.head, aggs.tail.toIndexedSeq: _*).collect()(0)
    // a usable key column with NO non-null source values (incl. the
    // empty source) can never satisfy the equality — probe nothing
    if (usable.exists(f => row.getAs[String]("lo_" + f.name) == null))
      return Seq.empty
    val ranges: Seq[(String, Boolean, String, String)] = usable.map { f =>
      (f.name, f.dataType != StringType,
        row.getAs[String]("lo_" + f.name),
        row.getAs[String]("hi_" + f.name))
    }.toSeq
    files.filter { rel =>
      stats.get(rel) match {
        case None => true
        case Some(json) =>
          val fileCols = StatsEntry.findAllMatchIn(json).map(m =>
            unq(m.group(1)) -> (unq(m.group(2)), unq(m.group(3)))).toMap
          ranges.forall { case (c, numeric, sLo, sHi) =>
            fileCols.get(c) match {
              case None => true // no stats for this column: can't skip
              case Some((fLo, fHi)) =>
                def lt(x: String, y: String) =
                  if (numeric)
                    scala.util.Try(BigDecimal(x) < BigDecimal(y))
                      .getOrElse(false)
                  else x < y
                // overlap unless provably disjoint
                !(lt(fHi, sLo) || lt(sHi, fLo))
            }
          }
      }
    }
  }

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
                             epoch: Option[(String, Long)] = None,
                             schemaJson: Option[String] = None,
                             retainOv: Option[Long] = None,
                             newStats: Map[String, String] = Map.empty)
      : Unit = {
    val (fs, root) = fsOf(spark, dir)
    val prevLines = liveManifestLines(spark, dir).getOrElse(Nil)
    // EVERY epoch header carries FORWARD through non-streaming commits:
    // a compaction between two micro-batches must not reset any
    // stream's high-water mark, or that stream's next replay would
    // double-apply; a streaming commit updates only ITS OWN identity
    val effEpochs = streamEpochs(spark, dir) ++ epoch
    // likewise the schema header: a commit that does not evolve the
    // shape republishes the live one
    val effSchema = schemaJson.orElse(prevLines.collectFirst {
      case l if l.startsWith("#schema=") => l.stripPrefix("#schema=")
    })
    // stats lines: carried files keep their previous line verbatim,
    // new files bring their freshly harvested one; retired files drop
    val fileSet = files.toSet
    val effStats = (statsOf(prevLines) ++ newStats).filter {
      case (rel, _) => fileSet(rel)
    }
    val headers = effEpochs.toSeq.sortBy(_._1)
      .map { case (id, e) => s"#epoch.$id=$e" } ++
      effSchema.map(j => s"#schema=$j") ++
      effStats.toSeq.sortBy(_._1)
        .map { case (rel, j) => s"#stats=$rel\t$j" }
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
    pruneHistory(spark, dir, retainOv)
  }

  /** The AVAILABILITY-based history prune (header notes): drop every
    * `.vN` (N < live version) referencing a file that is neither live
    * nor still awaiting its scheduled delete — [[readAt]] on it would
    * fail mid-scan, so the version must fail fast as "not retained"
    * instead. Runs after every commit AND after every replay (a replay
    * physically deletes files, which can expire versions).
    */
  private def pruneHistory(spark: SparkSession, dir: String,
                           retainOv: Option[Long] = None): Unit = {
    val (fs, root) = fsOf(spark, dir)
    readManifest(spark, dir).foreach { case (version, files) =>
      // three tiers per referenced file: LIVE → available; covered by a
      // pending stamp → available exactly while the stamp is not due
      // (metadata expiry LEADS physical deletion — the window closes
      // when the promise does, even if the replay lags a commit);
      // covered by NO stamp → fall back to on-disk existence (a writer
      // that crashed after its commit but before re-stamping cannot
      // expire versions whose files this very manifest still shields).
      // The existence probe is PER FILE (memoized), not a full table
      // listing: it fires only for the rare crashed-writer leftovers,
      // so the prune stays O(referenced files), never O(table walk).
      val stamped: Map[String, Seq[Long]] = pendingEntries(spark, dir)
        .flatMap {
          case PendingStamp(due, rel) => Some(rel -> due.toLong)
          case _ => None
        }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
      val liveSet = files.toSet
      val onDisk = scala.collection.mutable.HashMap[String, Boolean]()
      def available(rel: String): Boolean =
        liveSet(rel) || (stamped.get(rel) match {
          case Some(dues) => dues.exists(_ > version)
          case None => onDisk.getOrElseUpdate(rel,
            fs.exists(new org.apache.hadoop.fs.Path(root, rel)))
        })
      // a version is KEPT while its files are all available AND it is
      // either inside the retention window or extended by a retirement
      // stamp still running (the promise frozen when its files retired).
      // The window bound matters on APPEND-ONLY workloads: appends
      // retire nothing, so availability alone would keep every version
      // forever — O(N²) manifest metadata after N micro-batches.
      val keepFrom = version - effRetain(spark, retainOv)
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
  private def replayPending(spark: SparkSession, dir: String,
                            retainOv: Option[Long] = None): Seq[String] = {
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
    // fold away commit subdirectories (and partition dirs inside them)
    // the deletes just emptied — the root listing the manifest-recovery
    // and versions() paths do must stay O(live commits), not accrete
    // one empty dir per historical commit forever
    val qRoot = fs.makeQualified(root)
    deleted.foreach { rel =>
      var parent = new org.apache.hadoop.fs.Path(root, rel).getParent
      var more = true
      while (more && parent != null && fs.makeQualified(parent) != qRoot) {
        more =
          try fs.exists(parent) && fs.listStatus(parent).isEmpty &&
            fs.delete(parent, false)
          catch { case _: java.io.IOException => false }
        parent = parent.getParent
      }
    }
    writePending(spark, dir, notDue ++ held)
    // a replay can expire versions (their files just left the disk) —
    // their manifests must fail fast, not mid-scan
    if (deleted.nonEmpty) pruneHistory(spark, dir, retainOv)
    deleted.toSeq
  }

  /** Delete data files on disk but absent from every manifest and the
    * pending calendar — crash garbage from a writer that died between
    * writing files and committing. VACUUM-ONLY since r14: this is the
    * one remaining full-table walk, and running it inline made every
    * mutation O(table files). Crash garbage is invisible to readers
    * (manifest-pinned) and isolated in its own commit subdirectory, so
    * deferring collection to the scheduled [[vacuum]] costs only disk.
    */
  private def sweepOrphans(spark: SparkSession, dir: String): Unit = {
    val (fs, root) = fsOf(spark, dir)
    if (readManifest(spark, dir).isEmpty) return
    // dead commit attempts: the sweep runs under the table lock, so any
    // `.staging-*` directory belongs to a writer that crashed before
    // moving its files in — the whole tree is garbage
    fs.listStatus(root).foreach { st =>
      if (st.isDirectory && st.getPath.getName.startsWith(".staging-"))
        fs.delete(st.getPath, true)
    }
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
          // STEAL-RACE GUARD (r13 ADVICE): a contender that measured
          // staleness against the PREVIOUS holder's lock may delete the
          // file we just created and take it for itself. Re-read and
          // verify the lock still carries OUR token before proceeding —
          // if it was stolen out from under us, loop and contend again
          // instead of running as a second concurrent writer.
          val readBack =
            try {
              val in = fs.open(lock)
              try scala.io.Source.fromInputStream(in, "UTF-8").mkString
              finally in.close()
            } catch { case _: java.io.IOException => "" }
          if (readBack.startsWith(token + " ")) held = true
          else Thread.sleep(50)
        } catch {
          case _: java.io.IOException =>
            // stale-lease steal: measure, then re-check the lock is
            // STILL the one measured immediately before deleting — a
            // blind delete could collect a fresh lock another contender
            // created after our staleness probe
            val seen =
              try Some(fs.getFileStatus(lock).getModificationTime)
              catch { case _: java.io.IOException => None }
            val stale = seen.exists(m =>
              System.currentTimeMillis() - m > leaseMs)
            if (stale) {
              val still =
                try fs.getFileStatus(lock).getModificationTime == seen.get
                catch { case _: java.io.IOException => false }
              if (still) fs.delete(lock, false)
            }
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

  /** The shape a read() of this table produces from a writer's declared
    * schema: partition columns move LAST (parquet reads append them),
    * and every field turns nullable (parquet scans do not enforce
    * writer-side non-null flags). This is what the `#schema=` header
    * records — the writer's schema, Delta-style, never a footer probe.
    */
  private[etl] def readShape(
      schema: org.apache.spark.sql.types.StructType,
      parts: Seq[String]): org.apache.spark.sql.types.StructType = {
    val (p, d) = schema.fields.partition(f => parts.contains(f.name))
    val ordered = d ++ parts.flatMap(n => p.find(_.name == n))
    org.apache.spark.sql.types.StructType(
      ordered.map(_.copy(nullable = true)))
  }

  private def liveSchemaOf(spark: SparkSession, dir: String)
      : Option[org.apache.spark.sql.types.StructType] =
    liveManifestLines(spark, dir).flatMap(l => schemaOf(l.drop(1)))

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
                        files: Seq[String],
                        schema: Option[org.apache.spark.sql.types.StructType]
                          = None): DataFrame =
    if (files.nonEmpty) {
      // with the committed `#schema=` the scan never touches a footer
      // for planning, and files narrower than the live shape (written
      // before a schema evolution, carried over by reference) read
      // their missing columns as NULL — the mergeSchema contract
      val r = spark.read.option("basePath", dir)
      schema.fold(r)(r.schema).parquet(files.map(f => dir + "/" + f): _*)
    } else schema.orElse(storedSchema(spark, dir)) match {
      case Some(sch) => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], sch)
      // pre-header, pre-sidecar table: on-disk footers (throws only
      // when the directory holds no parquet at all — nothing to infer)
      case None => spark.read.parquet(dir).limit(0)
    }

  /** The live snapshot — exactly the committed file list, lock-free;
    * consistent even while a mutation swaps underneath.
    */
  def read(spark: SparkSession, dir: String): DataFrame =
    liveManifestLines(spark, dir) match {
      case Some(_ :: rest) =>
        loadFiles(spark, dir, rest.filterNot(_.startsWith("#")),
          schemaOf(rest))
      case _ => throw new IllegalArgumentException(
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
    val lines = readLines(fs, p)
    // the version's OWN committed schema: a readAt across a later
    // evolution keeps the shape this version was written with
    loadFiles(spark, dir, lines.drop(1).filterNot(_.startsWith("#")),
      schemaOf(lines))
  }

  // ------------------------------------------------------------------
  // writes
  // ------------------------------------------------------------------

  /** Append `df` as new data files and commit the next version: the new
    * files land first, the manifest flip publishes them atomically.
    * Returns the committed version.
    *
    * O(COMMIT), NOT O(TABLE) — the r13-verdict scale finding: each
    * commit writes into its own hidden `.staging-cm<version>-<uuid>/`
    * directory, lists ONLY that directory to discover its files, then
    * MOVES them (pure metadata renames, one per written file) into the
    * shared `data/` tree under a commit-prefixed name
    * (`data/date=2026-01-01/cm7-ab12cd34-part-...parquet`). Commit
    * metadata cost is therefore proportional to the files the commit
    * WROTE, never to the table's total file count — the pre-r14 code
    * listed the whole table before and after every write: several full
    * LIST storms per 1-row append on a 100k-file object-store table.
    * One shared `data/` root (rather than per-commit subdirectories
    * above the Hive dirs) is what keeps Spark's leaf-up partition
    * discovery seeing a SINGLE consistent base across commits, so
    * partition columns — and planning-time partition pruning — survive;
    * the commit identity rides the FILENAME prefix instead, which also
    * makes a crashed attempt's retry collision-free. The table root
    * stays O(live commits) entries (manifests + sidecars + `data/`), so
    * the manifest-recovery and history-prune listings of the root never
    * degrade with table size either.
    */
  private def appendCommit(spark: SparkSession, dir: String, df: DataFrame,
                           carryOver: Seq[String],
                           retired: Seq[String],
                           epoch: Option[(String, Long)] = None,
                           schemaJson: Option[String] = None,
                           retainOv: Option[Long] = None): Long = {
    val (fs, root) = fsOf(spark, dir)
    val version = readManifest(spark, dir).map(_._1).getOrElse(0L) + 1
    val sub = "cm" + version + "-" +
      java.util.UUID.randomUUID().toString.take(8)
    val staging = new org.apache.hadoop.fs.Path(root, ".staging-" + sub)
    val parts = partitioning(spark, dir)
    val writer = df.write.mode("append")
    (if (parts.nonEmpty) writer.partitionBy(parts: _*) else writer)
      .parquet(staging.toString)
    val newFiles = listDataFiles(spark, staging.toString).map { rel =>
      val segs = rel.split("/")
      val dstRel = ("data" +: segs.dropRight(1) :+
        (sub + "-" + segs.last)).mkString("/")
      val dst = new org.apache.hadoop.fs.Path(root, dstRel)
      fs.mkdirs(dst.getParent)
      if (!fs.rename(new org.apache.hadoop.fs.Path(staging, rel), dst))
        throw new java.io.IOException(
          s"commit move $sub/$rel -> $dstRel failed")
      dstRel
    }
    fs.delete(staging, true)
    // retirement stamps land BEFORE the manifest flip: the commit's
    // availability prune must see the retired files as still-pending
    // (else it would expire the immediately-previous version), and a
    // crash between the two leaves stamped entries whose files the old
    // live manifest still shields — held at replay, retried harmlessly.
    if (retired.nonEmpty) {
      val dueAt = version + effRetain(spark, retainOv)
      writePending(spark, dir,
        pendingEntries(spark, dir) ++ retired.map(r => s"$dueAt:$r"))
    }
    // data-skipping stats for the files this commit wrote — footer
    // reads bounded by the commit's own file count, Try-guarded: a
    // stats miss only costs future skipping, never the commit
    val newStats =
      if (!statsEnabled(spark)) Map.empty[String, String]
      else newFiles.flatMap(rel =>
        harvestStats(spark, dir, rel, df.schema).map(rel -> _)).toMap
    commitManifest(spark, dir, version, carryOver ++ newFiles, epoch,
      schemaJson, retainOv, newStats)
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
           partitionBy: Seq[String] = Seq.empty,
           retain: Option[Long] = None): Long =
    withLock(spark, dir, "init") {
      require(readManifest(spark, dir).isEmpty,
        s"$dir is already a versioned table")
      // r13 ADVICE: a directory already holding plain data files must
      // go through adopt() — init would commit a manifest EXCLUDING
      // them and a later vacuum would physically delete the user's
      // pre-existing dataset as orphans. (One full listing here is
      // fine: init runs once, on an empty-or-new destination.)
      require(listDataFiles(spark, dir).isEmpty,
        s"$dir already holds data files — adopt() snapshots an " +
          "existing directory; init() is for new destinations")
      writePartitioning(spark, dir, partitionBy)
      // the writer's declared schema becomes the committed `#schema=`
      // header (read shape: partition columns last, all nullable)
      val shape = readShape(df.schema, partitionBy)
      val v = appendCommit(spark, dir, df, Seq.empty, Seq.empty,
        schemaJson = Some(shape.json), retainOv = retain)
      // legacy sidecar kept in sync as a fallback shape
      scala.util.Try(writeSchema(spark, dir, shape))
      v
    }

  /** ADOPT an existing plain parquet directory: snapshot its current
    * listing as version 1 without rewriting a byte — the migration path
    * for destinations the pipeline already owns (the
    * [[graft.ops.Similarity]] bootstrapManifest discipline). For a
    * Hive-partitioned directory, pass its partition columns so later
    * commits keep the layout. The existing files are MOVED (metadata
    * renames, never copies) into the managed `data/` tree so they share
    * one partition-discovery base with every later commit's files — a
    * one-time O(files) pass, the same shape as Delta's CONVERT: adopt
    * pays the full walk once so no commit ever has to again.
    */
  def adopt(spark: SparkSession, dir: String,
            partitionBy: Seq[String] = Seq.empty,
            retain: Option[Long] = None): Long =
    withLock(spark, dir, "adopt") {
      require(readManifest(spark, dir).isEmpty,
        s"$dir is already a versioned table")
      writePartitioning(spark, dir, partitionBy)
      val (fs, root) = fsOf(spark, dir)
      val qRoot = fs.makeQualified(root)
      val formerParents = scala.collection.mutable.LinkedHashSet[String]()
      val adopted = listDataFiles(spark, dir).map { rel =>
        if (rel.startsWith("data/")) rel
        else {
          val dstRel = "data/" + rel
          val dst = new org.apache.hadoop.fs.Path(root, dstRel)
          fs.mkdirs(dst.getParent)
          if (!fs.rename(new org.apache.hadoop.fs.Path(root, rel), dst))
            throw new java.io.IOException(s"adopt move $rel failed")
          if (rel.contains("/"))
            formerParents += rel.substring(0, rel.lastIndexOf("/"))
          dstRel
        }
      }
      // fold away the now-empty former partition directories (deepest
      // first; delete(_, false) refuses non-empty dirs, so user files
      // are never at risk)
      formerParents.toSeq.sortBy(-_.length).foreach { relDir =>
        var p = new org.apache.hadoop.fs.Path(root, relDir)
        var more = true
        while (more && p != null && fs.makeQualified(p) != qRoot) {
          more =
            try fs.exists(p) && fs.listStatus(p).isEmpty && fs.delete(p, false)
            catch { case _: java.io.IOException => false }
          p = p.getParent
        }
      }
      commitManifest(spark, dir, 1L, adopted, retainOv = retain)
      // adopt has no writer schema to declare — infer one footer read
      // (the only schema probe the table will ever pay) and AMEND the
      // v1 manifest with the `#schema=` header so later commits carry
      // it; best-effort, a reader between the two writes just falls
      // back to footer inference
      scala.util.Try {
        val sch = readShape(read(spark, dir).schema, partitionBy)
        writeSchema(spark, dir, sch)
        liveManifestLines(spark, dir).foreach { lines =>
          val body = (lines.head +: (s"#schema=${sch.json}" +:
            lines.tail)).mkString("\n")
          writeAtomic(fs,
            new org.apache.hadoop.fs.Path(root, ManifestName + ".v1"), body)
          writeAtomic(fs,
            new org.apache.hadoop.fs.Path(root, ManifestName), body)
        }
      }
      1L
    }

  /** Align `df` to the table's committed `base` schema BY NAME:
    * reorders columns, casts base columns to their committed types, and
    * — only with `mergeSchema` — appends the source's NEW columns
    * (nullable, ahead of the partition columns) to produce the widened
    * target shape. Without `mergeSchema` a new source column fails fast
    * instead of being silently dropped (the pre-r14 behavior the r13
    * verdict called out); a source MISSING a base column fails in the
    * select (rows replace wholly — partial rows have no meaning here).
    */
  private def alignTo(spark: SparkSession, dir: String, df: DataFrame,
                      base: org.apache.spark.sql.types.StructType,
                      mergeSchema: Boolean)
      : (DataFrame, org.apache.spark.sql.types.StructType) = {
    val baseCols = base.fieldNames.toSet
    val newFields = df.schema.fields.filterNot(f => baseCols(f.name))
    if (newFields.nonEmpty && !mergeSchema)
      throw new IllegalArgumentException(
        s"source columns [${newFields.map(_.name).mkString(", ")}] are " +
          s"not in the table schema [${base.fieldNames.mkString(", ")}]" +
          " — pass mergeSchema = true to evolve the table")
    val target = readShape(
      org.apache.spark.sql.types.StructType(base.fields ++ newFields),
      partitioning(spark, dir))
    (df.select(target.fields.toIndexedSeq.map(f =>
      col(f.name).cast(f.dataType).as(f.name)): _*), target)
  }

  /** Append rows (the S6/S8 sink shape) as a new version. Columns align
    * by name to the committed schema; `mergeSchema = true` lets a
    * source carrying NEW columns widen the table — earlier files carry
    * over untouched and read their missing columns as NULL.
    */
  def append(spark: SparkSession, dir: String, df: DataFrame,
             mergeSchema: Boolean = false,
             retain: Option[Long] = None): Long =
    withLock(spark, dir, "append") {
      replayPending(spark, dir, retain)
      val live = readManifest(spark, dir).map(_._2).getOrElse(
        throw new IllegalArgumentException(s"$dir: init() first"))
      val base = liveSchemaOf(spark, dir)
        .getOrElse(loadFiles(spark, dir, live).schema)
      val (aligned, target) = alignTo(spark, dir, df, base, mergeSchema)
      appendCommit(spark, dir, aligned, live, Seq.empty,
        schemaJson = Some(target.json), retainOv = retain)
    }

  /** Replace the whole table content (the reference's pre-write-backup
    * overwrite, S12): old files retire into the calendar, previous
    * versions stay readable for the retention window. The table's
    * committed schema becomes `df`'s own (an overwrite is a full
    * re-declaration); [[readAt]] on earlier versions keeps their shape.
    */
  def overwrite(spark: SparkSession, dir: String, df: DataFrame,
                retain: Option[Long] = None): Long =
    withLock(spark, dir, "overwrite") {
      replayPending(spark, dir, retain)
      val live = readManifest(spark, dir).map(_._2).getOrElse(
        throw new IllegalArgumentException(s"$dir: init() first"))
      val shape = readShape(df.schema, partitioning(spark, dir))
      scala.util.Try(writeSchema(spark, dir, shape))
      appendCommit(spark, dir, df, Seq.empty, live,
        schemaJson = Some(shape.json), retainOv = retain)
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
                            epoch: Option[(String, Long)] = None,
                            mergeSchema: Boolean = false,
                            retainOv: Option[Long] = None,
                            probeKeys: Option[(Seq[String], DataFrame)]
                              = None): Long = {
    val lines = liveManifestLines(spark, dir).getOrElse(
      throw new IllegalArgumentException(s"$dir: init() first"))
    val live = lines.drop(1).filterNot(_.startsWith("#"))
    val base = schemaOf(lines.drop(1))
    val liveDf = loadFiles(spark, dir, live, base)
    // DATA SKIPPING (stats header notes): for a key-equality rewrite,
    // the touch probe scans only files whose stats range can overlap
    // the source keys — on a key-clustered table the probe reads about
    // as few files as the rewrite touches, instead of the whole table
    val probeFiles = probeKeys match {
      case Some((keys, srcKeys)) => statsCandidates(spark, dir, live,
        statsOf(lines.drop(1)), keys, srcKeys)
      case None => live
    }
    val (fs, root) = fsOf(spark, dir)
    // scheme-robust relativization: input_file_name() returns a URI
    // (possibly %-encoded, `file:///...`), manifest paths are raw and
    // root-relative — compare URI *paths*, not prefix strings (a
    // `file:/x` vs `file:///x` qualification mismatch would silently
    // touch zero files)
    val rootPath = fs.makeQualified(root).toUri.getPath
    val touchedAbs = touchRows(
      loadFiles(spark, dir, probeFiles, base)
        .withColumn("_vt_file", input_file_name()))
      .select("_vt_file").distinct().collect().map(_.getString(0))
    val touched = touchedAbs.map { f =>
      new java.net.URI(f).getPath.stripPrefix(rootPath).stripPrefix("/")
    }.toSeq.sorted
    val touchedSet = touched.toSet
    val carryOver = live.filterNot(touchedSet)
    // inserts aligned (by name, committed types) to the table schema in
    // EVERY branch — permuted or mistyped parquet files would poison
    // later reads; with mergeSchema the target widens by the source's
    // new columns and survivors read them as NULL
    val (aligned, target) = extra match {
      case Some(e) =>
        val (a, t) = alignTo(spark, dir, e,
          base.getOrElse(liveDf.schema), mergeSchema)
        (Some(a), t)
      case None => (None, base.getOrElse(liveDf.schema))
    }
    val rewritten =
      if (touched.isEmpty)
        aligned.getOrElse(loadFiles(spark, dir, Seq.empty, Some(target)))
      else {
        val kept = survivors(loadFiles(spark, dir, touched, Some(target)))
        aligned.map(kept.unionByName(_)).getOrElse(kept)
      }
    appendCommit(spark, dir, rewritten, carryOver, touched, epoch,
      schemaJson = Some(target.json), retainOv = retainOv)
  }

  /** MERGE (upsert): `src` rows replace matched live rows wholly (the
    * [[Upsert]] semantics — the reference updates every mapped column),
    * unmatched live rows persist, unmatched `src` rows insert. Only
    * files containing matched keys are rewritten.
    */
  def merge(spark: SparkSession, dir: String, src: DataFrame,
            keys: Seq[String], mergeSchema: Boolean = false,
            retain: Option[Long] = None): Long =
    withLock(spark, dir, "merge") {
      replayPending(spark, dir, retain)
      val srcKeys = src.select(keys.map(col): _*).distinct()
      prunedRewrite(spark, dir,
        touchRows = _.join(srcKeys, keys, "left_semi"),
        survivors = _.join(srcKeys, keys, "left_anti"),
        extra = Some(src), mergeSchema = mergeSchema, retainOv = retain,
        probeKeys = Some((keys, srcKeys)))
    }

  /** DELETE WHERE `cond` (S10): only files holding a matching row are
    * rewritten; survivors are the rows where `cond` is not TRUE (SQL
    * DELETE semantics — a NULL predicate keeps the row).
    */
  def deleteWhere(spark: SparkSession, dir: String, cond: Column,
                  retain: Option[Long] = None): Long =
    withLock(spark, dir, "delete") {
      replayPending(spark, dir, retain)
      prunedRewrite(spark, dir,
        touchRows = _.filter(cond),
        survivors = _.filter(!coalesce(cond, lit(false))),
        extra = None, retainOv = retain)
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
                      parentKeys: Seq[String],
                      mergeSchema: Boolean = false,
                      retain: Option[Long] = None): Long =
    withLock(spark, dir, "replace-children") {
      replayPending(spark, dir, retain)
      val parents = recomputed.select(parentKeys.map(col): _*).distinct()
      prunedRewrite(spark, dir,
        touchRows = _.join(parents, parentKeys, "left_semi"),
        survivors = _.join(parents, parentKeys, "left_anti"),
        extra = Some(recomputed), mergeSchema = mergeSchema,
        retainOv = retain, probeKeys = Some((parentKeys, parents)))
    }

  /** SMALL-FILE COMPACTION as a versioned commit: rewrite the live
    * file set into ~`targetFiles` files (per partition directory when
    * the table is partitioned) and swap manifests — readers keep their
    * snapshot, old files retire into the calendar. The maintenance op a
    * streaming-fed destination runs on a schedule: micro-batch appends
    * accumulate one small file per batch-task, and at 100 TB the FILE
    * COUNT (listing, footers, task scheduling) becomes the bottleneck
    * before the bytes do. No-op (returns the current version) when the
    * live set is already within target — UNLESS `clusterBy` is given:
    * a clustering request always rewrites.
    *
    * `clusterBy` = the Delta OPTIMIZE ZORDER analog, and data
    * skipping's natural feeder: range-repartition + sort the rewrite by
    * the given key columns, so each output file owns a tight, mostly
    * disjoint key range and the per-file `#stats=` min/max the commit
    * harvests make later [[merge]] probes skip all but the overlapping
    * files. An unclustered table's per-file ranges each span the whole
    * key domain and skipping can prune nothing — clustering is what
    * turns the stats on. (Multi-column clusterBy range-partitions on
    * the leading column and sorts within files by all of them —
    * hierarchical locality; a space-filling-curve interleave is
    * [[graft.ops.Bucketing]]'s z-order, composable by clustering on a
    * precomputed z-value column.)
    */
  def compact(spark: SparkSession, dir: String,
              targetFiles: Int = 1,
              retain: Option[Long] = None,
              clusterBy: Seq[String] = Seq.empty): Long =
    withLock(spark, dir, "compact") {
      replayPending(spark, dir, retain)
      val (version, live) = readManifest(spark, dir).getOrElse(
        throw new IllegalArgumentException(s"$dir: init() first"))
      val parts = partitioning(spark, dir)
      val threshold = targetFiles * math.max(1,
        if (parts.isEmpty) 1
        else live.map(_.split("/").dropRight(1).mkString("/"))
          .distinct.size)
      if (live.size <= threshold && clusterBy.isEmpty) version
      else {
        val liveDf = loadFiles(spark, dir, live, liveSchemaOf(spark, dir))
        val rewritten = (parts, clusterBy) match {
          case (Nil, Nil) => liveDf.repartition(targetFiles)
          case (Nil, ks) => liveDf
            .repartitionByRange(math.max(1, targetFiles),
              ks.map(col): _*)
            .sortWithinPartitions(ks.map(col): _*)
          // cluster by partition value so each task holds whole
          // partitions → targetFiles-ish files per directory, never a
          // per-task file in every directory
          case (ps, Nil) => liveDf.repartition(
            math.max(targetFiles, spark.sparkContext.defaultParallelism),
            ps.map(col): _*)
          // partitioned + clustered: partition columns lead the range
          // split so files stay whole-partition, clustering keys give
          // the in-partition locality
          case (ps, ks) =>
            val cols = (ps ++ ks.filterNot(ps.contains)).map(col)
            liveDf.repartitionByRange(
              math.max(targetFiles, spark.sparkContext.defaultParallelism),
              cols: _*).sortWithinPartitions(cols: _*)
        }
        appendCommit(spark, dir, rewritten, Seq.empty, live,
          retainOv = retain)
      }
    }

  private val StreamIdOk = "^[A-Za-z0-9._-]+$".r

  private def requireStreamId(streamId: String): Unit =
    require(StreamIdOk.findFirstIn(streamId).isDefined,
      s"streamId '$streamId' must match [A-Za-z0-9._-]+ (it is " +
        "embedded in a line-oriented manifest header)")

  /** EXACTLY-ONCE streaming append: the foreachBatch body for a
    * versioned destination. The micro-batch's id is committed INTO the
    * manifest (`#epoch.<streamId>=` header) by the same atomic rename
    * that publishes its files, so a batch REPLAY after a crash —
    * Structured Streaming's at-least-once contract — is recognized
    * (`batchId <= lastStreamEpoch` FOR THIS STREAM IDENTITY) and
    * skipped whole: the data landed iff the manifest flipped, there is
    * no half state. Idempotence is SCOPED by `streamId` (r13 ADVICE,
    * Delta's txnAppId): pass a stable identity per logical stream —
    * e.g. the query name — so a second stream writing to the same
    * table, or a pipeline restarted with a fresh checkpoint under a
    * NEW identity, is never mistaken for a replay. Replays of a batch
    * that died BEFORE its flip re-append cleanly from a fresh staging
    * directory; the dead attempt's files stay unreferenced until
    * [[vacuum]] collects them.
    *
    *   stream.writeStream.foreachBatch { (b, id) =>
    *     VersionedTable.appendStreamBatch(spark, dir, b, id, "myquery") }
    */
  def appendStreamBatch(spark: SparkSession, dir: String, df: DataFrame,
                        batchId: Long, streamId: String = "default",
                        mergeSchema: Boolean = false,
                        retain: Option[Long] = None): Long =
    withLock(spark, dir, "stream-append") {
      requireStreamId(streamId)
      val last = lastStreamEpoch(spark, dir, streamId)
      if (batchId <= last)
        readManifest(spark, dir).map(_._1).getOrElse(0L) // replay: no-op
      else {
        replayPending(spark, dir, retain)
        val live = readManifest(spark, dir).map(_._2).getOrElse(
          throw new IllegalArgumentException(s"$dir: init() first"))
        val baseSch = liveSchemaOf(spark, dir)
          .getOrElse(loadFiles(spark, dir, live).schema)
        val (aligned, target) = alignTo(spark, dir, df, baseSch, mergeSchema)
        appendCommit(spark, dir, aligned, live, Seq.empty,
          Some((streamId, batchId)), Some(target.json), retain)
      }
    }

  /** [[appendStreamBatch]]'s MERGE sibling: upsert the micro-batch on
    * `keys` with the same per-stream manifest-epoch idempotence — the
    * streaming CDC-apply shape (reference: the row-cursor upsert loop
    * of sdk/migrate_assures.php, fed by a stream instead of a cursor).
    */
  def mergeStreamBatch(spark: SparkSession, dir: String, df: DataFrame,
                       keys: Seq[String], batchId: Long,
                       streamId: String = "default",
                       mergeSchema: Boolean = false,
                       retain: Option[Long] = None): Long =
    withLock(spark, dir, "stream-merge") {
      requireStreamId(streamId)
      val last = lastStreamEpoch(spark, dir, streamId)
      if (batchId <= last)
        readManifest(spark, dir).map(_._1).getOrElse(0L)
      else {
        replayPending(spark, dir, retain)
        val srcKeys = df.select(keys.map(col): _*).distinct()
        prunedRewrite(spark, dir,
          touchRows = _.join(srcKeys, keys, "left_semi"),
          survivors = _.join(srcKeys, keys, "left_anti"),
          extra = Some(df), epoch = Some((streamId, batchId)),
          mergeSchema = mergeSchema, retainOv = retain,
          probeKeys = Some((keys, srcKeys)))
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
    def linesAt(v: Long): List[String] = {
      val (fs, root) = fsOf(spark, dir)
      val p = new org.apache.hadoop.fs.Path(root, ManifestName + ".v" + v)
      val committed = readManifest(spark, dir).exists(v <= _._1)
      if (!fs.exists(p) || !committed)
        throw new IllegalArgumentException(
          s"table version $v not retained under $dir " +
            s"(retained: ${versions(spark, dir).mkString(", ")})")
      readLines(fs, p)
    }
    val toLines = linesAt(toV)
    val from = linesAt(fromV).drop(1).filterNot(_.startsWith("#")).toSet
    val to = toLines.drop(1).filterNot(_.startsWith("#")).toSet
    // both sides read under toV's schema (the Delta CDF convention):
    // across an evolution, pre-images carry NULL for columns that did
    // not exist yet
    val sch = schemaOf(toLines)
    val before = loadFiles(spark, dir, (from -- to).toSeq.sorted, sch)
    val after = loadFiles(spark, dir, (to -- from).toSeq.sorted, sch)
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

  /** Standalone deferred-delete replay + orphan sweep — the maintenance
    * entry point a scheduler calls. Mutations replay the due-delete
    * calendar themselves (O(pending)), but the orphan sweep's full
    * directory walk lives ONLY here (see [[sweepOrphans]]).
    * Returns the physically deleted relative paths.
    */
  def vacuum(spark: SparkSession, dir: String,
             retain: Option[Long] = None): Seq[String] =
    withLock(spark, dir, "vacuum") {
      val deleted = replayPending(spark, dir, retain)
      sweepOrphans(spark, dir)
      deleted
    }

  /** STREAMING CHANGE-DATA-FEED CONSUMER (r13-verdict item 4): advance
    * `consumerId`'s high-water mark over `srcDir`'s committed versions,
    * appending the span's [[changesBetween]] rows into the `dstDir`
    * change-log table — EXACTLY-ONCE end to end, with no consumer-side
    * state file: the high-water mark IS the destination's per-stream
    * epoch (`#epoch.<consumerId>=` = last source version consumed),
    * committed by the same atomic rename that publishes the change
    * rows. A crash after the append but before anything else changes
    * nothing (there is nothing else); a replayed call sees
    * `live <= mark` and no-ops; a call that raced a source commit
    * simply consumes the longer span next time. Cost per call is ∝ the
    * span's churn (manifest-diff pruning), never source table size.
    * Downstream schema = source columns + `_change_type`; feeds across
    * a source schema evolution widen the log via mergeSchema.
    *
    * `startAt` seeds the first span's lower bound (default 1 = the
    * source's init version: consume everything after initial content).
    * Returns the destination's committed version (unchanged on no-op).
    */
  def followChanges(spark: SparkSession, srcDir: String, dstDir: String,
                    keys: Seq[String], consumerId: String,
                    startAt: Long = 1L,
                    retain: Option[Long] = None): Long = {
    val lastSeen = math.max(lastStreamEpoch(spark, dstDir, consumerId),
      startAt)
    val live = currentVersion(spark, srcDir)
    if (live <= lastSeen)
      currentVersion(spark, dstDir)
    else
      appendStreamBatch(spark, dstDir,
        changesBetween(spark, srcDir, lastSeen, live, keys),
        batchId = live, streamId = consumerId, mergeSchema = true,
        retain = retain)
  }

  /** RESTORE (the Delta RESTORE analog): commit a NEW version whose
    * content is exactly retained version `version` — every data file
    * re-referenced by the manifest, nothing copied or rewritten, O(1)
    * data movement. History between stays retained and auditable; the
    * live files the restore displaces retire into the deferred-delete
    * calendar like any other rewrite. This is the rollback primitive
    * [[TableGroup]] uses to heal a member table that ran ahead of a
    * crashed multi-table commit. Epoch headers carry FORWARD untouched:
    * a stream batch that landed in the rolled-back span stays "seen",
    * so exactly-once replay protection survives the rollback (re-feed
    * rolled-back data under a new batch id / stream identity, never by
    * replay). The restored version's `#schema=` becomes live again.
    */
  def restore(spark: SparkSession, dir: String, version: Long,
              retain: Option[Long] = None): Long =
    withLock(spark, dir, "restore") {
      replayPending(spark, dir, retain)
      val (fs, root) = fsOf(spark, dir)
      val p = new org.apache.hadoop.fs.Path(root,
        ManifestName + ".v" + version)
      val cur = readManifest(spark, dir).getOrElse(
        throw new IllegalArgumentException(s"$dir: init() first"))
      if (!fs.exists(p) || version > cur._1)
        throw new IllegalArgumentException(
          s"table version $version not retained under $dir " +
            s"(retained: ${versions(spark, dir).mkString(", ")})")
      if (version == cur._1) cur._1
      else {
        val lines = readLines(fs, p)
        val files = lines.drop(1).filterNot(_.startsWith("#"))
        val newV = cur._1 + 1
        val restoredSet = files.toSet
        val retired = cur._2.filterNot(restoredSet)
        if (retired.nonEmpty) {
          val dueAt = newV + effRetain(spark, retain)
          writePending(spark, dir,
            pendingEntries(spark, dir) ++ retired.map(r => s"$dueAt:$r"))
        }
        commitManifest(spark, dir, newV, files,
          schemaJson = schemaOf(lines).map(_.json), retainOv = retain,
          newStats = statsOf(lines)) // restored files keep their stats
        newV
      }
    }
}
