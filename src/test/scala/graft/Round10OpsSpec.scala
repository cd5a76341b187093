package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Round-10 additions: IVF index compaction (n25) and its scheduling
  * audit (n26). The oracle gates prove result equality; these specs pin
  * the PHYSICAL claims the gates cannot see — that compaction rewrites
  * only the affected cell partitions and that the dead-fraction math is
  * what the Scaladoc promises.
  */
class Round10OpsSpec extends SparkSpec {
  import spark.implicits._

  test("ivfDeadFraction: counts, basis points, threshold verdict") {
    // cell 1: 4 rows, 1 dead (2500 bp); cell 2: 3 rows, 0 dead;
    // cell 3: 2 rows, 2 dead (10000 bp)
    val cells = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (5L, 2L), (6L, 2L), (7L, 2L),
      (8L, 3L), (9L, 3L))
      .toDF("c_id", "c_cell")
      .withColumn("c_vec", array(lit(1.0f)))
      .withColumn("c_norm", lit(1L))
    val tombs = Seq(2L, 8L, 9L).toDF("t_id")
    val out = Similarity.ivfDeadFraction(cells, tombs, "t_id",
        thresholdBp = 500L)
      .orderBy("cell")
      .select("cell", "n_rows", "n_dead", "dead_bp", "compact")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(out.toSeq === Seq(
      (1L, 4L, 1L, 2500L, true),
      (2L, 3L, 0L, 0L, false),
      (3L, 2L, 2L, 10000L, true)))
  }

  test("ivfCompact rewrites ONLY the affected cell partitions and " +
    "removes exactly the tombstoned rows") {
    val tmp = Files.createTempDirectory("graft_compact_spec").toString
    // 3 cells; tombstones touch cells 1 and 3 only — cell 2 must come
    // through the compaction with its files BYTE-UNTOUCHED
    val cells = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L),
      (5L, 2L), (6L, 2L),
      (8L, 3L), (9L, 3L))
      .toDF("c_id", "c_cell")
      .withColumn("c_vec", array(lit(1.0f)))
      .withColumn("c_norm", lit(1L))
    cells.write.mode("overwrite").partitionBy("c_cell")
      .parquet(tmp + "/cells")
    def cell2Files(): Map[String, Long] = {
      val dir = Paths.get(tmp + "/cells/c_cell=2")
      import scala.jdk.CollectionConverters._
      Files.list(dir).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(p => p.getFileName.toString ->
          Files.getLastModifiedTime(p).toMillis)
        .toMap
    }
    val before = cell2Files()
    assert(before.nonEmpty)
    val tombs = Seq(2L, 9L).toDF("t_id")
    val affected = Similarity.ivfCompact(spark, tmp + "/cells", tombs,
      "t_id", tmp + "/stage")
    assert(affected.toSet === Set(1L, 3L))
    // untouched partition: same files, same modification times
    assert(cell2Files() === before)
    // survivors through the READER contract (the manifest): exactly the
    // non-tombstoned rows. The replaced files stay on disk one grace
    // cycle for pinned readers, so a RAW directory read still shows the
    // dead rows here — that is the r11 snapshot-isolation design, not a
    // leak.
    val expected = Set((1L, 1L), (3L, 1L), (5L, 2L), (6L, 2L), (8L, 3L))
    def openedRows(): Set[(Long, Long)] =
      Similarity.ivfOpenIndex(spark, tmp + "/cells")
        .select(col("c_id"), col("c_cell"))
        .as[(Long, Long)].collect().toSet
    assert(openedRows() === expected)
    val rawAfterSwap = spark.read.parquet(tmp + "/cells")
      .select(col("c_id"), col("c_cell").cast("long"))
      .as[(Long, Long)].collect().toSet
    assert(rawAfterSwap === expected ++ Set((2L, 1L), (9L, 3L)))
    // the NEXT maintenance op replays the deferred deletes: physical
    // directory and manifest agree again, cell 2 still byte-untouched
    Similarity.ivfCompact(spark, tmp + "/cells",
      Seq.empty[Long].toDF("t_id"), "t_id", tmp + "/stage2")
    assert(cell2Files() === before)
    val rawAfterGrace = spark.read.parquet(tmp + "/cells")
      .select(col("c_id"), col("c_cell").cast("long"))
      .as[(Long, Long)].collect().toSet
    assert(rawAfterGrace === expected)
    assert(openedRows() === expected)
  }

  test("ivfQueryIndexPruned equals ivfQueryIndex and partition-prunes " +
    "the cell scan") {
    val tmp = Files.createTempDirectory("graft_pruned_spec").toString
    val emb = Tables.load(spark, sf, "embeddings")
    val (cells, cents) = Similarity.ivfBuildIndex(
      emb, "vec_id", "embedding", nCells = 16)
    cells.repartition(col("c_cell"))
      .write.mode("overwrite").partitionBy("c_cell")
      .parquet(tmp + "/cells")
    cents.write.mode("overwrite").parquet(tmp + "/cents")
    val idx = spark.read.parquet(tmp + "/cells")
      .withColumn("c_cell", col("c_cell").cast("long"))
    val cts = spark.read.parquet(tmp + "/cents")
    val queries = emb.filter(col("vec_id") < 8)
    val plain = Similarity.ivfQueryIndex(idx, cts, queries,
      "vec_id", "embedding", k = 5, nProbe = 2)
    val pruned = Similarity.ivfQueryIndexPruned(idx, cts, queries,
      "vec_id", "embedding", k = 5, nProbe = 2)
    assert(pruned.collect().toSet === plain.collect().toSet)
    // the probed-cell isin lands in the scan's PartitionFilters —
    // serving opens ONLY the probed cells' files
    val explain = pruned.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val pf = explain.linesIterator
      .filter(_.trim.startsWith("PartitionFilters:")).toSeq
    assert(pf.exists(l => l.contains("c_cell") && !l.contains("[]")),
      s"no non-empty PartitionFilters on the cell scan:\n$explain")
  }

  test("ivfCompact deletes a FULLY-tombstoned cell's partition " +
    "instead of resurrecting its rows") {
    // r10 code-review finding: a dynamic partition overwrite replaces
    // only partitions PRESENT in the staged data — a zero-survivor
    // cell would silently keep its old files. Cell 2 dies entirely;
    // cell 1 loses one row; cell 3 is untouched.
    val tmp = Files.createTempDirectory("graft_compact_dead").toString
    Seq((1L, 1L), (2L, 1L), (5L, 2L), (6L, 2L), (8L, 3L))
      .toDF("c_id", "c_cell")
      .withColumn("c_vec", array(lit(1.0f)))
      .withColumn("c_norm", lit(1L))
      .write.mode("overwrite").partitionBy("c_cell")
      .parquet(tmp + "/cells")
    val tombs = Seq(2L, 5L, 6L).toDF("t_id")
    val affected = Similarity.ivfCompact(spark, tmp + "/cells", tombs,
      "t_id", tmp + "/stage")
    assert(affected.toSet === Set(1L, 2L))
    // the manifest (the reader contract) excludes the dead cell at
    // once; its directory survives one grace cycle for pinned readers
    // and is physically removed when the NEXT maintenance op replays
    // the deferred deletes
    val after = Similarity.ivfOpenIndex(spark, tmp + "/cells")
      .select(col("c_id"), col("c_cell"))
      .as[(Long, Long)].collect().toSet
    assert(after === Set((1L, 1L), (8L, 3L)))
    assert(Files.exists(Paths.get(tmp + "/cells/c_cell=2")))
    // the degenerate ALL-dead case: every affected cell empties —
    // nothing stages (the old code crashed reading an empty stage).
    // This second op also replays the first op's deferred deletes, so
    // cell 2's directory goes now …
    val affected2 = Similarity.ivfCompact(spark, tmp + "/cells",
      Seq(1L, 8L).toDF("t_id"), "t_id", tmp + "/stage2")
    assert(affected2.toSet === Set(1L, 3L))
    assert(!Files.exists(Paths.get(tmp + "/cells/c_cell=2")))
    assert(Similarity.ivfOpenIndex(spark, tmp + "/cells").isEmpty)
    // … and a third replays the second's: nothing is left on disk
    Similarity.ivfCompact(spark, tmp + "/cells",
      Seq.empty[Long].toDF("t_id"), "t_id", tmp + "/stage3")
    assert(!Files.exists(Paths.get(tmp + "/cells/c_cell=1")))
    assert(!Files.exists(Paths.get(tmp + "/cells/c_cell=3")))
  }

  test("ivfDeadFraction and ivfCompact tolerate duplicate tombstone " +
    "ids (a replayed delete changes nothing)") {
    val cells = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L))
      .toDF("c_id", "c_cell")
      .withColumn("c_vec", array(lit(1.0f)))
      .withColumn("c_norm", lit(1L))
    // one dead row, its tombstone replayed three times
    val tombs = Seq(2L, 2L, 2L).toDF("t_id")
    val out = Similarity.ivfDeadFraction(cells, tombs, "t_id", 500L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.toSeq === Seq((1L, 4L, 1L, 2500L)))
  }

  test("ivfCompact with no matching tombstones is a no-op") {
    val tmp = Files.createTempDirectory("graft_compact_noop").toString
    Seq((1L, 1L), (2L, 2L)).toDF("c_id", "c_cell")
      .withColumn("c_vec", array(lit(1.0f)))
      .withColumn("c_norm", lit(1L))
      .write.mode("overwrite").partitionBy("c_cell")
      .parquet(tmp + "/cells")
    val affected = Similarity.ivfCompact(spark, tmp + "/cells",
      Seq(99L).toDF("t_id"), "t_id", tmp + "/stage")
    assert(affected.isEmpty)
    assert(spark.read.parquet(tmp + "/cells").count() === 2L)
  }
}
