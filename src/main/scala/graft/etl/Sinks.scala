package graft.etl

import org.apache.spark.sql.DataFrame

/** Sink writers — set-based replacements for the reference's row/batch
  * INSERT paths (reference: sdk/lib/db.php:220-274 — single-row named-param
  * INSERT and one multi-row batched INSERT per task; sdk/src/SQLTable.php:28-36).
  *
  * Spark has no row-at-a-time write; every sink is a partitioned bulk write
  * with the job-commit protocol supplying the atomicity the reference got
  * from transactions (sdk/migrate_employeur.php:196-219). Returns the row
  * count, mirroring the reference's affected-row reporting.
  */
object Sinks {

  def appendParquet(df: DataFrame, path: String): Long =
    counted(df) { d => d.write.mode("append").parquet(path) }

  def overwriteParquet(df: DataFrame, path: String): Long =
    counted(df) { d => d.write.mode("overwrite").parquet(path) }

  /** Hive-style partitioned layout — the 100 TB table organization: queries
    * filtering on the partition columns prune whole directories at planning
    * time (`PartitionFilters` in the scan; asserted in PlanSpec). Choose
    * low-cardinality columns (date, region, status) — one directory per
    * value per write.
    */
  def partitionedParquet(df: DataFrame, path: String,
                         partitionCols: Seq[String]): Long =
    counted(df) { d =>
      d.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
    }

  /** Bucketed managed table: rows hash-partitioned into a fixed bucket
    * count on the join/aggregation keys AT WRITE TIME, so later equi-joins
    * and aggregations on those keys skip their Exchange entirely (asserted
    * in PlanSpec). The 100 TB pattern for fact-to-fact joins repeated
    * across many queries: pay the shuffle once when the table lands, never
    * again. Requires the session catalog (saveAsTable).
    */
  def bucketedTable(df: DataFrame, table: String, buckets: Int,
                    keys: Seq[String]): Long =
    counted(df) { d =>
      d.write.mode("overwrite")
        .bucketBy(buckets, keys.head, keys.tail: _*)
        .sortBy(keys.head, keys.tail: _*)
        .saveAsTable(table)
    }

  def csv(df: DataFrame, path: String, header: Boolean = true): Long =
    counted(df) { d =>
      d.write.mode("overwrite").option("header", header.toString).csv(path)
    }

  /** JDBC append — `batchsize` replaces the reference's hand-rolled
    * multi-row INSERT batching (sdk/lib/db.php:250-274).
    */
  def jdbc(df: DataFrame, url: String, table: String,
           options: Map[String, String] = Map.empty): Long =
    counted(df) { d =>
      d.write.format("jdbc").mode("append")
        .option("url", url).option("dbtable", table)
        .option("batchsize", "10000").options(options).save()
    }

  /** Small-file compaction: rewrite a parquet directory into files of
    * roughly `targetFileMB` each. Streaming/append pipelines accumulate
    * small files (every micro-batch/task writes its own); at 100 TB the
    * file count itself becomes the bottleneck (listing, footer reads, task
    * scheduling). Rewrites via a staging directory so a crash mid-compact
    * never destroys the source data.
    */
  def compactParquet(spark: org.apache.spark.sql.SparkSession, path: String,
                     targetFileMB: Int = 128): Long = {
    val df = spark.read.parquet(path)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val files = math.max(1,
      (bytes / (targetFileMB * 1024L * 1024L)).toInt)
    val staging = path + "__compact_staging"
    val n = counted(df.repartition(files)) {
      _.write.mode("overwrite").parquet(staging)
    }
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val target = new org.apache.hadoop.fs.Path(path)
    fs.delete(target, true)
    fs.rename(new org.apache.hadoop.fs.Path(staging), target)
    n
  }

  /** Count once via cache so write + count don't double-scan the plan (the
    * reference paid exactly that double-scan with `iterator_count` —
    * sdk/migrate_assures.php:405).
    */
  private def counted(df: DataFrame)(write: DataFrame => Unit): Long = {
    val cached = df.cache()
    try { write(cached); cached.count() }
    finally cached.unpersist()
  }
}
