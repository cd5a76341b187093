package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver testdata layout: one parquet file per table under a
  * scale-factor directory (see /root/repo/TESTDATA.md). Reads are lazy scans —
  * the Spark analogue of the reference's cursor-based `SQLTable::all`
  * (reference: sdk/src/SQLTable.php:38-50).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // The events table's `ts` encoding has varied across testdata
    // generations: TIMESTAMP(NANOS) (which Spark's vectorized reader
    // rejects — read nanos as long), plain TIMESTAMP_NTZ micros, or an
    // already-session-zoned TIMESTAMP. Normalize all three to the engine's
    // microsecond TimestampType so every downstream query sees one type.
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeEventTs(spark.read.parquet(s"$dir/$name.parquet"))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Coerce an events frame's `ts` to microsecond TimestampType regardless
    * of the on-disk encoding. With the session timezone pinned to UTC the
    * NTZ→TZ cast is instant-preserving, matching DuckDB's `epoch_us(ts)`
    * on the same file.
    */
  def normalizeEventTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      // Integral `div`, NOT `/`: Column./ is double division, and nanos
      // epochs (~1.7e18) exceed a double's 2^53 integer range — the
      // truncated microsecond would round up by 1 on roughly half the rows
      // (DuckDB's epoch_us floors exactly).
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** Register every table as a temp view so `spark.sql` works against the
    * same names the DuckDB oracle uses.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
