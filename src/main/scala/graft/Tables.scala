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
    // The events table stores TIMESTAMP(NANOS) which Spark's vectorized
    // parquet reader rejects; read nanos as long and convert to the engine's
    // microsecond TimestampType.
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      // Integral `div`, NOT `/`: Column./ is double division, and nanos
      // epochs (~1.7e18) exceed a double's 2^53 integer range — the
      // truncated microsecond would round up by 1 on roughly half the rows
      // (DuckDB's epoch_us floors exactly).
      raw.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every table as a temp view so `spark.sql` works against the
    * same names the DuckDB oracle uses.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
