package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Source readers — the Spark analogue of the reference's `SQLTable`
  * scan-with-pushdown-by-construction (reference: sdk/src/SQLTable.php:38-50
  * bakes the column list and optional raw-SQL WHERE into its SELECT).
  *
  * Here the projection (`columns`) and predicate (`where`) are declared on
  * the lazy scan and Catalyst pushes both into the data source: parquet gets
  * `PushedFilters`/`ReadSchema` pruning, JDBC gets server-side WHERE — the
  * same effect the reference achieved by string-building SQL, but optimizer-
  * verified.
  */
object Sources {

  /** Scan with optional projection and raw-SQL predicate, the reference's
    * `SELECT $columns FROM $table WHERE $query` contract. `where` is parsed
    * by `expr`, failing fast at plan time like etl.php's config validation.
    */
  def table(spark: SparkSession, dir: String, name: String,
            columns: Seq[String] = Nil,
            where: Option[String] = None): DataFrame = {
    var df = graft.Tables.load(spark, dir, name)
    for (w <- where) df = df.filter(expr(w))
    if (columns.nonEmpty) df = df.select(columns.head, columns.tail: _*)
    df
  }

  /** Line-oriented file source (reference: sdk/src/IO/ReadWriter.php:29-76 —
    * `fopen`-based line iterator; byte-range reads map to `binaryFile`).
    */
  def textFile(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  def csv(spark: SparkSession, path: String,
          header: Boolean = true): DataFrame =
    spark.read.option("header", header.toString).csv(path)

  def jdbc(spark: SparkSession, url: String, dbtable: String,
           options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", dbtable)
      .options(options).load()
}
