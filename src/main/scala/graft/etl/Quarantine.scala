package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Failed-row accounting as a set operation — the reference collects
  * per-row failures into retry queues and error logs
  * (reference: sdk/migrate_assures.php:419-456 failed-row retry;
  * sdk/migrate_employeur.php:213-228; orphan log lines in
  * sdk/migrate_enfants.php:119-121).
  *
  * In a set-based engine rows don't fail imperatively — they fail
  * validation rules. `split` evaluates named rules once over the frame and
  * partitions it into (valid, quarantined-with-reasons); the quarantine
  * frame is the retry queue (re-run the pipeline on it after fixing data)
  * and the error log (reasons column) in one.
  *
  * Scale note: one pass, no shuffle — the rules are projected as boolean
  * columns and both outputs are filters over the same (cached) frame.
  */
object Quarantine {

  /** @param rules (ruleName, predicate) — a row is valid iff ALL
    *              predicates hold; failing rule names are collected.
    * @return (valid rows, quarantined rows + `quarantine_reasons` array)
    */
  def split(df: DataFrame,
            rules: Seq[(String, Column)]): (DataFrame, DataFrame) = {
    val reasons = array_compact(array(rules.map { case (name, pred) =>
      when(!coalesce(pred, lit(false)), lit(name))
    }: _*))
    val tagged = df.withColumn("quarantine_reasons", reasons).cache()
    val valid = tagged.filter(size(col("quarantine_reasons")) === 0)
      .drop("quarantine_reasons")
    val bad = tagged.filter(size(col("quarantine_reasons")) > 0)
    (valid, bad)
  }
}
