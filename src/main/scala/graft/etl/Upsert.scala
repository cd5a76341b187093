package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Set-based upsert: the reference probes the destination by key per row and
  * branches UPDATE vs INSERT (`upsert_registrant_policy_holder`, and the
  * whole policy-holder update-vs-insert branch — reference:
  * sdk/migrate_assures.php:185-203, 239-352). As a set operation this is
  * MERGE: matched destination rows are replaced by the source row, unmatched
  * destination rows are kept, unmatched source rows are inserted.
  *
  * Implemented as `source ∪ (dest ⟕anti source)` — one anti-join plus a
  * union, no full-outer join needed when the source row wholly replaces the
  * matched destination row (the reference updates every mapped column, so it
  * does). Column sets must match; `merge` aligns by name.
  *
  * Scale note: the anti-join shuffles on the merge key only; with a small
  * source batch Spark broadcasts the source key set. At 100 TB this is the
  * same plan a Delta/Iceberg MERGE produces for full-row updates.
  */
object Upsert {

  /** Merge `src` into `dst` on `keys`. If `src` holds duplicate keys, the
    * first by `orderCol` wins (reference processes rows in cursor order).
    */
  def apply(src: DataFrame, dst: DataFrame, keys: Seq[String],
            orderCol: Option[String] = None): DataFrame = {
    val srcDedup = orderCol match {
      case Some(o) =>
        val w = Window.partitionBy(keys.map(col): _*).orderBy(col(o))
        src.withColumn("__graft_rn", row_number().over(w))
          .filter(col("__graft_rn") === 1).drop("__graft_rn")
      case None => src.dropDuplicates(keys)
    }
    val aligned = srcDedup.select(dst.columns.map(col).toIndexedSeq: _*)
    dst.join(srcDedup.select(keys.map(col): _*).distinct(), keys, "left_anti")
      .unionByName(aligned)
  }

  /** Delete-then-insert children (reference: sdk/migrate_assures.php:205-227
    * deletes `ass_registrant_policy_holders` rows for a parent key, then
    * re-inserts the recomputed set). Set form: drop all destination rows
    * whose parent key appears in the recomputed set, then append the
    * recomputed rows.
    */
  def replaceChildren(dst: DataFrame, recomputed: DataFrame,
                      parentKeys: Seq[String]): DataFrame = {
    val parents = recomputed.select(parentKeys.map(col): _*).distinct()
    dst.join(parents, parentKeys, "left_anti")
      .unionByName(recomputed.select(dst.columns.map(col).toIndexedSeq: _*))
  }
}
