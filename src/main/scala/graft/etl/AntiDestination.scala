package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Set-based replacement for the reference's per-row destination existence
  * probe (`ReadOnlyTable::exists` — reference: sdk/src/SQLTable.php:52-79,
  * called once per candidate row per unique column from
  * sdk/src/ETLTask.php:46). One network round-trip per row becomes one
  * left-anti join per unique column.
  *
  * OR semantics across columns, matching the reference loop: a source row is
  * dropped when ANY of its unique-column values already exists in the
  * destination. String comparison is trim-insensitive on BOTH sides, like the
  * dedup cache.
  *
  * Scale note: the destination side is reduced to `distinct` key values
  * before the join, so the exchanged data is the key set, not the table.
  * When that key set is small Spark's JoinSelection broadcasts it; at 100 TB
  * with a huge destination, AQE picks a shuffled hash join — both correct.
  */
object AntiDestination {

  def apply(src: DataFrame, dst: DataFrame, keys: Seq[String]): DataFrame =
    keys.foldLeft(src) { (d, k) =>
      val dstKeys = dst
        .select(Dedup.normKey(dst, k).alias("__graft_k"))
        .where(col("__graft_k").isNotNull)
        .distinct()
      d.join(dstKeys, Dedup.normKey(d, k) === col("__graft_k"), "left_anti")
    }

  /** The dual guard: keep only rows whose key DOES exist in the destination
    * (the reference's probe-then-act insert-if-present branches, e.g.
    * sdk/migrate_assure_users.php:176-204).
    */
  def semi(src: DataFrame, dst: DataFrame, keys: Seq[String]): DataFrame = {
    val dstKeys = dst.select(keys.map(k => Dedup.normKey(dst, k).alias(s"__graft_$k")): _*).distinct()
    val cond = keys.map(k => Dedup.normKey(src, k) === col(s"__graft_$k")).reduce(_ && _)
    src.join(dstKeys, cond, "left_semi")
  }
}
