package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew-mitigation primitives for when AQE's runtime skew-join
  * splitting isn't available (streaming state stores, non-AQE plans) or a
  * key is so hot one partition would still dominate a stage.
  *
  * AQE (`spark.sql.adaptive.skewJoin.enabled`) is the FIRST answer at
  * 100 TB; these are the explicit fallback with deterministic salting (no
  * rand() — salts derive from row content, so retried tasks produce the
  * same salt and results stay reproducible).
  */
object Skew {

  private def saltCol(df: DataFrame, n: Int): Column =
    pmod(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)), lit(n))
      .cast("int")

  /** Equi-join where `big` has hot keys: salt the big side by row content,
    * replicate the `small` side across all salts, join on (key, salt). One
    * hot key spreads over `salt` partitions; the small side grows by the
    * salt factor (keep it broadcast-sized ÷ salt).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salt: Int, joinType: String = "inner"): DataFrame = {
    val bigS = big.withColumn("__graft_salt", saltCol(big, salt))
    val smallS = small.withColumn("__graft_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    bigS.join(smallS, Seq(key, "__graft_salt"), joinType)
      .drop("__graft_salt")
  }

  /** Two-phase distinct count under key skew: dedup on (key, salt, value)
    * spreads a hot key's dedup state across `salt` partitions, then the
    * per-key combine only sees pre-deduped values. (Plain `sum`/`count`
    * aggregates don't need this — partial aggregation already combines
    * map-side; the skew pain is distinct-state concentration.)
    */
  def saltedCountDistinct(df: DataFrame, key: String, valueCol: String,
                          salt: Int): DataFrame =
    df.select(col(key), col(valueCol),
        pmod(xxhash64(col(valueCol)), lit(salt)).cast("int").as("__graft_salt"))
      .groupBy(col(key), col("__graft_salt"))
      .agg(countDistinct(col(valueCol)).as("__graft_partial"))
      .groupBy(col(key))
      .agg(sum("__graft_partial").as(s"n_distinct_$valueCol"))
}
