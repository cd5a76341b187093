package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reproducible sampling for training-data pipelines — hash-ORDER, not
  * random-number based:
  *
  *  - rerunning the pipeline produces the identical sample (no RNG state,
  *    no partition-order sensitivity — `df.sample()` changes with
  *    partitioning);
  *  - a row's split assignment is a pure function of its id, so it is
  *    STABLE under data growth: adding documents never moves an existing
  *    document between train and test (the property that prevents
  *    train/test contamination across dataset versions);
  *  - any engine can reproduce the sample (md5 is the hash).
  */
object Sampling {

  /** Deterministic pseudo-random rank: md5 of the id's string form. */
  def hashRank(id: Column): Column = md5(id.cast("string"))

  /** Stratified fixed-size sample: first `n` rows per stratum in hash
    * order (ties impossible — md5 of distinct ids). One shuffle on the
    * stratum key.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                       n: Int): DataFrame = {
    val w = Window.partitionBy(col(stratumCol)).orderBy(hashRank(col(idCol)))
    df.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") <= n)
      .drop("__graft_rn")
  }

  /** Stable train/test split: a row is `test` iff the first hex digit of
    * md5(id) falls below the cut (cut/16 of the space; cut=4 → 25%).
    * Assignment never changes as the dataset grows.
    */
  def trainTestSplit(df: DataFrame, idCol: String,
                     cutSixteenths: Int = 4): DataFrame = {
    val firstHex = conv(substring(hashRank(col(idCol)), 1, 1), 16, 10)
      .cast("int")
    df.withColumn("split",
      when(firstHex < cutSixteenths, "test").otherwise("train"))
  }

  /** Weighted Bernoulli sample, deterministic: a row survives iff its
    * md5-derived uniform draw (first 8 hex digits → 32-bit integer)
    * falls below weight × scale — inclusion probability proportional to
    * the weight column (importance/quality-weighted corpus sampling),
    * yet reproducible under reruns, repartitioning, and data growth,
    * exactly like [[trainTestSplit]]. The draw and the threshold are
    * integers, so any engine with md5 reproduces the identical sample —
    * no RNG, no floating-point boundary.
    *
    * @param scale survival threshold per weight unit, out of 2^32: a row
    *              with weight w survives with probability
    *              min(1, w·scale / 2^32)
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     scale: Long): DataFrame = {
    val draw = conv(substring(hashRank(col(idCol)), 1, 8), 16, 10)
      .cast("long")
    df.filter(draw < col(weightCol).cast("long") * scale)
  }
}
