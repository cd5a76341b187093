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

  /** Training-data MIXTURE sampling: fill a token/document budget from
    * per-source quotas (the "50% web / 30% wiki / 20% code" recipe every
    * corpus card publishes). The budget is `budgetPct`% of the corpus;
    * source s gets `weightPct(s)`% of the budget, taken as the first
    * quota rows of that source in hash order.
    *
    * All floors are integer (`div`), the corpus size enters as a one-row
    * broadcast (never a driver-side collect), and selection is hash-ORDER
    * like every sampler here — rerun-stable, partition-independent, and
    * reproducible by any engine with md5. Sources absent from `weights`
    * contribute nothing (inner join against the broadcast quota table).
    * One shuffle: the per-source row_number window; the quota side is a
    * handful of rows however large the corpus is.
    */
  def mixture(df: DataFrame, sourceCol: String, idCol: String,
              weights: Seq[(String, Int)], budgetPct: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val w = weights.toDF(sourceCol, "__w_pct")
    val quotas = df.agg(count(lit(1)).as("__corpus_n")).crossJoin(w)
      .select(col(sourceCol),
        expr(s"(__corpus_n * $budgetPct div 100) * __w_pct div 100")
          .as("__quota"))
    val win = Window.partitionBy(col(sourceCol))
      .orderBy(hashRank(col(idCol)), col(idCol))
    df.join(broadcast(quotas), sourceCol)
      .withColumn("__rn", row_number().over(win))
      .filter(col("__rn") <= col("__quota"))
      .select(df.columns.map(col).toIndexedSeq: _*) // original column order
  }

  /** Temperature-scaled source mixture (the XLM-R / mT5 sampling law,
    * Conneau et al. 2020): source s contributes proportionally to
    * n_s^alpha instead of n_s, up-weighting small sources so the model
    * sees low-resource data. This implementation pins alpha = 0.5 —
    * XLM-R's low-resource setting — because sqrt is the one power IEEE
    * 754 requires to be CORRECTLY ROUNDED: `sqrt(n)` is bit-identical in
    * every engine, where `pow(n, 0.3)` is not. The weight arithmetic is
    * then fixed-point:
    *
    *   w_fp(s)   = round(sqrt(n_s) * 1e9)          — exact, portable
    *   target(s) = budgetRows * w_fp(s) div SUM w_fp  — integer div
    *
    * so the realized per-source quota is engine-exact and the whole op
    * sits under a hash-equality oracle — the property that makes a
    * training-mixture recipe REPRODUCIBLE, not just approximately right.
    *
    * Realization is hash-order (md5 of the id) like [[mixture]]: quota
    * rows per source in [[hashRank]] order, so growing a source never
    * swaps already-selected documents. Scale shape: one count aggregation
    * (source-keyed, tiny), quota table broadcast, one window exchange on
    * the source key — same as every per-stratum op here.
    */
  def temperatureMixture(df: DataFrame, sourceCol: String, idCol: String,
                         budgetRows: Long): DataFrame = {
    val wFp = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__w_fp",
        round(sqrt(col("__n").cast("double")) * lit(1e9)).cast("long"))
    val tot = wFp.agg(sum("__w_fp").as("__w_tot"))
    val quotas = wFp.crossJoin(broadcast(tot))
      .select(col(sourceCol),
        expr(s"$budgetRows * __w_fp div __w_tot").as("__quota"))
    val win = Window.partitionBy(col(sourceCol))
      .orderBy(hashRank(col(idCol)), col(idCol))
    df.join(broadcast(quotas), sourceCol)
      .withColumn("__rn", row_number().over(win))
      .filter(col("__rn") <= col("__quota"))
      .select(df.columns.map(col).toIndexedSeq: _*)
  }
}
