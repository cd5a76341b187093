package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass data profiling: per-column row/null/distinct counts in long
  * format — the pre-migration sanity report the reference workflow ran as
  * ad-hoc SQL before each import (row counts before every run;
  * COUNT(DISTINCT sin) duplicate probe, sdk/migrate_employeur.php:27-40),
  * generalized to every column in ONE scan.
  *
  * Shape: a single aggregation computes all 2k+1 aggregates, then one
  * explode unpivots the 1-row result. Profiling k columns costs one job,
  * not k (the one-query-per-column pattern re-reads the table k times —
  * at 100 TB that is k full scans for a report).
  *
  * Scale note: exact `countDistinct` over multiple columns plans through
  * an Expand (k rows per input row) feeding ONE shuffled aggregate —
  * exact and single-pass, but the expand multiplies shuffle input by k.
  * At 100 TB swap `exact = false` to `approx_count_distinct` (HLL,
  * map-side combinable, no expand) — the report rarely needs exact
  * cardinalities; the oracle gate does, hence the flag.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String],
              exact: Boolean = true): DataFrame = {
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        // count(*) - count(c), NOT sum(when(isNull)): the sum form is
        // NULL over zero rows, breaking empty-input parity with the
        // mirror and NPEing typed consumers.
        (count(lit(1)) - count(col(c))).as(s"__nulls_$c"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"__distinct_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      struct(lit(c).as("col_name"), col(s"__nulls_$c").as("n_null"),
        col(s"__distinct_$c").as("n_distinct"))
    }
    one.select(col("__n").as("n"), explode(array(entries: _*)).as("p"))
      .select(col("p.col_name").as("col_name"), col("n"),
        col("p.n_null").as("n_null"), col("p.n_distinct").as("n_distinct"))
  }
}
