package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL canonicalization — the crawl-dedup staple: the same page arrives
  * under host-case variants, trailing slashes, shuffled query params, and
  * tracking decorations; dedup by RAW url misses most of it. The
  * canonical form here:
  *
  *  - host lowercased (DNS is case-insensitive);
  *  - trailing slashes stripped from the path;
  *  - `utm_*` tracking parameters dropped;
  *  - remaining query parameters SORTED (param order is semantically
  *    irrelevant);
  *  - fragment discarded (never sent to the server).
  *
  * Everything is regexp + array ops in the Java/RE2 common subset (not
  * `parse_url`) so the DuckDB oracle applies the identical extraction —
  * and it is one codegen'd projection: canonicalizing 100 TB of crawl
  * URLs is a map-only pass.
  */
object UrlNormalize {

  def canonical(url: Column): Column = {
    val host = lower(regexp_extract(url, "^https?://([^/?#]+)", 1))
    val path = regexp_replace(
      regexp_extract(url, "^https?://[^/?#]+([^?#]*)", 1), "/+$", "")
    val query = regexp_extract(url, "\\?([^#]*)", 1)
    val params = filter(split(query, "&"),
      p => not(p.startsWith("utm_")) && p =!= "")
    val sorted = array_join(array_sort(params), "&")
    concat(host, path,
      when(sorted =!= "", concat(lit("?"), sorted)).otherwise(lit("")))
  }

  /** First-wins dedup on the canonical form: one hash exchange on the
    * canonical key (the d1 discipline — min-id keeper via aggregation,
    * no global sort).
    */
  def dedupByCanonical(df: DataFrame, idCol: String,
                       urlCol: String): DataFrame =
    df.withColumn("canonical_url", canonical(col(urlCol)))
      .groupBy(col("canonical_url"))
      .agg(count(lit(1)).as("n_variants"), min(col(idCol)).as("keeper_id"))
}
