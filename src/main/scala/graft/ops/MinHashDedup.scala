package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection:
  * shingle → minhash signature → band → bucket-join → verify.
  *
  * Hashes are md5-based (seed-prefixed, lexicographic min of hex digests) so
  * the pipeline is engine-portable — the DuckDB oracle reproduces identical
  * signatures. md5 is slower than xxhash but the signature step is a narrow
  * projection; the cost that matters at scale is the candidate join, which
  * this reduces from O(n²) to same-bucket pairs.
  *
  * Scale design: the only shuffle is the band-bucket self-join, partitioned
  * on the band key. Skewed buckets (a band key shared by thousands of docs)
  * are the classic hazard; AQE skew-join handles moderate skew, and
  * `maxBucket` drops degenerate buckets outright (standard practice — a
  * bucket with k docs yields k²/2 candidate pairs and catches only boilerplate).
  */
object MinHashDedup {

  /** Word k-shingles of a token array (empty when fewer than k tokens). */
  def shingles(toks: Column, k: Int): Column =
    when(size(toks) < k, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k)))))

  /** m-component minhash signature: component j is the lexicographic min of
    * md5(j + "|" + shingle) over the shingle set.
    */
  def signature(sh: Column, m: Int): Column =
    transform(sequence(lit(0), lit(m - 1)),
      j => array_min(transform(sh,
        s => md5(concat(j.cast("string"), lit("|"), s)))))

  /** LSH band keys: the signature is split into `nBands` runs of `rowsPerBand`
    * components; each band hashes to one bucket key.
    */
  def bandKeys(sig: Column, rowsPerBand: Int, nBands: Int): Column =
    transform(sequence(lit(0), lit(nBands - 1)),
      b => md5(concat(b.cast("string"), lit("#"),
        concat_ws(",", slice(sig, b * lit(rowsPerBand) + 1, lit(rowsPerBand))))))

  /** Full near-dup pipeline over (idCol, textCol). Returns candidate pairs
    * with estimated (signature-agreement) and exact (shingle-set) Jaccard,
    * filtered to exact jaccard >= threshold.
    */
  def nearDuplicates(docs: DataFrame, idCol: String, textCol: String,
                     k: Int = 3, m: Int = 16, nBands: Int = 4,
                     threshold: Double = 0.5,
                     maxBucket: Int = 1000): DataFrame = {
    val rowsPerBand = m / nBands
    val toks = TextAnalysis.tokens(col(textCol))
    val sh = array_distinct(shingles(toks, k))

    val prepared = docs
      .select(col(idCol), sh.as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", signature(col("sh"), m))
      .withColumn("bands", bandKeys(col("sig"), rowsPerBand, nBands))

    val exploded = prepared.select(col(idCol), explode(col("bands")).as("band"))
    // Degenerate-bucket guard: quadratic pair blowup protection at scale.
    val bucketed = exploded
      .withColumn("bucket_n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("band"))))
      .filter(col("bucket_n") <= maxBucket)
      .drop("bucket_n")

    val left = bucketed.select(col(idCol).as("id_a"), col("band"))
    val right = bucketed.select(col(idCol).as("id_b"), col("band"))
    val pairs = left.join(right,
        left("band") === right("band") && col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()

    val withSets = pairs
      .join(prepared.select(col(idCol).as("id_a"), col("sh").as("sh_a"),
        col("sig").as("sig_a")), "id_a")
      .join(prepared.select(col(idCol).as("id_b"), col("sh").as("sh_b"),
        col("sig").as("sig_b")), "id_b")

    withSets
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          b => b)).cast("double") / m)
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "est_jaccard", "jaccard")
  }

  /** Direct n-gram Jaccard similarity between document pairs sharing a
    * blocking key (e.g. source, language, length band). The blocking column
    * bounds the quadratic pair space — the equality join is the only
    * shuffle. For unblocked discovery use `nearDuplicates` (LSH) instead.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        blockCol: String, k: Int = 3,
                        threshold: Double = 0.3): DataFrame = {
    val sh = array_distinct(shingles(TextAnalysis.tokens(col(textCol)), k))
    val prepared = docs.select(col(idCol), col(blockCol), sh.as("sh"))
      .filter(size(col("sh")) > 0)
    val left = prepared.select(col(idCol).as("id_a"), col(blockCol),
      col("sh").as("sh_a"))
    val right = prepared.select(col(idCol).as("id_b"), col(blockCol),
      col("sh").as("sh_b"))
    left.join(right, Seq(blockCol))
      .filter(col("id_a") < col("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Exact duplicate groups by full-content hash — the cheap first pass of
    * any dedup stack (hash-groupBy, one shuffle on the digest).
    */
  def exactDuplicates(docs: DataFrame, idCol: String,
                      textCol: String): DataFrame =
    docs.select(col(idCol), md5(col(textCol)).as("content_hash"))
      .groupBy("content_hash")
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keeper_id"))
}
