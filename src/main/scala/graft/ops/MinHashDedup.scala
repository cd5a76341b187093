package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection:
  * shingle → minhash signature → band → bucket-join → verify.
  *
  * Hashing scheme: ONE md5 per shingle, reduced to a 60-bit integer mod
  * 2^31-1 (`baseHash`); the m signature components derive arithmetically
  * via the universal-hash family ((2j+1)·h + 7919j + 13) mod p
  * (`signatureOfHashes`) — engine-portable, so the DuckDB oracle reproduces
  * identical signatures. (A seed-prefixed md5 per component was measured
  * 16× more hashing and abandoned.) md5 is slower than xxhash but the
  * signature step is a narrow projection; the cost that matters at scale is
  * the candidate join, which this reduces from O(n²) to same-bucket pairs.
  *
  * Scale design: the only shuffle is the band-bucket self-join, partitioned
  * on the band key. Skewed buckets (a band key shared by thousands of docs)
  * are the classic hazard; AQE skew-join handles moderate skew, and
  * `maxBucket` drops degenerate buckets outright (standard practice — a
  * bucket with k docs yields k²/2 candidate pairs and catches only boilerplate).
  */
object MinHashDedup {

  /** Word k-shingles of a token array (empty when fewer than k tokens).
    *
    * IMPORTANT: pass a materialized COLUMN, not an expression like
    * `TextAnalysis.tokens(...)` — the lambda body references `toks` per
    * element, so an inlined expression (e.g. the tokenizing regexp)
    * re-evaluates once per shingle position (measured: ~100× redundant
    * regexp work per document, dominating the whole dedup pipeline).
    */
  def shingles(toks: Column, k: Int): Column =
    when(size(toks) < k, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k)))))

  /** Modulus for the universal-hash family (2^31 - 1, prime). */
  val HashMod = 2147483647L

  /** 60-bit base hash of one shingle, reduced mod `HashMod`. ONE md5 per
    * shingle — the m signature components derive from it arithmetically
    * (seeded md5 per component was measured 16× more hashing and dominated
    * the whole pipeline at bench scale).
    */
  def baseHash(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long") % HashMod

  /** m-component minhash signature from pre-computed base hashes:
    * component j is min over shingles of ((2j+1)·h + 7919j + 13) mod p —
    * a universal-hash family in exact int64 arithmetic (max product
    * ≈ 31·2^31 << 2^63), reproducible in any engine with 64-bit ints.
    */
  def signatureOfHashes(hashes: Column, m: Int): Column =
    transform(sequence(lit(0), lit(m - 1)),
      j => array_min(transform(hashes,
        h => ((j * 2L + 1L) * h + j * 7919L + 13L) % HashMod)))

  /** Convenience: signature straight from the shingle array — composable
    * interpreted form; semantically identical to [[signatureFused]], which
    * the hot path uses.
    */
  def signature(sh: Column, m: Int): Column =
    signatureOfHashes(transform(sh, baseHash(_)), m)

  /** Signature as ONE native codegen call ([[graft.functions.MinHashSig]]):
    * same values as [[signature]]/the oracle SQL, but md5 + m mins run as a
    * tight Java loop instead of m×|shingles| interpreted lambda dispatches.
    */
  def signatureFused(sh: Column, m: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.MinHashSig(
        org.apache.spark.sql.graft.ColumnBridge.expression(sh), m))

  /** LSH band keys: the signature is split into `nBands` runs of `rowsPerBand`
    * components; each band hashes to one bucket key.
    */
  def bandKeys(sig: Column, rowsPerBand: Int, nBands: Int): Column =
    transform(sequence(lit(0), lit(nBands - 1)),
      b => md5(concat(b.cast("string"), lit("#"),
        concat_ws(",", transform(
          slice(sig, b * lit(rowsPerBand) + 1, lit(rowsPerBand)),
          x => x.cast("string"))))))

  /** Full near-dup pipeline over (idCol, textCol). Returns candidate pairs
    * with estimated (signature-agreement) and exact (shingle-set) Jaccard,
    * filtered to exact jaccard >= threshold.
    */
  /** Shingle + signature + band preparation shared by [[nearDuplicates]]
    * and [[lshCandidatePairs]].
    *
    * Spread: a small parquet file arrives as ONE partition, serializing
    * all signature computation onto one core; repartitioning by id costs
    * one narrow-row shuffle and buys full parallelism (at 100 TB the
    * input already has enough partitions and this coalesces nothing).
    * Shingles and signature via the fused codegen expressions
    * (TextAnalysis.wordShingles + signatureFused — profiling showed the
    * interpreted slice/concat shingling and the per-component lambda mins
    * dominating this whole pipeline; an explode + m min-aggregates
    * variant measured SLOWER still, adding a groupBy shuffle plus a join
    * back). Cache: the frame is consumed multiple times (band explode +
    * both sides of the verify join); at 100 TB persist to storage
    * instead.
    */
  private def prepareSignatures(docs: DataFrame, idCol: String,
                                textCol: String, k: Int, m: Int,
                                nBands: Int): DataFrame = {
    val rowsPerBand = m / nBands
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val spread =
      if (docs.rdd.getNumPartitions < par) docs.repartition(par, col(idCol))
      else docs
    spread
      .select(col(idCol), TextAnalysis.wordShingles(col(textCol), k).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", signatureFused(col("sh"), m))
      .withColumn("bands", bandKeys(col("sig"), rowsPerBand, nBands))
      .cache()
  }

  /** Distinct band-collision candidate pairs from a prepared signature
    * frame — the UNVERIFIED output of the banding scheme.
    */
  private def candidatesFrom(prepared: DataFrame, idCol: String,
                             maxBucket: Int): DataFrame = {
    val exploded = prepared.select(col(idCol), explode(col("bands")).as("band"))
    // Degenerate-bucket guard: quadratic pair blowup protection at scale.
    val bucketed = exploded
      .withColumn("bucket_n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("band"))))
      .filter(col("bucket_n") <= maxBucket)
      .drop("bucket_n")
    // Alias the join key on each side: both frames share lineage, and an
    // un-renamed col("band") === col("band") resolves to the same attribute
    // (trivially true) — silently degrading the bucket join to a cross join.
    val left = bucketed.select(col(idCol).as("id_a"), col("band").as("band_a"))
    val right = bucketed.select(col(idCol).as("id_b"), col("band").as("band_b"))
    left.join(right,
        col("band_a") === col("band_b") && col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** The banding scheme's raw candidate pairs (no exact verification) —
    * what you measure when TUNING an LSH deployment: joined against
    * exact-Jaccard truth pairs it yields the scheme's recall/precision
    * (see the `d16_lsh_recall` gate).
    */
  def lshCandidatePairs(docs: DataFrame, idCol: String, textCol: String,
                        k: Int = 3, m: Int = 16, nBands: Int = 4,
                        maxBucket: Int = 1000): DataFrame =
    candidatesFrom(prepareSignatures(docs, idCol, textCol, k, m, nBands),
      idCol, maxBucket)

  def nearDuplicates(docs: DataFrame, idCol: String, textCol: String,
                     k: Int = 3, m: Int = 16, nBands: Int = 4,
                     threshold: Double = 0.5,
                     maxBucket: Int = 1000): DataFrame = {
    val prepared = prepareSignatures(docs, idCol, textCol, k, m, nBands)
    val pairs = candidatesFrom(prepared, idCol, maxBucket)

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
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val spread =
      if (docs.rdd.getNumPartitions < par) docs.repartition(par, col(idCol))
      else docs
    // Cache: consumed by both sides of the blocked pair join. Shingling via
    // the fused codegen expression (one generated pass per row).
    val prepared = spread
      .select(col(idCol), col(blockCol),
        TextAnalysis.wordShingles(col(textCol), k).as("sh"))
      .filter(size(col("sh")) > 0)
      .cache()
    // Sparse-join intersection counting: explode the shingle sets and join
    // on (block, shingle), then count matches per pair. |A∪B| follows from
    // the sizes. This replaces per-pair array_intersect over the full
    // quadratic pair space with one shuffle on the shingle key — pairs
    // sharing no shingle never materialize at all (they can't pass any
    // threshold > 0). The classic inverted-index shape; at 100 TB the
    // skew hazard is a shingle common to a whole block (stop-shingle) —
    // prune those upstream if blocks are huge.
    val ea = prepared.select(col(idCol).as("id_a"), col(blockCol),
      size(col("sh")).as("sz_a"), explode(col("sh")).as("s"))
    val eb = prepared.select(col(idCol).as("id_b"), col(blockCol),
      size(col("sh")).as("sz_b"), explode(col("sh")).as("s"))
    ea.join(eb, Seq(blockCol, "s"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"), col("sz_a"), col("sz_b"))
      .agg(count(lit(1)).as("c"))
      .withColumn("jaccard", col("c").cast("double") /
        (col("sz_a") + col("sz_b") - col("c")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** PREFIX-FILTERED set-similarity join (the AllPairs/PPJoin candidate
    * rule, Bayardo 2007 / Xiao 2008) — the algorithmic upgrade over
    * [[ngramJaccardPairs]]'s full inverted index: under a global token
    * order, two sets with J ≥ t MUST share a token within each one's
    * first `|s| − ⌈t·|s|⌉ + 1` tokens, so only that PREFIX is indexed.
    * Ordering by ascending document frequency puts the RAREST tokens in
    * the prefix — the d4 stop-shingle hazard (one ubiquitous shingle
    * joining everything to everything) disappears by construction,
    * because ubiquitous tokens sort to the suffix and are never indexed.
    * Index volume drops from Σ|s| to Σ(1−t)|s| and, far more
    * importantly, candidate mass concentrates on rare-token buckets.
    *
    * Shape: one df aggregation (token-keyed), one per-doc rank window
    * (doc-keyed sort), the prefix-prefix equality join, then exact
    * verification of the candidates only (array intersect over the two
    * full sets — candidate count ≈ true-pair count by design). The
    * matched set is IDENTICAL to the naive all-pairs join — the lemma
    * moves cost, never answers — which is what the oracle replays.
    */
  def prefixFilterJaccardPairs(docs: DataFrame, idCol: String,
                               textCol: String, k: Int = 3,
                               threshold: Double = 0.3): DataFrame = {
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val spread =
      if (docs.rdd.getNumPartitions < par) docs.repartition(par, col(idCol))
      else docs
    val prepared = spread
      .select(col(idCol), TextAnalysis.wordShingles(col(textCol), k).as("sh"))
      .filter(size(col("sh")) > 0)
      .cache()
    val dfreq = prepared.select(explode(col("sh")).as("s"))
      .groupBy("s").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy(col("df"), col("s"))
    // Cache: consumed by BOTH prefix-join sides; the initial d22 plan
    // carried two full copies of the rank-window + df-join subtree —
    // the cache guarantees one compute instead of relying on runtime
    // exchange reuse across differing projections (guide §2.4). Prefix
    // volume is Σ(1−t)|s|, the small end of the pipeline; at 100 TB
    // persist to storage.
    val prefixes = prepared
      .select(col(idCol), size(col("sh")).cast("long").as("sz"),
        explode(col("sh")).as("s"))
      .join(dfreq, "s")
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <=
        col("sz") - ceil(col("sz") * threshold) + lit(1L))
      .cache()
    val pa = prefixes.select(col(idCol).as("id_a"), col("s"))
    val pb = prefixes.select(col(idCol).as("id_b"), col("s"))
    val cand = pa.join(pb, "s").filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    // Exact verification COUNT-BASED, restricted to candidates: carrying
    // full shingle ARRAYS per pair (array_intersect) was measured 19×
    // slower at 10× on the clone corpus — 300-element arrays shuffled
    // per pair plus interpreted array ops; the exploded equality join +
    // codegen count agg below is d4's verify shape, paying only for
    // rows that are IN the intersection of a candidate pair.
    val ea = prepared.select(col(idCol).as("id_a"),
      size(col("sh")).cast("long").as("sz_a"), explode(col("sh")).as("s"))
    val eb = prepared.select(col(idCol).as("id_b"),
      size(col("sh")).cast("long").as("sz_b"), explode(col("sh")).as("s"))
    ea.join(cand, "id_a")
      .join(eb, Seq("id_b", "s"))
      .groupBy(col("id_a"), col("id_b"), col("sz_a"), col("sz_b"))
      .agg(count(lit(1)).as("c"))
      .withColumn("jaccard", col("c").cast("double") /
        (col("sz_a") + col("sz_b") - col("c")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** INCREMENTAL near-dup admission — the production shape of dedup at
    * 100 TB: a new batch (`increment`, e.g. today's crawl) is admitted
    * against an already-deduped `corpus` WITHOUT recomputing anything
    * corpus×corpus. An increment document is dropped when it is a
    * near-dup of any corpus document (the corpus always wins), or when it
    * is the higher id of a within-increment near-dup pair (the same
    * canonical-keeper policy as the c2 composite). Returns the surviving
    * increment rows in full.
    *
    * Scale contract: the corpus side contributes ONLY its band table —
    * in production that table is computed once at corpus build, stored
    * bucketed by band key (see `Sinks.bucketedTable`), and each day's
    * admission shuffles just the increment's bands against it; the
    * degenerate-bucket guard belongs to that corpus index build, which is
    * why this operator takes no maxBucket.
    */
  def incrementalNearDuplicates(increment: DataFrame, corpus: DataFrame,
                                idCol: String, textCol: String,
                                k: Int = 3, m: Int = 16, nBands: Int = 4,
                                threshold: Double = 0.5): DataFrame = {
    val rowsPerBand = m / nBands
    def prep(df: DataFrame): DataFrame = {
      val par = df.sparkSession.sparkContext.defaultParallelism
      val spread =
        if (df.rdd.getNumPartitions < par) df.repartition(par, col(idCol))
        else df
      spread
        .select(col(idCol), TextAnalysis.wordShingles(col(textCol), k).as("sh"))
        .filter(size(col("sh")) > 0)
        .withColumn("bands",
          bandKeys(signatureFused(col("sh"), m), rowsPerBand, nBands))
        .cache()
    }
    def jaccard(a: Column, b: Column): Column =
      size(array_intersect(a, b)).cast("double") /
        size(array_union(a, b)).cast("double")
    val inc = prep(increment)
    val corp = prep(corpus)
    val incBands = inc.select(col(idCol).as("id_i"),
      explode(col("bands")).as("band_i"))
    val corpBands = corp.select(col(idCol).as("id_c"),
      explode(col("bands")).as("band_c"))
    // corpus collision → exact verify → increment id is dropped
    val crossDrop = incBands
      .join(corpBands, col("band_i") === col("band_c"))
      .select("id_i", "id_c").distinct()
      .join(inc.select(col(idCol).as("id_i"), col("sh").as("sh_i")), "id_i")
      .join(corp.select(col(idCol).as("id_c"), col("sh").as("sh_c")), "id_c")
      .filter(jaccard(col("sh_i"), col("sh_c")) >= threshold)
      .select(col("id_i").as(idCol)).distinct()
    // within-increment pairs: canonical keeper (lower id) survives
    val li = incBands.select(col("id_i").as("id_a"), col("band_i").as("band_a"))
    val ri = incBands.select(col("id_i").as("id_b"), col("band_i").as("band_b"))
    val incDrop = li.join(ri,
        col("band_a") === col("band_b") && col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
      .join(inc.select(col(idCol).as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(inc.select(col(idCol).as("id_b"), col("sh").as("sh_b")), "id_b")
      .filter(jaccard(col("sh_a"), col("sh_b")) >= threshold)
      .select(col("id_b").as(idCol)).distinct()
    increment
      .join(crossDrop, Seq(idCol), "left_anti")
      .join(incDrop, Seq(idCol), "left_anti")
  }

  /** N-gram CONTAINMENT between blocked document pairs — the asymmetric
    * companion to [[ngramJaccardPairs]]: `containment(A in B) =
    * |A∩B| / |A|`. Jaccard misses subset duplication (a paragraph pasted
    * into a much longer document scores a low union ratio); containment
    * flags it from either side. Same inverted-index sparse join — one
    * shuffle on (block, shingle), pairs sharing no shingle never
    * materialize — with both direction ratios computed from the one
    * intersection count. Pairs qualify when EITHER direction clears the
    * threshold.
    */
  def ngramContainmentPairs(docs: DataFrame, idCol: String, textCol: String,
                            blockCol: String, k: Int = 3,
                            threshold: Double = 0.5): DataFrame = {
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val spread =
      if (docs.rdd.getNumPartitions < par) docs.repartition(par, col(idCol))
      else docs
    val prepared = spread
      .select(col(idCol), col(blockCol),
        TextAnalysis.wordShingles(col(textCol), k).as("sh"))
      .filter(size(col("sh")) > 0)
      .cache()
    val ea = prepared.select(col(idCol).as("id_a"), col(blockCol),
      size(col("sh")).as("sz_a"), explode(col("sh")).as("s"))
    val eb = prepared.select(col(idCol).as("id_b"), col(blockCol),
      size(col("sh")).as("sz_b"), explode(col("sh")).as("s"))
    ea.join(eb, Seq(blockCol, "s"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"), col("sz_a"), col("sz_b"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cont_a_in_b",
        col("c").cast("double") / col("sz_a").cast("double"))
      .withColumn("cont_b_in_a",
        col("c").cast("double") / col("sz_b").cast("double"))
      .filter(greatest(col("cont_a_in_b"), col("cont_b_in_a")) >= threshold)
      .select("id_a", "id_b", "cont_a_in_b", "cont_b_in_a")
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
