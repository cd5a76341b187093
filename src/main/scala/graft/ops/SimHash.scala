package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash near-duplicate sketching: each document collapses to a 60-bit
  * fingerprint; documents within small Hamming distance are near-dups.
  *
  * Token hashes are the first 15 hex chars of md5 (60 bits, engine-portable
  * — the DuckDB oracle reproduces them). Bit j of the sketch is set when the
  * signed vote sum over token-hash bit j is positive.
  *
  * Candidate pairing uses the standard chunk trick: two sketches within
  * Hamming distance d must agree exactly on at least one of d+1 disjoint
  * chunks — so a 4-way chunk split finds all pairs with distance <= 3 via
  * equality joins only (no O(n²) scan). The only shuffle is the chunk-value
  * join, the same shape LSH banding has.
  */
object SimHash {

  /** 60-bit token hash from the md5 hex prefix. */
  def tokenHash(t: Column): Column =
    conv(substring(md5(t), 1, 15), 16, 10).cast("long")

  /** 60-bit simhash of a feature array (distinct features vote once).
    * Features should be discriminative — word k-shingles, not raw tokens:
    * with a small shared vocabulary every document contains nearly every
    * token and token-level simhash collapses (verified empirically on the
    * synthetic corpus: token-level gives ~16k candidate pairs, shingle-level
    * isolates the ~25 true near-dups).
    */
  def simhash(features: Column): Column =
    simhashOfHashes(transform(array_distinct(features), tokenHash(_)))

  /** Simhash from a PRE-COMPUTED hash array. Callers should materialize the
    * hash array into its own column first: the per-bit fold references the
    * array 60 times, and an inlined `transform(..., md5...)` subtree would
    * be re-evaluated once per bit — a 60× blowup of the md5 work (observed:
    * dominates the whole pipeline at bench scale).
    */
  def simhashOfHashes(hashes: Column): Column =
    aggregate(
      sequence(lit(0), lit(59)),
      lit(0L),
      (acc, j) => {
        val votes = aggregate(hashes, lit(0L),
          (acc2, h) => acc2 +
            call_function("shiftright", h, j).bitwiseAND(lit(1L)) * 2L - 1L)
        acc + when(votes > 0, call_function("shiftleft", lit(1L), j))
          .otherwise(lit(0L))
      })

  /** `bit_count(a XOR b) <= d` as the recognizable similarity-join
    * predicate ([[graft.functions.HammingLE]]): write the join
    * DECLARATIVELY — `a.join(b, hammingLE(col("sim_a"), col("sim_b"), 3))`
    * — and [[graft.plans.HammingJoinRewrite]] re-plans it from the O(n²)
    * nested loop into the chunked candidate equality join that
    * [[nearDuplicates]] spells out by hand.
    */
  def hammingLE(a: Column, b: Column, maxDist: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.HammingLE(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b), maxDist))

  /** 15-bit chunks for the Hamming-candidate equality join. */
  def chunks(sim: Column, nChunks: Int = 4): Column =
    transform(sequence(lit(0), lit(nChunks - 1)),
      c => struct(c.as("chunk_idx"),
        call_function("shiftright", sim, c * 15).bitwiseAND(lit(0x7FFFL))
          .as("chunk_val")))

  /** Sketch every document over word k-shingles: (id, simhash).
    *
    * Implemented as explode → 60 codegen'd `sum` aggregates → bit
    * recombination, NOT a nested array-lambda fold: higher-order-function
    * lambdas evaluate interpreted per element, and the explode+agg shape
    * keeps the entire bit-vote computation inside whole-stage codegen with
    * one hash-partitioned shuffle on the doc id (measured ~7× faster at
    * bench scale, and the same shape scales out on a cluster).
    */
  def sketch(docs: DataFrame, idCol: String, textCol: String,
             shingleK: Int = 3): DataFrame = {
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val spread =
      if (docs.rdd.getNumPartitions < par) docs.repartition(par, col(idCol))
      else docs
    // Shingling via the fused codegen expression (TextAnalysis.wordShingles)
    // feeding explode directly — one generated pass per row, then the
    // generator fans out rows for the codegen'd vote aggregates.
    val exploded = spread
      .select(col(idCol),
        explode(TextAnalysis.wordShingles(col(textCol), shingleK)).as("s"))
      .select(col(idCol), tokenHash(col("s")).as("h"))
    val voteCols = (0 until 60).map(j =>
      sum(shiftright(col("h"), j).bitwiseAND(lit(1L)) * 2L - 1L).as(s"b$j"))
    val votes = exploded.groupBy(col(idCol))
      .agg(voteCols.head, voteCols.tail: _*)
    val sim = (0 until 60).map(j =>
      when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    votes.select(col(idCol), sim.as("simhash"))
  }

  /** Near-dup pairs with Hamming distance <= maxDistance. Candidate recall
    * through the chunk join is exact for maxDistance <= nChunks - 1 (= 3);
    * beyond that it is partial by design — pairs must still agree on one
    * full 15-bit chunk.
    */
  def nearDuplicates(docs: DataFrame, idCol: String, textCol: String,
                     maxDistance: Int = 3): DataFrame = {
    // Cache: the sketch feeds both sides of the chunk join.
    val sk = sketch(docs, idCol, textCol)
      .cache()
      .withColumn("chunk", explode(chunks(col("simhash"))))
    // Rename the join key per side — shared lineage would otherwise make
    // chunk === chunk trivially true (cross join).
    val left = sk.select(col(idCol).as("id_a"), col("simhash").as("sim_a"),
      col("chunk").as("chunk_a"))
    val right = sk.select(col(idCol).as("id_b"), col("simhash").as("sim_b"),
      col("chunk").as("chunk_b"))
    // Hamming filter BEFORE the pair distinct: a pair agreeing on several
    // chunks appears once per agreeing chunk, but non-matching candidates
    // (the overwhelming majority) must not ride through the distinct's
    // exchange — filtering first shrinks that shuffle to the true pairs.
    left.join(right,
        col("chunk_a") === col("chunk_b") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxDistance)
      .distinct()
  }
}
