package graft

import org.apache.spark.sql.functions._
import graft.ops.{Curation, Similarity}

/** Corpus-curation semantics: segment dedup + reassembly, k-gram
  * decontamination, per-domain quotas, sequence packing, SemDeDup.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  // ---- substringDupStats -------------------------------------------------

  test("substring dup stats: shared sliding k-grams counted per doc, " +
      "short docs dropped, all-unique doc scores zero") {
    val docs = Seq(
      (1L, "a b c d e"),   // grams: "a b c", "b c d", "c d e"
      (2L, "x b c d y"),   // shares "b c d" with doc 1
      (3L, "p q r s t"),   // no shared grams → dup_frac 0
      (4L, "too short")    // < 3 tokens of gram space? 2 tokens → dropped
    ).toDF("doc_id", "text")
    val out = Curation.substringDupStats(docs, "doc_id", "text", k = 3)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    val byId = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(byId(1L) === ((3L, 1L, 1.0 / 3)))
    assert(byId(2L) === ((3L, 1L, 1.0 / 3)))
    assert(byId(3L) === ((3L, 0L, 0.0)))
  }

  test("substring dup stats: in-doc repetition alone does not mark a " +
      "gram duplicated (grams are distinct per doc)") {
    val docs = Seq(
      (1L, "a b c a b c"), // "a b c" twice in the SAME doc only
      (2L, "z z z z z z")
    ).toDF("doc_id", "text")
    val out = Curation.substringDupStats(docs, "doc_id", "text", k = 3)
      .orderBy("doc_id").collect()
    assert(out.forall(_.getLong(2) == 0L)) // n_dup = 0 for both
  }

  // ---- paragraphDedup ----------------------------------------------------

  test("paragraph dedup: first occurrence wins globally, docs reassemble") {
    // doc 1: two segments; doc 2 repeats doc 1's first segment then adds
    // its own; doc 3 is entirely doc 1's content → vanishes.
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c x y z"),
      (3L, "a b c d e f")
    ).toDF("doc_id", "text")
    val out = Curation.paragraphDedup(docs, "doc_id", "text", segWords = 3)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (1L, "a b c d e f", 2L, 2L),   // keeps both segments
      (2L, "x y z", 2L, 1L)))        // "a b c" claimed by doc 1
  }

  test("paragraph dedup: repeats INSIDE one document collapse too") {
    val docs = Seq((1L, "p q r p q r p q r")).toDF("doc_id", "text")
    val out = Curation.paragraphDedup(docs, "doc_id", "text", segWords = 3)
      .collect()
    assert(out.length === 1)
    assert(out.head.getString(1) === "p q r")
    assert(out.head.getLong(2) === 3L && out.head.getLong(3) === 1L)
  }

  test("paragraph dedup: short tail segment survives as its own unit") {
    val docs = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val out = Curation.paragraphDedup(docs, "doc_id", "text", segWords = 3)
      .collect()
    assert(out.head.getString(1) === "a b c d")
    assert(out.head.getLong(2) === 2L) // segments: "a b c", "d"
  }

  test("paragraph dedup: null and empty texts contribute nothing") {
    val docs = Seq((1L, "a b c"), (2L, ""), (3L, null))
      .toDF("doc_id", "text")
    val out = Curation.paragraphDedup(docs, "doc_id", "text", segWords = 3)
    assert(out.select("doc_id").as[Long].collect().toSeq === Seq(1L))
  }

  // ---- decontaminate -----------------------------------------------------

  test("decontaminate flags exactly the docs sharing a k-gram") {
    val train = Seq(
      (10L, "the quick brown fox jumps"),   // shares 'the quick brown fox'
      (11L, "totally clean document text"),
      (12L, "quick brown fox jumps high")   // shares 'quick brown fox jumps'
    ).toDF("doc_id", "text")
    val bench = Seq(
      (1L, "the quick brown fox jumps over")
    ).toDF("doc_id", "text")
    val out = Curation.decontaminate(train, bench, "doc_id", "text", k = 4)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      (10L, 2L, 1L),   // 'the quick brown fox' + 'quick brown fox jumps'
      (12L, 1L, 1L)))  // 'quick brown fox jumps' only
  }

  test("decontaminate counts DISTINCT shared grams once per doc") {
    // Same gram repeated in the training doc → one shared gram.
    val train = Seq((10L, "x y x y x y")).toDF("doc_id", "text")
    val bench = Seq((1L, "x y x")).toDF("doc_id", "text")
    val out = Curation.decontaminate(train, bench, "doc_id", "text", k = 2)
      .collect()
    assert(out.length === 1)
    // train doc distinct 2-grams: "x y", "y x"; bench has both.
    assert(out.head.getLong(1) === 2L)
  }

  // ---- domainCap ---------------------------------------------------------

  test("cross-shard dup matrix attributes each near-dup pair to its " +
      "unordered shard pair") {
    val txt = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, txt, "s1"),          // dup cluster {1,2,3}: s1-s2 + s1-s2 + s2-s2
      (2L, txt, "s2"),
      (3L, txt, "s2"),
      (4L, "totally different words here entirely", "s1") // no dups
    ).toDF("doc_id", "text", "source")
    val m = Curation.crossShardDupMatrix(docs, "doc_id", "text", "source",
        k = 3, m = 16, nBands = 4, threshold = 0.5)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // pairs (1,2) and (1,3) cross shards; (2,3) is shard-local
    assert(m === Map(("s1", "s2") -> 2L, ("s2", "s2") -> 1L))
  }

  test("domain cap keeps the longest `cap` docs per source") {
    val docs = Seq(
      (1L, "a", 100L), (2L, "a", 300L), (3L, "a", 200L),
      (4L, "b", 50L)
    ).toDF("doc_id", "source", "n_chars")
    val out = Curation.domainCap(docs, "source", "n_chars", "doc_id", cap = 2)
      .orderBy("source", "rank")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    assert(out.toSeq === Seq((2L, "a", 1L), (3L, "a", 2L), (4L, "b", 1L)))
  }

  test("domain cap ties break on doc id (deterministic)") {
    val docs = Seq((2L, "a", 100L), (1L, "a", 100L))
      .toDF("doc_id", "source", "n_chars")
    val out = Curation.domainCap(docs, "source", "n_chars", "doc_id", cap = 1)
      .collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L))
  }

  // ---- packSequences -----------------------------------------------------

  test("sequence packing bins by prefix sum within a shard") {
    val docs = Seq(
      (1L, "s", ("w " * 300).trim),  // 300 tokens → seq 0, offset 0
      (2L, "s", ("w " * 300).trim),  // prefix 300 → seq 0, offset 300
      (3L, "s", ("w " * 100).trim),  // prefix 600 → seq 1, offset 88
      (4L, "t", ("w " * 10).trim)    // other shard → seq 0, offset 0
    ).toDF("doc_id", "shard_in", "text")
    val out = Curation.packSequences(docs, "shard_in", "doc_id", "text", 512)
      .orderBy("shard", "doc_id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq === Seq(
      ("s", 1L, 300L, 0L, 0L),
      ("s", 2L, 300L, 0L, 300L),
      ("s", 3L, 100L, 1L, 88L),
      ("t", 4L, 10L, 0L, 0L)))
  }

  // ---- semDedup ----------------------------------------------------------

  test("semdedup drops near-identical vectors within a cell, keeps keeper") {
    // Two tight groups along axes; ids 0..n pick centroids by hash order,
    // but identical/near-identical vectors always share a cell whatever
    // centroid wins, so drops are stable.
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0.999f, 0.001f, 0f, 0f)),  // near-dup of 0
      (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(0f, 0.999f, 0.001f, 0f)),  // near-dup of 2
      (4L, Array(0f, 0f, 0f, 1f))           // lone
    ).toDF("vec_id", "embedding")
    val out = Similarity.semDedup(vecs, "vec_id", "embedding",
        threshold = 0.95, nCells = 2)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    // Whatever 2-cell clustering the hash sample picks, each near-dup pair
    // lands in one cell: 1 dropped for 0, 3 dropped for 2 (if colocated).
    assert(out.contains((1L, 0L)) || out.contains((3L, 2L)))
    // and nothing is ever dropped against a HIGHER id:
    assert(out.forall { case (dropped, keeper) => keeper < dropped })
  }

  test("semdedup with one cell equals brute-force near-dup pairs") {
    val vecs = Seq(
      (0L, Array(1f, 0f)), (1L, Array(1f, 0.01f)), (2L, Array(0f, 1f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.semDedup(vecs, "vec_id", "embedding",
        threshold = 0.99, nCells = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((1L, 0L, 1L)))
  }

  test("sampled LSH recall estimate tracks the full-corpus truth") {
    // The d16 gate's audit discipline, validated against the thing it
    // replaces: exact Jaccard truth over the WHOLE sf0.01 corpus (cheap
    // here, corpus-quadratic at scale) vs truth over the deterministic
    // id-hash half-sample (pair rate 1/4). The estimator restricts both
    // candidates and truth to sampled endpoints, so sample membership is
    // independent of LSH bucketing and the estimate must land near the
    // full number.
    import graft.ops.MinHashDedup
    val docs = Tables.load(spark, "/root/testdata/sf0.01", "documents")
    def inSample(c: org.apache.spark.sql.Column) =
      conv(substring(md5(c.cast("string")), 1, 1), 16, 10)
        .cast("long") < 8
    val cand = MinHashDedup.lshCandidatePairs(docs, "doc_id", "text",
      k = 3, m = 16, nBands = 4, maxBucket = 1000).cache()
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val fullTruth = pairSet(MinHashDedup.ngramJaccardPairs(
      docs.withColumn("__blk", lit(0)), "doc_id", "text", "__blk",
      k = 3, threshold = 0.3))
    val sampTruth = pairSet(MinHashDedup.ngramJaccardPairs(
      docs.filter(inSample(col("doc_id"))).withColumn("__blk", lit(0)),
      "doc_id", "text", "__blk", k = 3, threshold = 0.3))
    // sampled truth IS the full truth restricted to sampled endpoints
    assert(sampTruth.subsetOf(fullTruth))
    assert(sampTruth.nonEmpty, "sample too thin to audit at sf0.01")
    val candAll = pairSet(cand)
    val candS = pairSet(
      cand.filter(inSample(col("id_a")) && inSample(col("id_b"))))
    val fullRecallBp = (candAll & fullTruth).size * 10000L / fullTruth.size
    val estRecallBp = (candS & sampTruth).size * 10000L / sampTruth.size
    assert(math.abs(estRecallBp - fullRecallBp) <= 1000L,
      s"sampled estimate $estRecallBp vs full $fullRecallBp")
  }
}
