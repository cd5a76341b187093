package graft

import org.apache.spark.sql.functions._
import graft.functions.RollingHash
import graft.ops._
import graft.streaming.StreamOps

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token and punct counts") {
    val df = Seq("  Hello, world!  one two ").toDF("text")
    val r = df.select(
      TextAnalysis.tokenCount($"text").as("t"),
      TextAnalysis.punctCount($"text").as("p")).head()
    assert(r.getInt(0) === 4)
    assert(r.getInt(1) === 2)
  }

  test("fingerprint is order- and multiplicity-insensitive") {
    val df = Seq(("a b c a", 1), ("c b a", 2), ("a b d", 3)).toDF("text", "id")
    val fps = df.select(TextAnalysis.fingerprint($"text"))
      .collect().map(_.getString(0))
    assert(fps(0) === fps(1))
    assert(fps(0) !== fps(2))
  }

  test("langid picks the dominant stopword language, en precedence on tie") {
    val r = Seq("le chat est sur la table et il dort que pour")
      .toDF("text").select(TextAnalysis.langId($"text")).head().getString(0)
    assert(r === "fr")
    val tie = Seq("xyz abc").toDF("text")
      .select(TextAnalysis.langId($"text")).head().getString(0)
    assert(tie === "en")
  }

  test("char entropy: zero for a single repeated char, ln(2) for a " +
      "two-char balance, empty/null docs dropped") {
    val docs = Seq((1L, "aaaa"), (2L, "ab"), (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.charEntropy(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L)) // empty dropped
    assert(out(0).getLong(2) === 0L) // entropy_fp: ln(4/4) = 0
    // "ab": each char contributes 1 * round(ln(2)*1e9)
    val ln2fp = math.round(math.log(2.0) * 1e9)
    assert(out(1).getLong(2) === 2 * ln2fp)
    assert(math.abs(out(1).getDouble(3) - math.log(2.0)) < 1e-6)
  }
}

class RollingHashSpec extends SparkSpec {
  import spark.implicits._

  test("matches the reference arithmetic") {
    assert(RollingHash.hash("") === 0L)
    assert(RollingHash.hash("ab") === 3105L) // (0*31+97)*31+98
  }

  test("expression evaluates through codegen inside a DataFrame") {
    RollingHash.register(spark)
    val out = Seq("ab", "ba", "ab").toDF("s")
      .select(expr("rolling_hash(s)").as("h")).collect().map(_.getLong(0))
    assert(out(0) === 3105L)
    assert(out(0) === out(2))
    assert(out(0) !== out(1)) // order-sensitive by design
  }
}

class MinHashDedupSpec extends SparkSpec {
  import spark.implicits._

  test("shingles of a 5-token doc with k=3") {
    val sh = Seq("a b c d e").toDF("text")
      .select(MinHashDedup.shingles(
        TextAnalysis.tokens($"text"), 3).as("sh"))
      .head().getSeq[String](0)
    assert(sh === Seq("a b c", "b c d", "c d e"))
  }

  test("near-identical docs are found with jaccard ~1, unrelated are not") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again today"),
      (2L, "the quick brown fox jumps over the lazy dog again tonight"),
      (3L, "completely different words about spark query engines here now")
    ).toDF("doc_id", "text")
    val pairs = MinHashDedup.nearDuplicates(docs, "doc_id", "text",
      threshold = 0.5).collect()
    assert(pairs.length === 1)
    assert(pairs.head.getLong(0) === 1L && pairs.head.getLong(1) === 2L)
    assert(pairs.head.getDouble(3) > 0.7)
  }

  test("exact duplicates group by content hash") {
    val docs = Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    val groups = MinHashDedup.exactDuplicates(docs, "doc_id", "text")
      .orderBy(desc("n_docs")).collect()
    assert(groups.length === 2)
    assert(groups.head.getLong(1) === 2L) // n_docs
    assert(groups.head.getLong(2) === 1L) // keeper = min id
  }
}

class SimHashSpec extends SparkSpec {
  import spark.implicits._

  test("identical shingle sets give identical sketches; hamming 0 pair") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six seven")
    ).toDF("doc_id", "text")
    val pairs = SimHash.nearDuplicates(docs, "doc_id", "text",
      maxDistance = 3).collect()
    assert(pairs.length === 1)
    assert(pairs.head.getLong(2) === 0L)
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine of identical vectors is ~1, orthogonal ~0") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f))
    ).toDF("a", "b")
    val cs = df.select(Similarity.cosine($"a", $"b")).collect()
      .map(_.getDouble(0))
    assert(math.abs(cs(0) - 1.0) < 1e-9)
    assert(math.abs(cs(1)) < 1e-9)
  }

  test("unigram surprisal: rarer tokens score higher; fixed-point sum " +
      "matches the closed form") {
    val docs = Seq(
      (1L, "the the the the"), // 4 of the commonest token → lowest avg_nll
      (2L, "the the rare word") // two singletons → strictly higher
    ).toDF("doc_id", "text")
    val out = TextAnalysis.unigramSurprisal(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(4L, 4L)) // n_tokens
    // p(the) = 6/8, p(rare) = p(word) = 1/8; per-token fp = round(-ln p * 1e9)
    val nllThe = math.round(-math.log(6.0 / 8) * 1e9)
    val nllRare = math.round(-math.log(1.0 / 8) * 1e9)
    assert(out(0).getLong(2) === 4 * nllThe)
    assert(out(1).getLong(2) === 2 * nllThe + 2 * nllRare)
    assert(out(0).getDouble(3) < out(1).getDouble(3))
  }

  test("filtered top-k: predicate excludes candidates before ranking") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(0.9f, 0.1f), 1), // best match but filtered out
      (2L, Array(0.5f, 0.5f), 0),
      (3L, Array(0.0f, 1.0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val r = Similarity.filteredTopK(vecs, vecs.filter($"vec_id" === 0),
        $"label" === 0, "vec_id", "embedding", k = 2)
      .orderBy("rank").collect()
    assert(r.map(_.getLong(1)).toSeq === Seq(2L, 3L)) // 1L never scored
  }

  test("BPE training learns the classic low/lower merges in order and " +
      "applies each merge greedily left-to-right") {
    // counts: 'lo' pair appears in low(x3)+lower+lowest = 5 → first merge;
    // then 'low' = 5 → second; then 'e'+'l' from hello(x3)+help = 4
    val docs = Seq(
      (1L, "hello hello help low lower lowest"),
      (2L, "low low hello")
    ).toDF("doc_id", "text")
    val m = TextAnalysis.bpeTrain(docs, "text", nMerges = 4)
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    assert(m.toSeq === Seq(("l", "o", 8L), ("lo", "w", 5L),
      ("e", "l", 4L), ("h", "el", 4L)))
  }

  test("BPE encode applies the learned merges in rank order and reports " +
      "per-doc subword counts") {
    val docs = Seq(
      (1L, "hello hello help low lower lowest"),
      (2L, "low low hello")
    ).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, "text", nMerges = 4)
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val out = TextAnalysis.bpeEncode(docs, "doc_id", "text", merges)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // merges (l,o)(lo,w)(e,l)(h,el): hello→[hel,lo]=2, help→[hel,p]=2,
    // low→[low]=1, lower→[low,e,r]=3, lowest→[low,e,s,t]=4
    assert(out.toSeq === Seq((1L, 6L, 14L, 28L), (2L, 3L, 4L, 11L)))
  }

  test("BPE merge fold is leftmost-non-overlapping: a chain 'a a a' " +
      "merges the first pair only") {
    val docs = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    // round 1 learns (a,a) with weight 2 docs × 2 adjacent pairs = 4;
    // applying it to "a a a" must yield [aa, a], so round 2 sees the
    // (aa, a) pair — not a second (a, a)
    val m = TextAnalysis.bpeTrain(docs, "text", nMerges = 2)
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2)))
    assert(m.toSeq === Seq(("a", "a"), ("aa", "a")))
  }

  test("compiled BPE merge fold is element-for-element identical to " +
      "the chained SQL aggregate folds") {
    // Adversarial symbol set: self-pair (a,a) pins leftmost-non-
    // overlap, multi-char merges chain onto earlier outputs, a pair
    // whose `b` equals an earlier MERGED symbol must only match the
    // raw input symbol, and a null element must pass through unmerged.
    val merges = Seq(("a", "a"), ("aa", "b"), ("c", "aab"), ("x", "y"))
    val words = Seq(
      "aaab", "aaaab", "caab", "caaab", "abc", "xyxy", "xxyy",
      "", "a", "b", "cacaabab", "aabaab"
    ).toDF("word")
      .select($"word", split($"word", "").as("rep"))
    var sql = words
    merges.foreach { case (a, b) =>
      sql = sql.withColumn("rep", expr(TextAnalysis.mergeFoldSql(a, b)))
    }
    val compiled = words.withColumn("rep",
      TextAnalysis.bpeApply($"rep", merges))
    val s = sql.orderBy("word").collect().map(r =>
      (r.getString(0), r.getSeq[String](1)))
    val c = compiled.orderBy("word").collect().map(r =>
      (r.getString(0), r.getSeq[String](1)))
    assert(c.toSeq === s.toSeq)
    assert(c.exists { case (w, rep) =>
      w == "caaab" && rep == Seq("c", "aa", "a", "b") })
    // null elements pass through unmerged, like SQL's null-propagating
    // `=` falling to the append branch (compiled path only: the SQL
    // fold's zero literal types its accumulator non-nullable)
    val nulled = Seq(Tuple1("x")).toDF("w")
      .select(TextAnalysis.bpeApply(
        array(lit("a"), lit(null), lit("a")), merges).as("rep"))
      .collect().head.getSeq[String](0)
    assert(nulled === Seq("a", null, "a"))
  }

  test("batched BPE training is merge-for-merge identical to the " +
      "sequential argmax loop") {
    // Conflict- and tie-rich corpus: shared symbols across the top
    // pairs force the batch cut, repeated counts exercise the tie
    // trim, and 30 merges span many batch rounds.
    val docs = Seq(
      (1L, "the then there these theme them"),
      (2L, "lower lowest low slow slower glow"),
      (3L, "in inner inn din dinner winner"),
      (4L, "aaa aaab baaa aa ab ba"),
      (5L, "the lowest inner theme slower dinner")
    ).toDF("doc_id", "text")
    val seqM = TextAnalysis.bpeTrain(docs, "text", nMerges = 30, batch = 1)
      .orderBy("merge_rank").collect().map(_.toSeq).toSeq
    val batM = TextAnalysis.bpeTrain(docs, "text", nMerges = 30, batch = 8)
      .orderBy("merge_rank").collect().map(_.toSeq).toSeq
    assert(batM === seqM)
  }

  test("backoff surprisal: seen bigram scores the ratio, unseen " +
      "continuation backs off with alpha, OOV pays the pseudo-count") {
    val docs = Seq(
      (0L, "a b a b"), // the reference half: unigrams a=2 b=2, bigram a-b=2, b-a=1
      (1L, "b b c")    // scored against it: b-b unseen → backoff; c OOV
    ).toDF("doc_id", "text")
    val out = TextAnalysis.backoffSurprisal(docs, "doc_id", "text",
        trainFilter = $"doc_id" % 2 === 0)
      .orderBy("doc_id").collect()
    val fp = (p: Double) => math.round(-math.log(p) * 1e9)
    // doc 0 (in-reference): init a = -ln(2/4); b|a = -ln(2/2);
    // a|b = -ln(1/2); b|a = -ln(2/2) — no backoff, no OOV
    assert(out(0).getLong(1) === 4L) // n_tokens
    assert(out(0).getLong(2) === 0L) // n_backoff
    assert(out(0).getLong(3) === 0L) // n_oov
    assert(out(0).getLong(4) === fp(2.0 / 4) + fp(2.0 / 2) + fp(1.0 / 2)
      + fp(2.0 / 2))
    // doc 1: init b = -ln(2/4); b|b unseen → -ln(0.4·(2/4)); c OOV after b
    // → -ln(0.4·(1/4)) — two backoffs, one OOV
    assert(out(1).getLong(2) === 2L)
    assert(out(1).getLong(3) === 1L)
    assert(out(1).getLong(4) === fp(2.0 / 4) +
      math.round(-math.log(0.4 * (2.0 / 4)) * 1e9) +
      math.round(-math.log(0.4 * (1.0 / 4)) * 1e9))
  }

  test("range search returns every candidate in the radius, no self") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)),  // cos ~0.994
      (2L, Array(0.5f, 0.5f)),  // cos ~0.707
      (3L, Array(0.0f, 1.0f))   // cos 0
    ).toDF("vec_id", "embedding")
    val r = Similarity.rangeSearch(vecs, vecs.filter($"vec_id" === 0),
      "vec_id", "embedding", threshold = 0.5).orderBy("c_id").collect()
    assert(r.map(_.getLong(1)).toSeq === Seq(1L, 2L))
    // tightening the radius can only shrink the result set
    val tight = Similarity.rangeSearch(vecs, vecs.filter($"vec_id" === 0),
      "vec_id", "embedding", threshold = 0.9).collect()
    assert(tight.map(_.getLong(1)).toSet === Set(1L))
  }

  test("LSH range search is a subset of exact range search with " +
      "precision 1, and equals it restricted to shared buckets") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val qs = emb.filter($"vec_id" < 8)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.rangeSearch(emb, qs,
      "vec_id", "embedding", threshold = 0.3))
    val approx = pairs(Similarity.lshRangeSearch(emb, qs,
      "vec_id", "embedding", threshold = 0.3, nPlanes = 4))
    assert(approx.subsetOf(exact)) // exact refine → precision 1
    // the subset is exactly the true pairs whose endpoints share a bucket
    val buckets = emb.select($"vec_id",
      Similarity.lshBucket($"embedding", 4).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = exact.filter { case (q, c) => buckets(q) == buckets(c) }
    assert(approx === expected)
  }

  test("brute-force top-k excludes self and ranks by similarity") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val r = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0),
      "vec_id", "embedding", k = 2).orderBy("rank").collect()
    assert(r.map(_.getLong(1)).toSeq === Seq(1L, 2L))
  }

  test("IVF top-k: high recall vs brute force on the real embeddings") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter($"vec_id" < 8)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(emb, queries,
      "vec_id", "embedding", k = 5))
    val ivf = pairs(Similarity.ivfTopK(emb, queries,
      "vec_id", "embedding", k = 5, nCells = 8, nProbe = 3))
    assert(ivf.size === exact.size) // every query filled its top-k
    val recall = (ivf & exact).size.toDouble / exact.size
    // 3-of-8 probed cells: most true neighbors share the query's cells
    assert(recall >= 0.5, s"IVF recall too low: $recall")
    // widening the probe can only add candidates → recall is monotone
    val ivfAll = pairs(Similarity.ivfTopK(emb, queries,
      "vec_id", "embedding", k = 5, nCells = 8, nProbe = 8))
    assert(ivfAll === exact) // probing every cell == brute force
  }

  test("group centroids: exact fixed-point sums and means") {
    val vecs = Seq(
      (1L, Array(1.0f, 2.0f)),
      (1L, Array(3.0f, 4.0f)),
      (2L, Array(-1.0f, 0.5f))
    ).toDF("grp", "embedding")
    val got = Similarity.groupCentroids(vecs, "grp", "embedding")
      .orderBy("grp", "dim")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(got.toSeq === Seq(
      (1L, 0L, 4000000L, 2L, 2.0), (1L, 1L, 6000000L, 2L, 3.0),
      (2L, 0L, -1000000L, 1L, -1.0), (2L, 1L, 500000L, 1L, 0.5)))
  }

  test("k-means step partitions the whole corpus across cells") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val total = emb.count()
    val step = Similarity.kmeansStep(emb, "vec_id", "embedding", nCells = 8)
    val perCell = step.filter($"dim" === 0)
      .select("n").collect().map(_.getLong(0))
    assert(perCell.sum === total) // every vector assigned exactly once
    assert(perCell.length === 8)  // no cell starves on this corpus
    // 64 dims per surviving cell, nothing else
    assert(step.count() === perCell.length * 64L)
  }

  test("Lloyd iterations improve the average cosine to the centroid") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    def avgCos(assigned: org.apache.spark.sql.DataFrame): Double =
      assigned.agg(avg($"cos")).head().getDouble(0)
    var cents = Similarity.centroidVectors(
      Similarity.kmeansStep(emb, "vec_id", "embedding", nCells = 8),
      "cent_id")
    val first = avgCos(Similarity.assignTo(emb, cents, "vec_id", "embedding"))
    var last = first
    for (_ <- 1 to 2) {
      val assigned = Similarity.assignTo(emb, cents, "vec_id", "embedding")
      cents = Similarity.centroidVectors(
        Similarity.groupCentroids(
          assigned.select($"cent_id", $"v_vec".as("embedding")),
          "cent_id", "embedding"),
        "cent_id")
      last = avgCos(Similarity.assignTo(emb, cents, "vec_id", "embedding"))
    }
    // Raw (unnormalized) means are not the exact spherical-k-means argmax,
    // so per-step monotonicity is not guaranteed in theory — but on this
    // corpus the end-to-end objective must improve, and every vector stays
    // assigned exactly once.
    assert(last > first, s"no improvement: $first -> $last")
    val n = Similarity.assignTo(emb, cents, "vec_id", "embedding").count()
    assert(n === emb.count())
  }

  test("incremental dedup: corpus wins, within-batch keeps the lowest id") {
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight")
    ).toDF("doc_id", "text")
    val increment = Seq(
      // near-identical to corpus doc 100 → dropped (corpus wins)
      (10L, "the quick brown fox jumps over the lazy dog tonight"),
      // 20/30 near-dup each other → 30 (higher id) dropped, 20 kept
      (20L, "completely different words fill this new document body here"),
      (30L, "completely different words fill this new document body here"),
      // unique → kept
      (40L, "nothing else in any batch resembles this sentence at all"),
      // too short for trigrams → no bands → sails through
      (50L, "tiny text")
    ).toDF("doc_id", "text")
    val kept = graft.ops.MinHashDedup.incrementalNearDuplicates(
        increment, corpus, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(20L, 40L, 50L))
    // empty corpus: only the within-batch canonical-keeper policy applies
    val keptNoCorpus = graft.ops.MinHashDedup.incrementalNearDuplicates(
        increment, corpus.limit(0), "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptNoCorpus === Set(10L, 20L, 40L, 50L))
  }

  test("ngram containment flags subset duplication jaccard misses") {
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, base, "src"),
      // doc 1 pasted inside a much longer doc: containment(1 in 2) = 1.0
      (2L, base + " one two three four five six seven eight nine ten " +
        "eleven twelve thirteen fourteen fifteen sixteen", "src"),
      (3L, "totally different words entirely here now", "src")
    ).toDF("doc_id", "text", "source")
    val got = graft.ops.MinHashDedup.ngramContainmentPairs(docs, "doc_id",
        "text", "source", k = 3, threshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.keySet === Set((1L, 2L)))
    assert(got((1L, 2L))._1 === 1.0) // every trigram of 1 is in 2
    assert(got((1L, 2L))._2 < 0.5)   // but 2 is NOT contained in 1
    // jaccard on the same pair is low — containment catches what it misses
    val jac = graft.ops.MinHashDedup.ngramJaccardPairs(docs, "doc_id",
      "text", "source", k = 3, threshold = 0.5)
    assert(jac.count() === 0L)
  }

  test("repetition stats: exact duplicate-trigram fraction per doc") {
    val docs = Seq(
      (1L, "a b c a b c a b c"),      // 7 trigrams, 3 distinct (cyclic)
      (2L, "one two three four"),     // 2 trigrams, both distinct
      (3L, "x y"),                    // fewer than k tokens → dropped
      (4L, null.asInstanceOf[String]) // null text → dropped
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(docs, "doc_id", "text", k = 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.toSeq === Seq(
      (1L, 7L, 3L, 1.0 - 3.0 / 7.0),
      (2L, 2L, 2L, 0.0)))
  }

  test("quantized ANN: int8 bounds and high recall vs exact top-k") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q8 = Similarity.quantize(emb, "embedding", "s", "q8")
    // every quantized element is a true int8 value
    val outOfRange = q8.select(explode($"q8").as("v"))
      .filter($"v" > 127 || $"v" < -127).count()
    assert(outOfRange === 0L)
    val queries = emb.filter($"vec_id" < 8)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("q_id", "c_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(emb, queries,
      "vec_id", "embedding", k = 5))
    val quant = pairs(Similarity.quantizedTopK(emb, queries,
      "vec_id", "embedding", k = 5))
    assert(quant.size === exact.size) // every query fills its top-k
    val recall = (quant & exact).size.toDouble / exact.size
    // int8 keeps ~2 decimal digits per element: the top-k boundary can
    // flip only between near-tied candidates
    assert(recall >= 0.85, s"quantized recall too low: $recall")
  }

  test("LSH ensemble near-dup: superset of single-table, recall only grows") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = pairs(Similarity.embeddingNearDuplicates(emb,
      "vec_id", "embedding", threshold = 0.45, nPlanes = 4))
    val ensemble = pairs(Similarity.embeddingNearDuplicatesEnsemble(emb,
      "vec_id", "embedding", threshold = 0.45, nPlanes = 4, nTables = 2))
    // table 0 IS the single-table index (same plane slice), so the
    // ensemble's candidate set can only grow
    assert(single.subsetOf(ensemble),
      s"ensemble lost pairs: ${single -- ensemble}")
    // ground truth: every pair at or above the threshold
    val a = emb.select($"vec_id".as("id_a"), $"embedding".as("va"))
    val b = emb.select($"vec_id".as("id_b"), $"embedding".as("vb"))
    val truth = pairs(a.join(b, $"id_a" < $"id_b")
      .withColumn("cos", Similarity.cosine($"va", $"vb"))
      .filter($"cos" >= 0.45).select("id_a", "id_b"))
    def recall(got: Set[(Long, Long)]): Double =
      if (truth.isEmpty) 1.0 else (got & truth).size.toDouble / truth.size
    assert(recall(ensemble) >= recall(single))
    assert(ensemble.subsetOf(truth)) // refine step keeps precision exact
  }

  test("autoPlanes/autoCells: integer-exact derivation and clamps") {
    // Smallest p with 2^p * occupancy >= N — the same bit-length formula
    // the DuckDB oracles compute with length(bin(m - 1)).
    assert(Similarity.autoPlanes(500) === 4)    // sf0.01 corpus: old gate p
    assert(Similarity.autoPlanes(2000) === 6)   // sf0.1 corpus
    assert(Similarity.autoPlanes(20000) === 10) // 10x corpus: SCALE.md's 1.9s
    assert(Similarity.autoPlanes(1) === 4)      // floor clamp
    assert(Similarity.autoPlanes(Long.MaxValue) === 16) // overflow-safe clamp
    assert(Similarity.autoPlanes(20000, maxPlanes = 8) === 8) // ensemble clamp
    // exact power-of-two boundary: N/occ = 64 needs exactly 6 planes
    assert(Similarity.autoPlanes(2048) === 6)
    assert(Similarity.autoPlanes(2049) === 7)
    assert(Similarity.autoCells(500) === 16)    // sf0.01: unchanged floor
    assert(Similarity.autoCells(2000) === 64)   // sf0.1
    assert(Similarity.autoCells(20000) === 1024) // 10x corpus
  }

  test("auto-derived LSH keeps >= 97% of the fixed-parameter pair set") {
    // The round-4 lesson as a pinned contract, on the kind of corpus the
    // derivation exists for: a clone-heavy corpus (each vector replicated
    // 4x with shifted ids, the scripts/make_scale10.py discipline). The
    // derived plane count (p=6 at N=2000 vs the fixed gate's p=4) must
    // keep >= 97% of the fixed-parameter pair set — SCALE.md measured the
    // same trade at 97.6-97.8% on the 10x corpus. Exact clones share a
    // bucket at ANY plane count, so what the bound polices is the
    // moderate-similarity tail, the pairs bucket-splitting can lose.
    val base = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val emb = (0 until 4).map(r =>
        base.select(($"vec_id" + lit(r * 10000L)).as("vec_id"),
          $"embedding"))
      .reduce(_ unionAll _)
    assert(Similarity.autoPlanes(emb.count()) === 6)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val fixed = pairs(Similarity.embeddingNearDuplicates(emb,
      "vec_id", "embedding", threshold = 0.45, nPlanes = 4))
    val auto = pairs(Similarity.embeddingNearDuplicatesAuto(emb,
      "vec_id", "embedding", threshold = 0.45))
    assert(fixed.size >= 3000, s"clone corpus too thin: ${fixed.size}")
    val kept =
      if (fixed.isEmpty) 1.0 else (auto & fixed).size.toDouble / fixed.size
    assert(kept >= 0.97, s"auto-derived LSH kept only $kept of fixed pairs")
    // precision is exact either way: the refine step verifies candidates
    val a = emb.select($"vec_id".as("id_a"), $"embedding".as("va"))
    val b = emb.select($"vec_id".as("id_b"), $"embedding".as("vb"))
    val truth = pairs(a.join(b, $"id_a" < $"id_b")
      .withColumn("cos", Similarity.cosine($"va", $"vb"))
      .filter($"cos" >= 0.45).select("id_a", "id_b"))
    assert(auto.subsetOf(truth))
    // the ensemble auto path (OR-amplified) can only add candidates over
    // one of its tables; precision stays exact
    val autoEns = pairs(Similarity.embeddingNearDuplicatesEnsembleAuto(emb,
      "vec_id", "embedding", threshold = 0.45, nTables = 2))
    assert(autoEns.subsetOf(truth))
    val keptEns =
      if (fixed.isEmpty) 1.0 else (autoEns & fixed).size.toDouble / fixed.size
    assert(keptEns >= kept, s"ensemble below single table: $keptEns < $kept")
  }

  test("embedding LSH bucket cap drops degenerate buckets, keeps the rest") {
    // A crawl-spam corpus: 60 identical vectors (one hot bucket) plus two
    // genuine near-dup pairs elsewhere. With maxBucket below 60 the hot
    // bucket must contribute NO pairs — and the genuine pairs survive.
    val rng = new scala.util.Random(11)
    val spam = Array.fill(64)(rng.nextFloat() * 2 - 1)
    def jitter(base: Array[Float], eps: Float): Array[Float] = {
      val r = new scala.util.Random(17)
      base.map(x => x + (r.nextFloat() - 0.5f) * eps)
    }
    val pairA = Array.fill(64)(rng.nextFloat() * 2 - 1)
    val pairB = Array.fill(64)(rng.nextFloat() * 2 - 1)
    val rows =
      (0L until 60L).map(i => (i, spam)) ++
      Seq((100L, pairA), (101L, jitter(pairA, 0.01f)),
          (200L, pairB), (201L, jitter(pairB, 0.01f)))
    val emb = rows.toDF("vec_id", "embedding")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = pairs(Similarity.embeddingNearDuplicates(emb,
      "vec_id", "embedding", threshold = 0.45, nPlanes = 8,
      maxBucket = 1000000))
    val capped = pairs(Similarity.embeddingNearDuplicates(emb,
      "vec_id", "embedding", threshold = 0.45, nPlanes = 8, maxBucket = 50))
    assert(uncapped.exists(p => p._1 < 60 && p._2 < 60)) // spam pairs exist
    assert(!capped.exists(p => p._1 < 60 && p._2 < 60),
      "capped result still contains hot-bucket pairs")
    assert(capped.contains((100L, 101L)) && capped.contains((200L, 201L)),
      s"cap lost genuine pairs: $capped")
    // same guard on the ensemble path
    val cappedEns = pairs(Similarity.embeddingNearDuplicatesEnsemble(emb,
      "vec_id", "embedding", threshold = 0.45, nPlanes = 8, nTables = 2,
      maxBucket = 50))
    assert(!cappedEns.exists(p => p._1 < 60 && p._2 < 60))
    assert(cappedEns.contains((100L, 101L)))
  }

  test("PQ with a perfect codebook reproduces exact search bit-for-bit") {
    // When the corpus IS the sampled codeword set (16 vectors), every
    // vector reconstructs exactly, so ADC == the true dot and the PQ
    // ranking must equal brute force — the correctness pin for the whole
    // encode/LUT/ADC machinery, independent of codebook quality.
    val rng = new scala.util.Random(7)
    val vecs = (0L until 16L).map(i =>
      (i, Array.fill(64)(rng.nextFloat() * 2 - 1)))
    val emb = vecs.toDF("vec_id", "embedding")
    val queries = emb.filter($"vec_id" < 4)
    def pairs(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
      df.select("q_id", "c_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    val exact = pairs(Similarity.bruteForceTopK(emb, queries,
      "vec_id", "embedding", k = 3))
    val pq = pairs(Similarity.pqTopK(emb, queries, "vec_id", "embedding",
      k = 3, dims = 64, mSub = 4, nCodes = 16))
    assert(pq === exact) // identical pairs AND identical ranks
  }

  test("PQ top-k on the real corpus: mechanically valid, beats chance") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter($"vec_id" < 8)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("q_id", "c_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(emb, queries,
      "vec_id", "embedding", k = 5))
    val pq = Similarity.pqTopK(emb, queries, "vec_id", "embedding",
      k = 5, dims = 64, mSub = 4, nCodes = 16)
    val got = pairs(pq)
    assert(got.size === exact.size)          // every query fills its top-k
    assert(got.forall { case (q, c) => q != c }) // no self-matches
    // This corpus is the PQ-adversarial regime — its true neighbors sit
    // barely above noise (best cos ≈ 0.33), and a 16-codeword sampled
    // codebook cannot reconstruct near-noise vectors — so the honest
    // assertion is "clearly better than chance" (chance ≈ k/N ≈ 0.008),
    // with exactness pinned by the perfect-codebook test above. Production
    // recall comes from k-means-trained codebooks (kmeansIterations) and
    // float rerank of the PQ shortlist.
    val recall = (got & exact).size.toDouble / exact.size
    assert(recall >= 0.025, s"PQ recall below chance band: $recall")
  }

  test("IVF-PQ probing every cell == the full PQ scan; probes are monotone") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter($"vec_id" < 8)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("q_id", "c_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = pairs(Similarity.pqTopK(emb, queries, "vec_id", "embedding",
      k = 5, dims = 64, mSub = 4, nCodes = 16))
    val allCells = pairs(Similarity.ivfPqTopK(emb, queries, "vec_id",
      "embedding", k = 5, nCells = 16, nProbe = 16, dims = 64, mSub = 4,
      nCodes = 16))
    // probing all 16 of 16 cells scans every code — identical to plain PQ
    assert(allCells === full)
    // fewer probes only shrink the candidate pool (a candidate lives in
    // exactly one cell), so the top-k can lose pairs but never invent
    // approx scores: everything found at nProbe=4 is found at nProbe=16
    // with an equal-or-better rank cutoff applied to a SUPERSET pool —
    // assert the weaker, always-true form: result sizes are sane and
    // every pair is a real (query, corpus) pair
    val probed = pairs(Similarity.ivfPqTopK(emb, queries, "vec_id",
      "embedding", k = 5, nCells = 16, nProbe = 4, dims = 64, mSub = 4,
      nCodes = 16))
    assert(probed.nonEmpty && probed.forall { case (q, c) => q != c })
    assert(probed.size <= full.size)
  }

  test("kmeansIterations(2) == manual densify→reassign→re-mean unroll") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val got = Similarity.kmeansIterations(emb, "vec_id", "embedding",
      nCells = 8, iters = 2).orderBy("cent_id", "dim").collect()
    val cents = Similarity.centroidVectors(
      Similarity.kmeansStep(emb, "vec_id", "embedding", nCells = 8),
      "cent_id")
    val manual = Similarity.groupCentroids(
      Similarity.assignTo(emb, cents, "vec_id", "embedding")
        .select($"cent_id", $"v_vec"),
      "cent_id", "v_vec").orderBy("cent_id", "dim").collect()
    assert(got.toSeq === manual.toSeq)
  }

  test("multi-probe LSH strictly improves recall over single-probe") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter($"vec_id" < 8)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(emb, queries,
      "vec_id", "embedding", k = 5))
    val single = pairs(Similarity.lshTopK(emb, queries,
      "vec_id", "embedding", k = 5, nPlanes = 4))
    val multi = pairs(Similarity.lshTopKMultiProbe(emb, queries,
      "vec_id", "embedding", k = 5, nPlanes = 4))
    def recall(got: Set[(Long, Long)]): Double =
      (got & exact).size.toDouble / exact.size
    // The probe set contains the single-probe bucket, so the candidate
    // pool only grows — recall is monotone in the probe count.
    assert(recall(multi) >= recall(single),
      s"multi ${recall(multi)} < single ${recall(single)}")
    // 1-bit flips reach Hamming-1 neighbours: with 4 planes that is 5 of
    // 16 buckets, and on this corpus it must repair real misses.
    assert(recall(multi) > recall(single),
      s"expected strict recall gain at sf0.001: single=${recall(single)}")
  }
}

class CorpusCountMemoSpec extends SparkSpec {
  import spark.implicits._

  test("composed auto-parameter operators pay ONE count job for the " +
      "same corpus") {
    Similarity.clearCountMemo()
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // Two auto operators over the same corpus: parameter derivation
      // (the part that counts) must run exactly one Spark job total —
      // plan construction is otherwise lazy, so every job seen here IS
      // a count job.
      // listener delivery is async: poll until the count settles
      def settled(): Int = {
        var last = -1
        var stableMs = 0L
        val deadline = System.currentTimeMillis + 5000
        while (stableMs < 300 && System.currentTimeMillis < deadline) {
          if (jobs == last) stableMs += 50 else { last = jobs; stableMs = 0 }
          Thread.sleep(50)
        }
        jobs
      }
      // One count() may span several Spark jobs under AQE (one per
      // query stage), so assert DELTAS: the first auto operator pays
      // the count, the second (same corpus) adds ZERO jobs.
      Similarity.embeddingNearDuplicatesAuto(emb, "vec_id", "embedding",
        threshold = 0.45)
      val afterFirst = settled()
      assert(afterFirst > 0, "first operator should pay a count")
      Similarity.semDedupAuto(emb, "vec_id", "embedding",
        threshold = 0.45)
      assert(settled() === afterFirst,
        s"second operator re-counted the same corpus: $jobs vs $afterFirst")
      // an alias-only rewrite of the same plan canonicalizes equal: hit
      Similarity.semDedupAuto(emb.as("other"), "vec_id", "embedding",
        threshold = 0.45)
      assert(settled() === afterFirst,
        s"aliased same-plan corpus re-counted: $jobs vs $afterFirst")
      // a structurally different plan is a different corpus: new count
      Similarity.embeddingNearDuplicatesAuto(
        emb.filter($"vec_id" % 2 === 0), "vec_id", "embedding",
        threshold = 0.45)
      assert(settled() > afterFirst, s"filtered corpus must re-count")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      Similarity.clearCountMemo()
    }
  }
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("MediaDecoder quarantines text and decodes real containers " +
      "through mapPartitions") {
    val media = Seq((7L, "abc")).toDF("doc_id", "text")
    val feats = Multimodal.extractFeatures(spark,
      Multimodal.toMediaTable(media)).collect()
    // text payload: no container magic → all-NULL features, row kept
    assert(feats.head === Multimodal.MediaFeatures(7L, 3L, None, None,
      None, None, None, None, None))
    // image fixture: real header dims via the composed MediaDims kernel
    val png = Multimodal.extractFeatures(spark,
        Multimodal.fixtureMedia(spark))
      .collect().map(f => f.doc_id -> f).toMap
    assert(png(-5L) === Multimodal.MediaFeatures(-5L, 33L, Some("png"),
      Some(640L), Some(480L), None, None, None, None))
    assert(png(-1L).format === None)
    // WAV fixture: real PCM stats via the composed AudioBlocks kernel
    val wav = Multimodal.extractFeatures(spark,
        Multimodal.fixtureWavs(spark))
      .collect().map(f => f.doc_id -> f).toMap
    assert(wav(-30L) === Multimodal.MediaFeatures(-30L, 60L, Some("wav"),
      None, None, Some(1L), Some(8000L), Some(32768L),
      Some(2149428163L)))
    assert(wav(-28L) === Multimodal.MediaFeatures(-28L, 26L, Some("flac"),
      None, None, Some(2L), Some(48000L), None, None))
  }

  test("frame sampling slices the payload") {
    val media = Multimodal.toMediaTable(
      Seq((1L, "abcdefgh")).toDF("doc_id", "text"))
    val frames = Multimodal.sampleFrames(media, frameSize = 3, nFrames = 3)
      .orderBy("frame_idx").collect()
    assert(frames.map(r => new String(r.getAs[Array[Byte]]("frame_bytes")))
      .toSeq === Seq("abc", "def", "gh"))
  }

  test("GIF frame walk: frames, placements, GCE delays, local palettes") {
    val rows = Multimodal.gifFrameTable(Multimodal.fixtureGifs(spark))
      .orderBy("doc_id", "frame_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5),
        if (r.isNullAt(6)) -1L else r.getLong(6), r.getBoolean(7)))
    assert(rows.toSeq === Seq(
      (-23L, 0L, 0L, 0L, 4L, 3L, 10L, false),
      (-23L, 1L, 1L, 1L, 2L, 2L, 200L, true),
      (-22L, 0L, 0L, 0L, 2L, 2L, -1L, false)))
    // the truncated fixture (-21) and non-GIF payloads emit zero rows
    val all = Multimodal.gifFrameTable(
      Multimodal.fixtureGifs(spark).unionByName(
        Multimodal.toMediaTable(Seq((1L, "plain text")).toDF("doc_id", "text"))))
    assert(all.filter(col("doc_id") === -21L || col("doc_id") === 1L).isEmpty)
  }

  test("GIF frame walk never throws on malformed bytes and keeps frames " +
      "parsed before a truncation") {
    import graft.functions.GifFrames
    assert(GifFrames.decode(null) === null)
    assert(GifFrames.decode("GIF89a".getBytes) === null) // < 13 bytes
    assert(GifFrames.decode("notagif-------".getBytes) === null)
    // fixture -23 cut mid-way through frame 2's descriptor: frame 1 kept
    val full = Multimodal.fixtureGifs(spark)
      .filter(col("doc_id") === -23L)
      .select("payload").head().getAs[Array[Byte]](0)
    val cut = GifFrames.decode(full.take(full.length - 20))
    assert(cut.numElements() === 1)
  }

  test("BMP thumbnail: real box-averaged pixels, bottom-up and top-down") {
    val out = Multimodal.pixelThumbnails(Multimodal.fixtureBmps(spark), 2, 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(2)))
    assert(out.toSeq === Seq(
      (-20L, "7f7f007f7fff4040409f209f"),
      (-19L, "0a141e28323c46505a646e78"),
      (-18L, null))) // 8-bpp refused → quarantined NULL, row kept
  }

  test("BMP thumbnail 1x1 is the whole-image mean; undersized grids " +
      "and short payloads refuse with NULL") {
    import graft.functions.BmpThumb
    val px = Multimodal.fixtureBmps(spark)
      .filter(col("doc_id") === -19L)
      .select("payload").head().getAs[Array[Byte]](0)
    // mean of (10,20,30)(40,50,60)(70,80,90)(100,110,120) = (55,65,75)
    assert(BmpThumb.decode(px, 1, 1).toString === "37414b")
    assert(BmpThumb.decode(px, 3, 3) === null) // 2x2 image, 3x3 grid
    assert(BmpThumb.decode(px.take(40), 1, 1) === null)
    assert(BmpThumb.decode(null, 1, 1) === null)
  }

  test("PNG thumbnail: full decode (inflate + Sub/Paeth/Up unfilter) " +
      "agrees with the BMP decode on identical pixels") {
    val out = Multimodal.pngThumbnails(Multimodal.fixturePngs(spark), 2, 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(2)))
    assert(out.toSeq === Seq(
      (-17L, "7f7f007f7fff4040409f209f"), // == BMP fixture -20's thumb
      (-16L, "0a141e28323c46505a646e78"), // alpha 0/128/255/7 excluded
      (-15L, null))) // palette refused
  }

  test("PNG thumbnail refuses malformed, truncated, and bomb payloads " +
      "without throwing") {
    import graft.functions.PngThumb
    val full = Multimodal.fixturePngs(spark)
      .filter(col("doc_id") === -17L)
      .select("payload").head().getAs[Array[Byte]](0)
    assert(PngThumb.decode(null, 1, 1) === null)
    assert(PngThumb.decode("notapng".getBytes, 1, 1) === null)
    assert(PngThumb.decode(full.take(50), 1, 1) === null) // cut IDAT
    assert(PngThumb.decode(full, 8, 8) === null) // grid > image
    // a header claiming 1e9x1e9 pixels must refuse BEFORE allocating
    val bomb = full.clone()
    bomb(16) = 0x40.toByte // width high byte → 1G+
    assert(PngThumb.decode(bomb, 1, 1) === null)
    // 1x1 grid = whole-image mean of the truecolor fixture's 8 pixels
    val px = Seq((255,0,0),(0,255,0),(0,0,255),(255,255,255),
      (0,0,0),(128,128,128),(64,64,64),(255,0,255))
    val exp = Seq(px.map(_._1).sum / 8, px.map(_._2).sum / 8,
      px.map(_._3).sum / 8).map(v => f"$v%02x").mkString
    assert(PngThumb.decode(full, 1, 1).toString === exp)
  }

  test("EXIF walk: both byte orders, out-of-line ASCII, NUL stripping; " +
      "EXIF-less and truncated payloads degrade to NULL") {
    val out = Multimodal.exifMetadata(Multimodal.fixtureExif(spark))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        r.getString(2), r.getString(3), r.getString(4)))
    assert(out.toSeq === Seq(
      (-14L, 6L, "Acme", "X100", "2024:01:15 10:30:00"),
      (-13L, 3L, null, null, null),
      (-12L, -1L, null, null, null)))
    import graft.functions.ExifMeta
    assert(ExifMeta.decode(null) === null)
    assert(ExifMeta.decode("text".getBytes) === null)
    val full = Multimodal.fixtureExif(spark)
      .filter(col("doc_id") === -14L)
      .select("payload").head().getAs[Array[Byte]](0)
    // cut inside the IFD data area: bounds checks return partial/NULL
    // fields rather than throwing
    assert(ExifMeta.decode(full.take(30)) === null)
  }

  test("file-based ingestion: binaryFiles → media table → decode") {
    val dir = java.nio.file.Files.createTempDirectory("graft_media")
    java.nio.file.Files.write(dir.resolve("a.jpg"),
      "jpeg-bytes".getBytes("UTF-8"))
    java.nio.file.Files.write(dir.resolve("b.wav"),
      "wav".getBytes("UTF-8"))
    val media = Multimodal.fromBinaryFiles(
      graft.etl.Sources.binaryFiles(spark, dir.toString))
    val types = media.select("media_type").collect()
      .map(_.getString(0)).sorted.toSeq
    assert(types === Seq("jpg", "wav"))
    // ids are stable across re-reads (path-derived, not positional)
    val ids1 = media.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Multimodal.fromBinaryFiles(
      graft.etl.Sources.binaryFiles(spark, dir.toString))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 === ids2 && ids1.size === 2)
    // the decode contract runs unchanged over file-sourced payloads
    val feats = Multimodal.extractFeatures(spark, media).collect()
    assert(feats.map(_.n_bytes).sorted.toSeq === Seq(3L, 10L))
  }

  private def dims(hex: String): (String, Any, Any) = {
    import org.apache.spark.sql.functions.{col, expr, unhex}
    val r = Seq(hex).toDF("hex")
      .select(expr("media_dims(unhex(hex))").as("d"))
      .select(col("d.format"), col("d.width"), col("d.height"))
      .collect().head
    (r.getString(0), r.get(1), r.get(2))
  }

  test("media_dims: real header decode for the four containers") {
    // the same fixtures the m1 oracle pins
    assert(dims("89504E470D0A1A0A0000000D49484452" +
      "00000280000001E0080600000000000000") === ("png", 640, 480))
    assert(dims("FFD8FFE000104A46494600010100000100010000" +
      "FFC000110800F0014003012200021101031101FFD9") === ("jpeg", 320, 240))
    assert(dims("4749463839614001C800F70000") === ("gif", 320, 200))
    assert(dims("474946383837614001C800") !== ("gif", 320, 200)) // GIF88 bad
    assert(dims("4749463837610A001400") === ("gif", 10, 20)) // GIF87a
    assert(dims("424D000000000000000036000000280000006400000032000000" +
      "01001800") === ("bmp", 100, 50))
  }

  test("media_dims: malformed and truncated payloads degrade, never throw") {
    import org.apache.spark.sql.functions.expr
    // unknown magic → NULL struct
    val unknown = Seq("DEADBEEF00").toDF("hex")
      .select(expr("media_dims(unhex(hex))").as("d")).collect().head
    assert(unknown.isNullAt(0))
    // PNG magic but truncated before IHDR → format known, dims NULL
    assert(dims("89504E470D0A1A0A00") === ("png", null, null))
    // JPEG with no SOF before EOI → format known, dims NULL
    assert(dims("FFD8FFD9") === ("jpeg", null, null))
    // BMP with top-down (negative) height reports the magnitude
    assert(dims("424D0000000000000000360000002800000064000000CEFFFFFF" +
      "01001800") === ("bmp", 100, 50))
    // empty / single byte
    val tiny = Seq("").toDF("hex")
      .select(expr("media_dims(unhex(hex))").as("d")).collect().head
    assert(tiny.isNullAt(0))
  }

  private def audio(hex: String): (String, Any, Any, Any, Any) = {
    import org.apache.spark.sql.functions.{col, expr, unhex}
    val r = Seq(hex).toDF("hex")
      .select(expr("audio_meta(unhex(hex))").as("a"))
      .select(col("a.format"), col("a.channels"), col("a.sample_rate"),
        col("a.bits"), col("a.duration_ms"))
      .collect().head
    (r.getString(0), r.get(1), r.get(2), r.get(3), r.get(4))
  }

  test("audio_meta: real header decode for WAV, FLAC, MP3") {
    // the same fixtures the m6 oracle pins
    assert(audio("524946462400000057415645666D742010000000" +
      "0100020044AC000010B1020004001000" +
      "6461746188580100") === ("wav", 2, 44100, 16, 500L))
    assert(audio("664C61430000002210001000000000000000" +
      "0BB802F000075300") === ("flac", 2, 48000, 16, 10000L))
    assert(audio("FFFB9000") === ("mp3", 2, 44100, null, null))
    // MP3 mono (mode bits 3), MPEG2 halves the rate table entry
    assert(audio("FFF390C0") === ("mp3", 1, 22050, null, null))
  }

  test("audio_meta: malformed and truncated payloads degrade, never throw") {
    import org.apache.spark.sql.functions.expr
    val unknown = Seq("DEADBEEF00").toDF("hex")
      .select(expr("audio_meta(unhex(hex))").as("a")).collect().head
    assert(unknown.isNullAt(0))
    // RIFF/WAVE magic but no fmt chunk yet → format known, params NULL
    assert(audio("524946462400000057415645") ===
      ("wav", null, null, null, null))
    // fLaC magic but truncated STREAMINFO → format known, params NULL
    assert(audio("664C614300000022") === ("flac", null, null, null, null))
    // frame sync with reserved version bits → false positive, NULL
    val reserved = Seq("FFEB9000").toDF("hex")
      .select(expr("audio_meta(unhex(hex))").as("a")).collect().head
    assert(reserved.isNullAt(0))
  }
}

class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  test("batch sessionization counts gap-separated sessions") {
    val us = 1000000L
    val events = Seq(
      (1L, 0L * us, 10L, "c", 1.0),
      (2L, 100L * us, 10L, "c", 1.0),     // same session (gap 100s)
      (3L, 5000L * us, 10L, "c", 1.0),    // new session (gap 4900s > 3600)
      (4L, 0L * us, 20L, "c", 1.0)
    ).toDF("event_id", "ts_us", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros($"ts_us")).drop("ts_us")
    val r = StreamOps.sessionizeBatch(spark, events, gapSeconds = 3600)
      .collect().map(u => u.user_id -> (u.n_events, u.n_sessions)).toMap
    assert(r(10L) === ((3L, 2L)))
    assert(r(20L) === ((1L, 1L)))
  }

  test("streaming hourly counts equal batch aggregation") {
    val out = StreamOps.hourlyCounts(spark, sf,
      queryName = "t_" + System.nanoTime())
    val batch = Tables.load(spark, sf, "events")
      .groupBy(date_format(date_trunc("hour", $"ts"),
        "yyyy-MM-dd HH:mm:ss").as("hour_str"))
      .agg(count(lit(1)).as("n"))
    val a = out.select("hour_str", "n").orderBy("hour_str").collect()
    val b = batch.orderBy("hour_str").collect()
    assert(a.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      b.map(r => (r.getString(0), r.getLong(1))).toSeq)
  }

  test("streaming SCD2 enrichment equals the batch temporal join, and " +
      "live events land in the open-ended current interval") {
    val out = StreamOps.streamTemporalLookup(spark, sf,
      queryName = "stl_" + System.nanoTime())
    // batch replay: same open-ended history, same containment join
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("custkey").orderBy("o_orderdate", "o_orderkey")
    val hist = Tables.load(spark, sf, "orders")
      .select($"o_custkey".as("custkey"), $"o_orderdate", $"o_orderkey",
        $"o_orderpriority")
      .withColumn("prev", lag($"o_orderpriority", 1).over(w))
      .filter($"prev".isNull || $"prev" =!= $"o_orderpriority")
      .withColumn("from_day", datediff(to_date($"o_orderdate"),
        lit("1970-01-01")))
      .withColumn("to_incl", coalesce(
        datediff(to_date(lead($"o_orderdate", 1).over(w)),
          lit("1970-01-01")) - 1, lit(Int.MaxValue)))
    val batch = Tables.load(spark, sf, "events")
      .withColumn("event_day", datediff(to_date($"ts"), lit("1970-01-01")))
      .join(hist, $"user_id" === $"custkey" &&
        $"event_day" >= $"from_day" && $"event_day" <= $"to_incl")
      .select($"event_id", $"user_id", $"o_orderpriority".as("priority"))
    val a = out.orderBy("event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    val b = batch.orderBy("event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(a.nonEmpty) // the open end catches 2024 events
    assert(a === b)
    // every enriched event got exactly one dim row (intervals partition)
    assert(a.map(_._1).distinct.size === a.size)
  }

  test("streaming dedup drops duplicate keys within the watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamOps.Event]
    val input = mem.toDS().withColumn("ts", timestamp_micros($"ts_us"))
    val out = StreamOps.streamingDedup(input, Seq("event_id"), "ts", "1 hour")
    val qn = "dedup_" + System.nanoTime()
    val q = out.writeStream.format("memory").queryName(qn)
      .outputMode("append").start()
    mem.addData(
      StreamOps.Event(1, 1000000L, 5, "a", 1.0),
      StreamOps.Event(1, 1000000L, 5, "a", 1.0), // dup in-batch
      StreamOps.Event(2, 2000000L, 5, "a", 1.0))
    q.processAllAvailable()
    mem.addData(StreamOps.Event(1, 1000000L, 5, "a", 1.0)) // dup next batch
    q.processAllAvailable()
    q.stop()
    assert(spark.table(qn).count() === 2) // event_ids 1 and 2, once each
  }

  test("flatMapGroupsWithState emits completed sessions across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val us = 1000000L
    val mem = MemoryStream[StreamOps.Event]
    val sessions = StreamOps.streamingSessions(mem.toDS(), gapSeconds = 100)
    val qn = "sess_" + System.nanoTime()
    val q = sessions.writeStream.format("memory").queryName(qn)
      .outputMode("append").start()
    // batch 1: two events 10s apart (one open session)
    mem.addData(StreamOps.Event(1, 0L, 7, "a", 1.0),
      StreamOps.Event(2, 10L * us, 7, "a", 1.0))
    q.processAllAvailable()
    // batch 2: event 500s later -> closes session 1, opens session 2
    mem.addData(StreamOps.Event(3, 510L * us, 7, "a", 1.0))
    q.processAllAvailable()
    q.stop()
    val done = spark.table(qn).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(done.toSeq === Seq((7L, 0L, 10L * us, 2L)))
  }

  test("mapGroupsWithState accumulates across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamOps.Event]
    val counts = StreamOps.runningUserCounts(spark, mem.toDS())
    val qn = "state_" + System.nanoTime()
    val q = counts.writeStream.format("memory").queryName(qn)
      .outputMode("update").start()
    mem.addData(StreamOps.Event(1, 0, 5, "a", 1.0),
      StreamOps.Event(2, 1, 5, "a", 1.0))
    q.processAllAvailable()
    mem.addData(StreamOps.Event(3, 2, 5, "a", 1.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table(qn).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.contains((5L, 2L))) // after batch 1
    assert(rows.contains((5L, 3L))) // state carried into batch 2
  }
}
