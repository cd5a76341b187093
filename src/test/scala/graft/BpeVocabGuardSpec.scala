package graft

import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis

/** The driver-side BPE trainer's vocabulary guards (r12 ADVICE item 1 /
  * verdict item 4): the default path collects the (word, count) table to
  * the driver, so it must (a) fall back to the distributed trainer
  * automatically when the vocabulary exceeds
  * `spark.graft.bpeDriverMaxVocab` instead of OOMing, and (b) support a
  * `spark.graft.bpeMinWordCount` frequency floor applied distributed,
  * before anything lands on the driver — with default 1 keeping training
  * exact (the t20/t21 oracles unchanged).
  */
class BpeVocabGuardSpec extends SparkSpec {
  import spark.implicits._

  private def withConf[A](kvs: (String, String)*)(body: => A): A = {
    val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def table(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("merge_rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq

  private val corpus = Seq(
    "aaaa aaaa aab abab",
    "abab cd cd cd xyxyx",
    "zzz zzz rare1 rare2 rare3")

  test("oversized vocabulary falls back to the distributed trainer " +
    "with an identical merge table (never an OOM path)") {
    val docs = corpus.toDF("text")
      .withColumn("doc_id", monotonically_increasing_id())
    val unguarded = table(TextAnalysis.bpeTrain(docs, "text", nMerges = 8))
    // cap of 1 row: every real vocabulary exceeds it → fallback fires
    val guarded = withConf(TextAnalysis.BpeDriverMaxVocabConf -> "1") {
      val (df, rounds) =
        TextAnalysis.bpeTrainWithRounds(docs, "text", nMerges = 8,
          batch = 4)
      // the distributed loop runs MULTIPLE pair-count rounds; the driver
      // path reports exactly 1 — rounds > 1 proves the fallback engaged
      assert(rounds > 1, s"expected the distributed loop, got $rounds round(s)")
      table(df)
    }
    assert(guarded === unguarded)
  }

  test("within-cap vocabularies keep the driver path (rounds == 1)") {
    val docs = corpus.toDF("text")
      .withColumn("doc_id", monotonically_increasing_id())
    val (_, rounds) =
      TextAnalysis.bpeTrainWithRounds(docs, "text", nMerges = 8)
    assert(rounds === 1)
  }

  test("minWordCount floor prunes tail types distributed-side: merges " +
    "equal training on the explicitly-filtered heavy vocabulary") {
    val docs = (Seq.fill(5)("alpha beta alpha beta") ++
      Seq("hapax1 hapax2 hapax3 gamma"))
      .toDF("text").withColumn("doc_id", monotonically_increasing_id())
    val floored = withConf(TextAnalysis.BpeMinWordCountConf -> "2") {
      table(TextAnalysis.bpeTrain(docs, "text", nMerges = 6))
    }
    // reference semantics: drop word TYPES seen < 2 times, then train
    // exact — rebuild a corpus holding each surviving type exactly n
    // times, so its (word, count) table equals the floored one
    val rebuilt = docs.select(explode(TextAnalysis.tokens(col("text")))
        .as("w"))
      .groupBy("w").agg(count(lit(1)).as("n")).filter(col("n") >= 2)
      .as[(String, Long)].collect().toSeq
      .flatMap { case (w, n) => Seq.fill(n.toInt)(w) }
      .mkString(" ")
    val docs2 = Seq(rebuilt).toDF("text")
      .withColumn("doc_id", lit(0L))
    val expected = table(TextAnalysis.bpeTrain(docs2, "text", nMerges = 6))
    assert(floored === expected)
    assert(floored.nonEmpty)
    // hapax-derived pairs must not appear in the floored table
    assert(!floored.exists(m => m._4.contains("hapax")))
  }

  test("default confs change nothing: guard off-path is bit-identical " +
    "to the pre-guard trainer output on the documents corpus") {
    val docs = Tables.load(spark, sf, "documents")
    val a = table(TextAnalysis.bpeTrain(docs, "text", nMerges = 16))
    val b = withConf(
      TextAnalysis.BpeDriverMaxVocabConf -> "20000000",
      TextAnalysis.BpeMinWordCountConf -> "1") {
      table(TextAnalysis.bpeTrain(docs, "text", nMerges = 16))
    }
    assert(a === b)
    assert(a.size === 16)
  }
}
