package graft

import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis

/** The two BPE training engines must be bit-identical: the driver-side
  * exact trainer (default — one distributed word-count job, in-memory
  * incremental merge loop) and the batched distributed round loop
  * (`spark.graft.bpeTrainPath=distributed`) are both exactly
  * sequential BPE, so the learned tables — ranks, symbols, merged
  * forms, AND counts — must agree on any corpus. Pinned here on the
  * documents table and on a crafted overlap corpus (the "aaa" class
  * where leftmost-non-overlapping counting is the part implementations
  * get wrong).
  */
class BpeTrainPathSpec extends SparkSpec {
  import spark.implicits._

  private def withPath[A](p: String)(body: => A): A = {
    val key = TextAnalysis.BpeTrainPathConf
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, p)
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def table(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("merge_rank")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
      .toSeq

  test("driver path == distributed path on the documents corpus") {
    val docs = Tables.load(spark, sf, "documents")
    val driver = withPath("driver")(
      table(TextAnalysis.bpeTrain(docs, "text", nMerges = 24)))
    val dist = withPath("distributed")(
      table(TextAnalysis.bpeTrain(docs, "text", nMerges = 24, batch = 8)))
    assert(driver.nonEmpty)
    assert(driver === dist)
  }

  test("overlap counting and leftmost merging agree on the adversarial " +
    "corpus (runs, ties, multi-occurrence words)") {
    val docs = Seq(
      "aaaa aaaa aab",        // ("a","a") counted 3x per "aaaa" (overlap)
      "abab abab cd cd cd",   // repeated non-overlapping pair + tie fodder
      "xyxyx zzz zzz")
      .toDF("text").withColumn("doc_id", monotonically_increasing_id())
    val driver = withPath("driver")(
      table(TextAnalysis.bpeTrain(docs, "text", nMerges = 12)))
    val dist = withPath("distributed")(
      table(TextAnalysis.bpeTrain(docs, "text", nMerges = 12, batch = 4)))
    assert(driver === dist)
    // the first merge must be the overlap-counted run winner: ("a","a")
    // appears 2·3 + 1 = 7 times ≥ any other pair
    assert(driver.head._2 === "a" && driver.head._3 === "a")
  }

  test("supplementary characters: code-point splitting keeps emoji " +
    "whole on both paths (Java split(\"\") would shear them into " +
    "lone surrogates)") {
    val docs = Seq(
      "😀a 😀a 😀b x😁y",
      "a😀 a😀 zz")
      .toDF("text")
    val driver = withPath("driver")(
      table(TextAnalysis.bpeTrain(docs, "text", nMerges = 6)))
    val dist = withPath("distributed")(
      table(TextAnalysis.bpeTrain(docs, "text", nMerges = 6, batch = 2)))
    assert(driver === dist)
    // the top pair involves the whole emoji as ONE symbol
    assert(driver.exists(m => m._2 == "😀" || m._3 == "😀"))
    // and no learned symbol holds a lone surrogate half (those are
    // destroyed by a UTF-8 round trip, which whole code points survive)
    assert(driver.forall(m => Seq(m._2, m._3, m._4).forall(sym =>
      new String(sym.getBytes("UTF-8"), "UTF-8") == sym)))
  }

  test("exhaustion: a tiny corpus stops early with identical prefixes " +
    "on both paths") {
    val docs = Seq("ab ab ba").toDF("text")
    val driver = withPath("driver")(
      table(TextAnalysis.bpeTrain(docs, "text", nMerges = 50)))
    val dist = withPath("distributed")(
      table(TextAnalysis.bpeTrain(docs, "text", nMerges = 50, batch = 16)))
    assert(driver === dist)
    assert(driver.size < 50)
  }
}
