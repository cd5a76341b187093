package graft

import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis

/** Non-Latin differential for the keyword operators (r12-verdict item 3):
  * textRank and rakeKeywords used to scrub tokens with `[^a-z0-9]`, which
  * reduced every non-Latin token to "" — a multilingual corpus silently
  * contributed only its Latin slice to the keyword graph. The scrub is now
  * `[^\p{L}\p{N}]` (the Java-regex/RE2 common subset, so the DuckDB oracle
  * replays it). These tests pin the fixed behavior the way BpeTrainPathSpec
  * pins the emoji/code-point fix: an all-non-Latin corpus must yield
  * keywords, and mixed-script corpora must rank non-Latin terms by the same
  * rules as Latin ones.
  */
class UnicodeKeywordsSpec extends SparkSpec {
  import spark.implicits._

  private def docsDF(texts: Seq[String]) =
    texts.toDF("text").withColumn("doc_id", monotonically_increasing_id())

  test("rakeKeywords extracts phrases from an all-Cyrillic corpus " +
    "(ASCII scrub regression: this used to return zero rows)") {
    // "и" (and) is the frequency stopword/delimiter; the content phrase
    // "машинное обучение" repeats across docs.
    val docs = docsDF(Seq(
      "машинное обучение и глубокие сети и данные",
      "машинное обучение и нейронные сети",
      "и машинное обучение и качество данных и"))
    val out = TextAnalysis.rakeKeywords(docs, "doc_id", "text",
      nStopwords = 1, maxWords = 4, topK = 10).collect()
    assert(out.nonEmpty)
    val phrases = out.map(_.getString(0)).toSeq
    assert(phrases.exists(_.contains("машинное обучение")),
      s"expected the repeated Cyrillic phrase among: $phrases")
  }

  test("rakeKeywords strips punctuation but keeps non-Latin letters " +
    "and digits") {
    val docs = docsDF(Seq(
      "καλή μέρα, καλή τύχη!",
      "καλή μέρα. ψηφίο7 ψηφίο7"))
    val out = TextAnalysis.rakeKeywords(docs, "doc_id", "text",
      nStopwords = 1, maxWords = 4, topK = 20).collect()
    val phrases = out.map(_.getString(0)).toSeq
    // "μέρα," and "μέρα." both scrub to "μέρα" — punctuation gone, Greek
    // letters intact; the mixed letter+digit token survives whole.
    assert(phrases.exists(_.contains("μέρα")), phrases.toString)
    assert(phrases.exists(_.contains("ψηφίο7")), phrases.toString)
  }

  test("textRank ranks non-Latin words (all-CJK corpus yields a graph)") {
    // space-separated CJK tokens (tokens() is whitespace tokenization);
    // "的" rides the stoplist as the most frequent token.
    val docs = docsDF(Seq(
      "机器 学习 的 模型 的 数据",
      "机器 学习 的 数据 质量",
      "的 机器 学习 的 模型 评估"))
    val out = TextAnalysis.textRank(docs, "doc_id", "text",
      nStopwords = 1, window = 2, iterations = 3, topK = 10).collect()
    assert(out.nonEmpty)
    val words = out.map(_.getString(0)).toSeq
    assert(words.contains("机器") && words.contains("学习"),
      s"expected CJK co-occurrence nodes among: $words")
  }

  test("mixed-script corpus: Latin and Cyrillic terms compete in one " +
    "graph under identical scrub rules") {
    val docs = docsDF(Seq(
      "data quality и данные качество",
      "data quality и данные качество",
      "и data и данные и"))
    val out = TextAnalysis.textRank(docs, "doc_id", "text",
      nStopwords = 1, window = 2, iterations = 2, topK = 10).collect()
    val words = out.map(_.getString(0)).toSeq
    assert(words.exists(w => w.exists(c => Character.UnicodeBlock.of(c) ==
      Character.UnicodeBlock.CYRILLIC)), s"no Cyrillic node in: $words")
    assert(words.contains("quality"), s"no Latin node in: $words")
  }
}
