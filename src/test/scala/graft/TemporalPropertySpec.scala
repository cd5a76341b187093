package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.ops.{AsOfJoin, TextAnalysis}

/** Property checks for the temporal/packing operators: the composed as-of
  * join equals the naive per-row maximum-prior lookup, and token chunking
  * covers every token with the declared overlap.
  */
class TemporalPropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(prop: Prop, n: Int = 5): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  test("as-of join == naive max-prior lookup on random data") {
    val gen = for {
      left <- Gen.listOfN(20, Gen.zip(Gen.chooseNum(0, 3), Gen.chooseNum(0, 50)))
      right <- Gen.listOfN(8, Gen.zip(Gen.chooseNum(0, 3), Gen.chooseNum(0, 50)))
    } yield (left, right.distinct)
    check(Prop.forAll(gen) { case (leftRows, rightRows) =>
      val left = leftRows.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, new java.sql.Timestamp(t * 1000L)) }
      val right = rightRows
        .map { case (k, t) => (k, new java.sql.Timestamp(t * 1000L), s"v$k-$t") }
      val lDf = left.toDF("lid", "k", "lt")
      val rDf = right.toDF("k", "rt", "v")
      val out = AsOfJoin(lDf, rDf, "k", "lt", "rt", Seq("v"))
        .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
      left.forall { case (lid, k, lt) =>
        // naive: the right row with max rt <= lt for the same key
        // (inclusive at equality, like the DuckDB ASOF the oracle uses)
        val naive = right.filter(r => r._1 == k && !r._2.after(lt))
          .sortBy(_._2.getTime).lastOption.map(_._3)
        out(lid) == naive
      }
    })
  }

  test("token chunks cover every token with the declared overlap") {
    val gen = Gen.zip(Gen.chooseNum(0, 40), Gen.chooseNum(5, 9),
      Gen.chooseNum(0, 3))
    check(Prop.forAll(gen) { case (n, size, overlap) =>
      val text = (0 until n).map(i => s"t$i").mkString(" ")
      val row = Seq(text).toDF("text")
        .select(TextAnalysis.tokenChunks(
          TextAnalysis.tokens(col("text")), size, overlap).as("cs"))
        .collect()(0)
      val chunks = row.getAs[scala.collection.Seq[
        org.apache.spark.sql.Row]]("cs").map(c =>
        (c.getAs[Long]("start"), c.getAs[Long]("n_tokens"),
          c.getAs[String]("chunk")))
      val step = size - overlap
      val covered = chunks.flatMap { case (s, nt, _) => s until (s + nt) }.toSet
      chunks.nonEmpty &&
        // always at least one chunk; every token position covered
        (n == 0 || covered == (1L to n.toLong).toSet) &&
        // starts advance by exactly the step
        chunks.map(_._1) == chunks.indices.map(i => 1L + i * step) &&
        // chunk text is the tokens it claims
        chunks.forall { case (s, nt, text2) =>
          text2 == ((s - 1) until (s - 1 + nt)).map(i => s"t$i").mkString(" ")
        }
    }, n = 8)
  }
}
