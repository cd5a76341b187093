package graft

import org.apache.spark.sql.functions._

import graft.functions.CountMin

/** Count-Min sketch aggregate: CM invariants (never underestimates,
  * order-independent counters) and the driver-side point-query helper.
  */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val Width = 64
  private val Depth = 4

  private def sketchOf(items: Seq[String], parts: Int = 1): Seq[Long] =
    items.toDF("item").repartition(parts)
      .agg(expr(s"count_min(item, $Width, $Depth)").as("sk"))
      .collect()(0).getSeq[Long](0)

  private def estimate(sk: Seq[Long], item: String): Long =
    (0 until Depth).map(j =>
      sk(j * Width + CountMin.bucket(item, j, Width))).min

  test("point estimates never underestimate; totals per row are exact") {
    val data = Seq.fill(50)("alpha") ++ Seq.fill(20)("beta") ++
      (1 to 30).map(i => s"tail_$i")
    val sk = sketchOf(data)
    assert(sk.length === Width * Depth)
    // every depth row holds exactly N counts in total
    (0 until Depth).foreach { j =>
      assert(sk.slice(j * Width, (j + 1) * Width).sum === data.length.toLong)
    }
    assert(estimate(sk, "alpha") >= 50L)
    assert(estimate(sk, "beta") >= 20L)
    assert(estimate(sk, "tail_7") >= 1L)
  }

  test("counters are bit-identical under repartitioning (order-free sums)") {
    val data = (1 to 500).map(i => s"item_${i % 37}")
    assert(sketchOf(data, parts = 1) === sketchOf(data, parts = 13))
  }

  test("nulls are skipped; absent items estimate only collision mass") {
    val sk = Seq(Some("x"), None, Some("x"), None).toDF("item")
      .agg(expr(s"count_min(item, $Width, $Depth)").as("sk"))
      .collect()(0).getSeq[Long](0)
    (0 until Depth).foreach { j =>
      assert(sk.slice(j * Width, (j + 1) * Width).sum === 2L,
        "null inputs must not count")
    }
    assert(estimate(sk, "x") === 2L)
  }

  test("estimate error is bounded by the CM guarantee on skewed data") {
    // N = 1000 over width 64: excess <= 2N/width = 31 w.h.p. per item
    val data = Seq.fill(600)("hot") ++ (1 to 400).map(i => s"cold_$i")
    val sk = sketchOf(data, parts = 8)
    val est = estimate(sk, "hot")
    assert(est >= 600L && est <= 600L + 2L * data.length / Width,
      s"estimate $est outside the CM envelope")
  }
}
