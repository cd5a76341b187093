package graft

import org.apache.spark.sql.functions._
import graft.ops.HeavyHitters

/** Misra–Gries summary semantics: presence guarantee under eviction,
  * count bounds, merge/partitioning invariance of the final exact result,
  * SQL registration.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // 'hot' appears 400×, 'warm' 150×, plus 450 singleton items: forces
  // constant eviction at k=8 (459 distinct >> 8 counters).
  private def skewed(parts: Int) = {
    val rows = Seq.fill(400)("hot") ++ Seq.fill(150)("warm") ++
      (0 until 450).map(i => s"cold_$i")
    rows.toDF("item").repartition(parts)
  }
  private val total = 1000.0

  test("items above N/(k+1) survive the summary whatever the order") {
    // k=8: error <= 1000/9 = 111; hot(400) and warm(150) must be present.
    for (parts <- Seq(1, 4, 13)) {
      val cand = HeavyHitters.candidates(skewed(parts), "item", k = 8)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(cand.size <= 8)
      assert(cand.contains("hot"), s"hot evicted at parts=$parts")
      assert(cand.contains("warm"), s"warm evicted at parts=$parts")
      // Stored counters never exceed true counts and carry bounded error:
      assert(cand("hot") <= 400 && cand("hot") >= 400 - total / 9)
      assert(cand("warm") <= 150 && cand("warm") >= 150 - total / 9)
    }
  }

  test("exact recount equals plain groupBy threshold, any partitioning") {
    val expected = Seq(("hot", 400L, 1000L), ("warm", 150L, 1000L))
    for (parts <- Seq(1, 4, 13)) {
      val out = HeavyHitters.heavyHitters(skewed(parts), "item",
          k = 8, minShare = 0.125) // 12.5% > 1/9
        .orderBy("item").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(out.toSeq === expected, s"at parts=$parts")
    }
  }

  test("minShare at or below 1/(k+1) is rejected") {
    intercept[IllegalArgumentException] {
      HeavyHitters.heavyHitters(skewed(4), "item", k = 8, minShare = 0.1)
    }
  }

  test("nulls are skipped, not counted") {
    val df = Seq(Some("a"), Some("a"), None, Some("b")).toDF("item")
    val cand = HeavyHitters.candidates(
        df.filter(lit(true)), "item", k = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cand === Map("a" -> 2L, "b" -> 1L))
  }

  test("misra_gries is registered as a SQL aggregate") {
    skewed(4).createOrReplaceTempView("mg_items")
    val out = spark.sql(
      "SELECT explode(misra_gries(item, 8)) AS s FROM mg_items")
      .select("s.item", "s.mg_count")
      .collect().map(_.getString(0))
    assert(out.contains("hot"))
  }
}
