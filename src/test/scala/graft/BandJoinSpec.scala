package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BandJoinRewrite: `abs(a - b) <= d` joins re-planned from nested loop to
  * bucket equality joins — exactness (set AND multiplicity) pinned against
  * the rule-off nested loop, including negatives straddling the wide zero
  * bucket of truncate-toward-zero division.
  */
class BandJoinSpec extends SparkSpec {
  import spark.implicits._

  private val ConfKey = "spark.graft.bandJoinRewrite"

  private def withRule[T](on: Boolean)(body: => T): T = {
    val prev = spark.conf.getOption(ConfKey)
    spark.conf.set(ConfKey, on.toString)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ConfKey, v)
      case None => spark.conf.unset(ConfKey)
    }
  }

  // values chosen to straddle zero and to collide within/across buckets;
  // duplicates included so multiplicity differences surface
  private def sideA: DataFrame =
    Seq(-9L, -5L, -4L, -3L, -1L, 0L, 1L, 3L, 3L, 7L, 12L, 100L)
      .toDF("va").withColumn("ida", monotonically_increasing_id())

  private def sideB: DataFrame =
    Seq(-8L, -6L, -2L, 0L, 0L, 2L, 5L, 9L, 11L, 98L, 104L)
      .toDF("vb").withColumn("idb", monotonically_increasing_id())

  private def bandJoin(d: Int): DataFrame =
    sideA.join(sideB, abs(col("va") - col("vb")) <= d)
      .select("ida", "idb")

  test("rewrite result == nested-loop result, set and multiplicity") {
    for (d <- Seq(0, 1, 3, 5)) {
      val on = withRule(on = true) { bandJoin(d).collect() }
      val off = withRule(on = false) { bandJoin(d).collect() }
      val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getLong(1))
      val onM = on.groupBy(key).view.mapValues(_.length).toMap
      val offM = off.groupBy(key).view.mapValues(_.length).toMap
      assert(onM === offM, s"d=$d: rewrite changed the result")
    }
  }

  test("rule on: equality join, no nested loop; rule off: nested loop") {
    val planOn = withRule(on = true) {
      bandJoin(3).queryExecution.executedPlan.toString
    }
    assert(!planOn.contains("BroadcastNestedLoopJoin") &&
      !planOn.contains("CartesianProduct"),
      s"rewrite did not fire:\n$planOn")
    assert(planOn.contains("BroadcastHashJoin") ||
      planOn.contains("SortMergeJoin") || planOn.contains("ShuffledHashJoin"),
      s"expected an equality join:\n$planOn")
    val planOff = withRule(on = false) {
      bandJoin(3).queryExecution.executedPlan.toString
    }
    assert(planOff.contains("BroadcastNestedLoopJoin") ||
      planOff.contains("CartesianProduct"),
      s"kill switch ignored:\n$planOff")
  }

  test("guard: a join that already has an equi-key is left alone") {
    val a = Seq((1L, 10L), (2L, 20L)).toDF("k_a", "x")
    val b = Seq((1L, 12L), (2L, 300L)).toDF("k_b", "y")
    val df = withRule(on = true) {
      a.join(b, col("k_a") === col("k_b") && abs(col("x") - col("y")) <= 5)
    }
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("__graft_band"),
      s"rule fired despite an existing equi-key:\n$plan")
    assert(df.count() === 1)
  }

  test("strict < and reversed >= forms rewrite too") {
    val strict = withRule(on = true) {
      sideA.join(sideB, abs(col("va") - col("vb")) < 3).select("ida", "idb")
    }
    val planS = strict.queryExecution.executedPlan.toString
    assert(!planS.contains("BroadcastNestedLoopJoin"),
      s"< form did not rewrite:\n$planS")
    val expected = withRule(on = false) {
      sideA.join(sideB, abs(col("va") - col("vb")) <= 2)
        .select("ida", "idb").count()
    }
    assert(strict.count() === expected)
    val rev = withRule(on = true) {
      sideA.join(sideB, lit(3) >= abs(col("vb") - col("va")))
        .select("ida", "idb")
    }
    assert(!rev.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"), ">= form did not rewrite")
    assert(rev.count() ===
      withRule(on = false) { bandJoin(3).count() })
  }

  test("integer-typed (non-long) columns rewrite through the cast") {
    val a = Seq(1, 5, 9).toDF("xa")
    val b = Seq(2, 8, 40).toDF("xb")
    val df = withRule(on = true) {
      a.join(b, abs(col("xa") - col("xb")) <= 1)
    }
    assert(!df.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"), "int columns did not rewrite")
    assert(df.collect().map(r => (r.getInt(0), r.getInt(1))).toSet ===
      Set((1, 2), (9, 8)))
  }

  test("semi/anti band joins rewrite via the distinct-value set") {
    for (jt <- Seq("left_semi", "left_anti")) {
      val df = withRule(on = true) {
        sideA.join(sideB, abs(col("va") - col("vb")) <= 3, jt)
      }
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"$jt band join stayed a nested loop:\n$plan")
      val expected = withRule(on = false) {
        sideA.join(sideB, abs(col("va") - col("vb")) <= 3, jt)
          .collect().map(_.getLong(0)).sorted.toSeq
      }
      val got = df.collect().map(_.getLong(0)).sorted.toSeq
      assert(got === expected, s"$jt band join changed the result")
    }
  }

  test("semi band join preserves duplicate left rows (multiplicity)") {
    // sideA has the value 3 twice: both copies must survive a semi join
    val df = withRule(on = true) {
      sideA.join(sideB, abs(col("va") - col("vb")) <= 1, "left_semi")
    }
    val vals = df.collect().map(_.getLong(0))
    assert(vals.count(_ == 3L) === 2,
      s"duplicate left rows collapsed: ${vals.toSeq}")
  }

  test("semi/anti with an extra conjunct stands down (row-dependent match)") {
    val df = withRule(on = true) {
      sideA.join(sideB,
        abs(col("va") - col("vb")) <= 3 && col("ida") =!= col("idb"),
        "left_semi")
    }
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("__graft_band"),
      s"rule fired despite a row-dependent conjunct:\n$plan")
  }

  test("SQL surface: abs() in a join condition rewrites too") {
    sideA.createOrReplaceTempView("band_a")
    sideB.createOrReplaceTempView("band_b")
    val df = withRule(on = true) {
      spark.sql("SELECT ida, idb FROM band_a JOIN band_b " +
        "ON abs(va - vb) <= 3")
    }
    assert(!df.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"), "SQL form did not rewrite")
    val expected = withRule(on = false) { bandJoin(3).count() }
    assert(df.count() === expected)
  }

  test("double-typed band predicates are NOT rewritten (exactness guard)") {
    val a = Seq(1.0, 2.5).toDF("da")
    val b = Seq(1.4, 9.9).toDF("db")
    val df = withRule(on = true) {
      a.join(b, abs(col("da") - col("db")) <= 0.5)
    }
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("__graft_band"),
      s"rule must not fire on fractional types:\n$plan")
    assert(df.count() === 1)
  }
}
