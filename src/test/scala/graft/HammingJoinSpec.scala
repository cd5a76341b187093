package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.SimHash

/** The tier-(c) optimizer rule: a join written with the declarative
  * `hamming_le` predicate must re-plan from a nested loop to a chunked
  * equality join, with results identical (set AND multiplicity) to the
  * naive plan.
  */
class HammingJoinSpec extends SparkSpec {
  import spark.implicits._

  private val RuleConf = "spark.graft.hammingJoinRewrite"

  /** Codes chosen so some pairs agree on several chunks (dedup must keep
    * them once), some on exactly one, some on none despite being close.
    */
  private def codes: DataFrame = Seq(
    1L -> 0x0000000000000000L,
    2L -> 0x0000000000000007L, // d(1,2)=3
    3L -> 0x0000000000000008L, // d(1,3)=1, d(2,3)=4
    4L -> 0xF0F0F0F0F0F0F0F0L,
    5L -> 0xF0F0F0F0F0F0F0F1L, // d(4,5)=1
    6L -> 0x00000000000000F7L  // d(2,6)=5 — close but over the bound
  ).toDF("id", "code")

  private def simJoin(): DataFrame = {
    val a = codes.select($"id".as("id_a"), $"code".as("code_a"))
    val b = codes.select($"id".as("id_b"), $"code".as("code_b"))
    a.join(b, SimHash.hammingLE($"code_a", $"code_b", 3) && $"id_a" < $"id_b")
      .select($"id_a", $"id_b",
        bit_count($"code_a".bitwiseXOR($"code_b")).cast("long").as("hamming"))
  }

  private def withRule[A](on: Boolean)(body: => A): A = {
    val prev = spark.conf.getOption(RuleConf)
    spark.conf.set(RuleConf, on.toString)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(RuleConf, v)
      case None => spark.conf.unset(RuleConf)
    }
  }

  test("rewrite preserves results exactly (vs the nested-loop plan)") {
    val naive = withRule(on = false) {
      simJoin().collect().map(_.toSeq).toSeq.sortBy(_.toString)
    }
    val rewritten = withRule(on = true) {
      simJoin().collect().map(_.toSeq).toSeq.sortBy(_.toString)
    }
    assert(naive.nonEmpty) // the fixture has qualifying pairs
    assert(rewritten === naive)
    // multiplicity: each qualifying pair appears exactly once even when it
    // agrees on several chunks (pair (4,5) agrees on 3 of 4)
    assert(rewritten.map(r => (r(0), r(1))).distinct.size === rewritten.size)
  }

  test("rewrite replaces the nested loop with an equality join") {
    withRule(on = true) {
      val plan = simJoin().queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(!plan.contains("CartesianProduct"), plan)
    }
    withRule(on = false) {
      val plan = simJoin().queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastNestedLoopJoin") ||
        plan.contains("CartesianProduct"), plan)
    }
  }

  test("a join that already has an equi-key is left alone") {
    val a = codes.select($"id".as("id_a"), $"code".as("code_a"),
      ($"id" % 2).as("blk_a"))
    val b = codes.select($"id".as("id_b"), $"code".as("code_b"),
      ($"id" % 2).as("blk_b"))
    val j = a.join(b, $"blk_a" === $"blk_b" &&
      SimHash.hammingLE($"code_a", $"code_b", 3) && $"id_a" < $"id_b")
    val plan = withRule(on = true)(j.queryExecution.executedPlan.toString)
    // hash join on the real key, hamming as residual — no chunk explode
    assert(!plan.contains("__graft_l_chunk_idx"), plan)
  }

  test("rewritten plan matches the hand-built chunk join on real sketches") {
    val docs = Tables.load(spark, sf, "documents").limit(200)
    val sk = SimHash.sketch(docs, "doc_id", "text").cache()
    val a = sk.select($"doc_id".as("id_a"), $"simhash".as("sim_a"))
    val b = sk.select($"doc_id".as("id_b"), $"simhash".as("sim_b"))
    val declarative = withRule(on = true) {
      a.join(b, SimHash.hammingLE($"sim_a", $"sim_b", 3) && $"id_a" < $"id_b")
        .select($"id_a", $"id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val handBuilt = SimHash.nearDuplicates(docs, "doc_id", "text",
        maxDistance = 3)
      .select($"id_a", $"id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(declarative === handBuilt)
    sk.unpersist()
  }

  test("semi/anti hamming joins rewrite to equality joins on matched codes") {
    val a = codes.select($"id".as("id_a"), $"code".as("code_a"))
    // duplicate blocklist rows exercise the distinct-code path
    val block = codes.filter($"id" <= 2).select($"code".as("code_b"))
      .union(codes.filter($"id" === 1).select($"code".as("code_b")))
    def semi() = a.join(block,
      SimHash.hammingLE($"code_a", $"code_b", 3), "left_semi")
    def anti() = a.join(block,
      SimHash.hammingLE($"code_a", $"code_b", 3), "left_anti")
    val semiNaive = withRule(on = false)(
      semi().collect().map(_.getLong(0)).sorted.toSeq)
    val antiNaive = withRule(on = false)(
      anti().collect().map(_.getLong(0)).sorted.toSeq)
    withRule(on = true) {
      assert(semi().collect().map(_.getLong(0)).sorted.toSeq === semiNaive)
      assert(anti().collect().map(_.getLong(0)).sorted.toSeq === antiNaive)
      // semi ∪ anti partitions the left side
      assert((semiNaive ++ antiNaive).sorted ===
        codes.collect().map(_.getLong(0)).sorted.toSeq)
      val plan = semi().queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    }
    withRule(on = false) {
      val plan = semi().queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    }
  }

  test("semi join with extra cross-side conjuncts is left alone") {
    val a = codes.select($"id".as("id_a"), $"code".as("code_a"))
    val b = codes.select($"id".as("id_b"), $"code".as("code_b"))
    // matching is row-dependent (id_a < id_b) — the matched-code trick
    // would be wrong, so the rule must not fire
    val j = a.join(b,
      SimHash.hammingLE($"code_a", $"code_b", 3) && $"id_a" < $"id_b",
      "left_semi")
    val naive = withRule(on = false)(
      j.collect().map(_.getLong(0)).sorted.toSeq)
    withRule(on = true) {
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("__graft_code"), plan)
      assert(j.collect().map(_.getLong(0)).sorted.toSeq === naive)
    }
  }

  test("SQL surface: hamming_le in a SQL join condition rewrites too") {
    codes.createOrReplaceTempView("hj_codes")
    val sql = """SELECT a.id AS id_a, b.id AS id_b
                |FROM hj_codes a JOIN hj_codes b
                |  ON hamming_le(a.code, b.code, 3) AND a.id < b.id""".stripMargin
    val df = withRule(on = true)(spark.sql(sql))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    val naive = withRule(on = false)(spark.sql(sql).collect().map(_.toSeq).toSet)
    assert(df.collect().map(_.toSeq).toSet === naive)
    spark.catalog.dropTempView("hj_codes")
  }
}
