package graft

/** Battery-wide plan lint: EVERY declared query is planned (sf0.001) and
  * its physical plan must contain no CartesianProduct — the unbounded
  * all-pairs operator that turns a 100 TB join into N² work. Broadcast
  * nested-loop joins against one-row/constant frames (IVF centroid
  * assignment, brute-force rerank scans, count broadcasts) are legal and
  * distinct, so they are not flagged. This is the regression net under
  * the per-query asserts in PlanSpec: a future gate that accidentally
  * drops a join condition (the self-join lineage trap) fails HERE even
  * if nobody wrote it a dedicated test.
  */
class PlanLintSpec extends SparkSpec {

  test("no query in the battery plans a CartesianProduct") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val plan = fn(spark, sf).queryExecution.executedPlan.toString
          if (plan.contains("CartesianProduct")) Some(name) else None
        } catch {
          case e: Throwable => Some(s"$name (failed to plan: ${e.getMessage})")
        }
    }
    assert(offenders.isEmpty,
      s"queries with cartesian plans or planning failures: $offenders")
  }
}
