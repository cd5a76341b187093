package graft

import org.apache.spark.sql.functions._
import graft.sources.MemSink

/** The distributed-write COMMIT PROTOCOL, pinned: task rows become
  * visible only through per-task commit messages unioned atomically at
  * the driver, so a failed/retried task attempt can never double- or
  * half-write. This is the property every 100 TB sink (file commit
  * protocols, JDBC staging, Delta transactions) is built on.
  */
class WriteCommitSpec extends SparkSpec {
  import spark.implicits._

  private def expected(n: Long): Set[(Long, Long)] =
    (0L until n).map(i => (i, i * 7)).toSet

  private def sourceDf(n: Long) =
    spark.range(0, n, 1, 4).select(col("id"), (col("id") * 7).as("val"))

  test("clean write publishes every partition's rows exactly once") {
    sourceDf(100).write.format("graft.sources.MemSinkProvider")
      .option("table", "clean").mode("append").save()
    val got = MemSink.tables.get("clean").toSet
    assert(got === expected(100))
  }

  test("a failed task attempt is aborted and retried exactly-once") {
    MemSink.aborted.set(0)
    MemSink.flakeArmed.set(true)
    sourceDf(100).write.format("graft.sources.MemSinkProvider")
      .option("table", "flaky").option("flaky", "true")
      .mode("append").save()
    val got = MemSink.tables.get("flaky").toSet
    assert(got === expected(100),
      "retried partition must contribute exactly its rows, once")
    assert(!MemSink.flakeArmed.get, "the injected failure must have fired")
    assert(MemSink.aborted.get >= 1,
      "the failed attempt must have been aborted")
  }
}
