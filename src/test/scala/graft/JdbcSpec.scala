package graft

import java.nio.file.Files
import graft.etl.{Sinks, Sources}

/** Real JDBC sink + source roundtrip against embedded Derby (ships with
  * Spark) — the actual database path of the reference's batch-insert sink
  * and table scans (SURVEY §2.1 S1/S7), not just the parquet stand-in.
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val dbPath = Files.createTempDirectory("graft_derby").toString + "/db"
  private val url = s"jdbc:derby:$dbPath;create=true"
  private val opts = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")

  test("batched JDBC append then projected/filtered JDBC scan") {
    val src = Seq((1, "alpha", 10.5), (2, "beta", 20.25), (3, "gamma", 30.0))
      .toDF("id", "name", "amount")
    val written = Sinks.jdbc(src, url, "t_items", opts)
    assert(written === 3L)

    // full scan back
    val back = Sources.jdbc(spark, url, "t_items", opts)
    assert(back.count() === 3L)
    assert(back.columns.map(_.toLowerCase).sorted.toSeq ===
      Seq("amount", "id", "name"))

    // predicate pushdown to the database (WHERE reaches Derby)
    val filtered = Sources.jdbc(spark, url, "t_items", opts)
      .filter($"id" > 1).select("name")
    assert(filtered.collect().map(_.getString(0)).sorted.toSeq ===
      Seq("beta", "gamma"))
    val plan = filtered.queryExecution.executedPlan.toString
    // '*' prefix marks filters handled by the database itself
    assert(plan.contains("PushedFilters: [*IsNotNull(id), *GreaterThan(id,1)]"),
      s"JDBC pushdown missing:\n$plan")

    // append mode adds rows (the reference's batch-insert semantics)
    Sinks.jdbc(src.filter($"id" === 1), url, "t_items", opts)
    assert(Sources.jdbc(spark, url, "t_items", opts).count() === 4L)
  }
}
