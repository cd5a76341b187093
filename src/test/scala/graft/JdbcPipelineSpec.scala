package graft

import java.nio.file.Files
import graft.etl._

/** Full config-driven pipeline with a JDBC SOURCE (embedded Derby): the
  * reference's actual shape — config declares connections, the flow reads a
  * database table, maps/dedups, and lands in the destination (reference:
  * sdk/etl.php:79-143 with connections at :128-132).
  */
class JdbcPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("per-flow inline connections override the global block") {
    val spec = PipelineSpec.parse(
      """{"connections": {"from": {"url": "jdbc:global"}},
        | "tables": [
        |  {"flow": "a -> b",
        |   "connections": {"from": {"url": "jdbc:flow-local",
        |                            "options": {"driver": "d"}}}},
        |  {"flow": "c -> d"}]}""".stripMargin)
    assert(spec.sourceConnection(spec.flows(0)).get.url === "jdbc:flow-local")
    assert(spec.sourceConnection(spec.flows(0)).get.options ===
      Map("driver" -> "d"))
    assert(spec.sourceConnection(spec.flows(1)).get.url === "jdbc:global")
    assert(spec.flows(0).inlineTo.isEmpty)
  }

  test("config with connections block drives a JDBC-source flow") {
    val dbPath = Files.createTempDirectory("graft_derby2").toString + "/db"
    val url = s"jdbc:derby:$dbPath;create=true"
    val opts = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")

    // seed the "operational database"
    val seed = Seq((1, "Acme", "ACTIVE"), (2, "Beta", "ACTIVE"),
      (3, "Acme", "INACTIVE")).toDF("id", "company", "status")
    // Spark's default StringType mapping is CLOB in Derby, which can't be
    // compared in pushed-down predicates — declare VARCHARs explicitly.
    Sinks.jdbc(seed, url, "src_companies", opts +
      ("createTableColumnTypes" ->
        "company VARCHAR(64), status VARCHAR(16)"))

    val spec = PipelineSpec.parse(
      s"""{"connections": {
         |   "from": {"url": "$url",
         |            "options": {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}}},
         | "tables": [
         |  {"flow": "src_companies -> dim_companies",
         |   "columns": {"company_id": "[id]", "name": "[company]",
         |               "source_system": "erp"},
         |   "unique": ["name"],
         |   "query": "status = 'ACTIVE'"}]}""".stripMargin)

    val conn = spec.sourceConnection(spec.flows.head).get
    assert(conn.url === url)

    val source = Sources.jdbc(spark, conn.url, spec.flows.head.from,
      conn.options)
    // Derby uppercases unquoted identifiers; normalize for the mapping
    val normalized = source.toDF(source.columns.map(_.toLowerCase): _*)
    val out = ETLPipeline.transform(normalized, spec.flows.head,
      destination = None, orderCol = Some("company_id"))
      .orderBy("company_id").collect()

    // status filter drops id=3; dedup on name is a no-op for the survivors
    assert(out.map(_.getInt(0)).toSeq === Seq(1, 2))
    assert(out.map(_.getString(1)).toSeq === Seq("Acme", "Beta"))
    assert(out.forall(_.getString(2) == "erp"))
  }

  test("JDBC DESTINATION: flow lands in the 'to' database; re-run inserts " +
    "nothing (anti-join against the live table)") {
    val dbPath = Files.createTempDirectory("graft_derby3").toString + "/db"
    val url = s"jdbc:derby:$dbPath;create=true"
    val opts = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    Sinks.jdbc(
      Seq((1, "Acme"), (2, "Beta"), (3, "Acme")).toDF("id", "company"),
      url, "src_companies", opts)

    val spec = PipelineSpec.parse(
      s"""{"connections": {
         |   "from": {"url": "$url",
         |            "options": {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}},
         |   "to":   {"url": "$url",
         |            "options": {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}}},
         | "tables": [
         |  {"flow": "src_companies -> dim_companies2",
         |   "columns": {"company_id": "[id]", "name": "[company]"},
         |   "unique": ["company_id"]}]}""".stripMargin)
    val flow = spec.flows.head
    assert(spec.destinationConnection(flow).get.url === url)

    // first run: destination table doesn't exist → probe yields None,
    // write creates it (the reference's first add_many)
    val (dest1, n1) = Main.runFlow(spark, spec, flow,
      sourceDir = "/nonexistent", destDir = "/nonexistent",
      runTs = etl.ColumnMapping.runTimestamp())
    assert(dest1 === "dim_companies2" && n1 === 3L)

    // second run: every company_id exists in the live destination → the
    // anti-join keeps nothing, zero rows appended (idempotent replay)
    val (_, n2) = Main.runFlow(spark, spec, flow,
      sourceDir = "/nonexistent", destDir = "/nonexistent",
      runTs = etl.ColumnMapping.runTimestamp())
    assert(n2 === 0L)
    assert(Sources.jdbc(spark, url, "dim_companies2", opts).count() === 3L)
  }
}
