package graft

class GraftFunctionsSpec extends SparkSpec {

  test("registered SQL functions match the Column-API semantics") {
    GraftFunctions.registerAll(spark)
    import spark.implicits._
    Seq(("hello world", " "), ("noseparator", " "), (" lead", " "))
      .toDF("s", "sep").createOrReplaceTempView("strs")
    val rows = spark.sql(
      """SELECT str_before(s, ' ') AS b, str_after(s, ' ') AS a,
        |       rolling_hash(s) AS h FROM strs""".stripMargin).collect()
    assert(rows(0).getString(0) === "hello")
    assert(rows(0).getString(1) === "world")
    assert(rows(1).getString(0) === "")
    assert(rows(1).getString(1) === "")
    assert(rows(2).getString(0) === "") // position-0 edge
    assert(rows(2).getString(1) === "lead")
    assert(rows(0).getLong(2) ===
      graft.functions.RollingHash.hash("hello world"))
  }

  test("extensions class wires the same builders at session build time") {
    // Full builder-path coverage needs a fresh JVM-level session; here we
    // assert the extension applies cleanly to an injection point.
    val e = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(e) // must not throw
  }
}
