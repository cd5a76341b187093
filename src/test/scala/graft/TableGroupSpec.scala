package graft

import org.apache.spark.sql.functions._

import graft.etl.{TableGroup, VersionedTable}

/** Crash-matrix pins for the multi-table atomic commit (r13-verdict
  * item 2): a group commit either lands on EVERY member or on none, as
  * observed through the root — whatever point the writer dies at.
  */
class TableGroupSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_tg").toString

  private def persons(n: Int) = spark.range(n.toLong)
    .select(col("id").as("pid"), concat(lit("p"), col("id")).as("name"))
  private def policies(n: Int) = spark.range(n.toLong)
    .select(col("id").as("pid"), (col("id") * 100).as("premium"))

  private def pairRows(g: String) = (
    TableGroup.read(spark, g, "persons")
      .as[(Long, String)].collect().toSet,
    TableGroup.read(spark, g, "policies")
      .as[(Long, Long)].collect().toSet)

  test("init + read round-trips both members under one root pin") {
    val g = tmp()
    assert(TableGroup.init(spark, g, Seq(
      "persons" -> persons(10), "policies" -> policies(10))) === 1L)
    assert(TableGroup.version(spark, g) === 1L)
    assert(TableGroup.members(spark, g).keySet === Set("persons", "policies"))
    val (p, q) = pairRows(g)
    assert(p.size === 10 && q.size === 10)
  }

  test("a full commit lands on every member atomically; group time " +
    "travel reproduces the consistent pre-commit pair") {
    val g = tmp()
    TableGroup.init(spark, g, Seq(
      "persons" -> persons(10), "policies" -> policies(10)))
    TableGroup.commit(spark, g, Seq(
      "persons" -> (d => VersionedTable.merge(spark, d,
        Seq((3L, "P3-NEW")).toDF("pid", "name"), Seq("pid"))),
      "policies" -> (d => VersionedTable.merge(spark, d,
        Seq((3L, 999L)).toDF("pid", "premium"), Seq("pid")))))
    val (p, q) = pairRows(g)
    assert(p.contains((3L, "P3-NEW")) && q.contains((3L, 999L)))
    // group v1 still serves the OLD pair together
    assert(TableGroup.readAt(spark, g, "persons", 1L)
      .filter(col("pid") === 3L).select("name")
      .as[String].collect().toSeq === Seq("p3"))
    assert(TableGroup.readAt(spark, g, "policies", 1L)
      .filter(col("pid") === 3L).select("premium")
      .as[Long].collect().toSeq === Seq(300L))
  }

  test("CRASH between member commits: the root never exposes the " +
    "half-applied pair, and the next commit heals + retries to " +
    "exactly-once effect") {
    val g = tmp()
    TableGroup.init(spark, g, Seq(
      "persons" -> persons(10), "policies" -> policies(10)))
    // simulate a group commit that died after advancing persons but
    // before touching policies or flipping the root
    VersionedTable.merge(spark, g + "/persons",
      Seq((5L, "P5-CRASHED")).toDF("pid", "name"), Seq("pid"))
    // readers through the group still see the OLD consistent pair
    val (p0, q0) = pairRows(g)
    assert(p0.contains((5L, "p5")), "half-applied member leaked")
    assert(q0.contains((5L, 500L)))
    // the retried commit: heals persons back to its pin, then applies
    // the intended pair
    TableGroup.commit(spark, g, Seq(
      "persons" -> (d => VersionedTable.merge(spark, d,
        Seq((5L, "P5-DONE")).toDF("pid", "name"), Seq("pid"))),
      "policies" -> (d => VersionedTable.merge(spark, d,
        Seq((5L, 555L)).toDF("pid", "premium"), Seq("pid")))))
    val (p1, q1) = pairRows(g)
    assert(p1.contains((5L, "P5-DONE")) && q1.contains((5L, 555L)))
    assert(!p1.exists(_._2 == "P5-CRASHED"),
      "the crashed attempt's phantom write survived the heal")
    assert(p1.size === 10 && q1.size === 10)
  }

  test("CRASH after heal, before flip: healing is content-convergent " +
    "(no restore stacking), and a later commit still lands cleanly") {
    val g = tmp()
    TableGroup.init(spark, g, Seq(
      "persons" -> persons(6), "policies" -> policies(6)))
    VersionedTable.merge(spark, g + "/persons",
      Seq((1L, "GHOST")).toDF("pid", "name"), Seq("pid"))
    // first heal (simulated: restore happens inside commit; here we
    // run a commit that itself dies before the flip — emulated by
    // restoring manually, the same code path commit uses)
    VersionedTable.restore(spark, g + "/persons",
      TableGroup.members(spark, g)("persons"))
    val vAfterHeal = VersionedTable.currentVersion(spark, g + "/persons")
    // a commit now sees live != pin but IDENTICAL content → no new
    // restore version, just the op + flip
    TableGroup.commit(spark, g, Seq(
      "policies" -> (d => VersionedTable.merge(spark, d,
        Seq((1L, 111L)).toDF("pid", "premium"), Seq("pid")))))
    assert(VersionedTable.currentVersion(spark, g + "/persons")
      === vAfterHeal, "heal stacked a redundant restore")
    val (p, q) = pairRows(g)
    assert(p.contains((1L, "p1")) && q.contains((1L, 111L)))
    // and the healed member's pin moved to the restored version, so
    // group reads serve it without error
    assert(TableGroup.members(spark, g)("persons") === vAfterHeal)
  }

  test("a torn root flip recovers from the highest root history copy") {
    val g = tmp()
    TableGroup.init(spark, g, Seq(
      "persons" -> persons(5), "policies" -> policies(5)))
    TableGroup.commit(spark, g, Seq(
      "persons" -> (d => VersionedTable.merge(spark, d,
        Seq((2L, "X")).toDF("pid", "name"), Seq("pid")))))
    java.nio.file.Files.delete(java.nio.file.Paths.get(g, "_tg_root"))
    assert(TableGroup.version(spark, g) === 2L)
    assert(TableGroup.read(spark, g, "persons")
      .filter(col("pid") === 2L).select("name")
      .as[String].collect().toSeq === Seq("X"))
  }

  test("unknown member or malformed name fails fast") {
    val g = tmp()
    TableGroup.init(spark, g, Seq("persons" -> persons(3)))
    intercept[IllegalArgumentException] {
      TableGroup.commit(spark, g, Seq(
        "nope" -> (_ => 1L)))
    }
    intercept[IllegalArgumentException] {
      TableGroup.init(spark, tmp(), Seq("_bad" -> persons(1)))
    }
  }
}
