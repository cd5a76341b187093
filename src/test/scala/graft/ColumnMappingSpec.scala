package graft

import graft.etl._

/** Config-language parsing: "[src]" | literal | NOW(), map and arrow forms
  * (reference: sdk/src/ETLTask.php:81-84, sdk/etl.php:10-30).
  */
class ColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  test("bracketed spec is a source column reference") {
    assert(ColumnMapping.parse("dst", " [ src ] ") === SourceCol("dst", "src"))
  }

  test("bare spec is a literal") {
    assert(ColumnMapping.parse("dst", "hello") === LiteralCol("dst", "hello"))
  }

  test("NOW() is the timestamp function, case-insensitive like the reference") {
    assert(ColumnMapping.parse("ts", " NOW() ") === NowCol("ts"))
    assert(ColumnMapping.parse("ts", "now()") === NowCol("ts"))
  }

  test("any bracket makes a column ref with all brackets stripped") {
    // getPropertyValue dispatch: strpos + str_replace of every bracket
    assert(ColumnMapping.parse("d", "a[b]") === SourceCol("d", "ab"))
    assert(ColumnMapping.parse("d", "[x") === SourceCol("d", "x"))
  }

  test("arrow form RHS dispatches like a map-form spec") {
    // reference: prepare_columns RHS goes through getPropertyValue, so a
    // column reference needs brackets; bare RHS is a literal
    assert(ColumnMapping.parseArrow(" a <- [b] ") === SourceCol("a", "b"))
    assert(ColumnMapping.parseArrow(" a <- b ") === LiteralCol("a", "b"))
    assert(ColumnMapping.parseArrow(" ts <- now() ") === NowCol("ts"))
    assert(ColumnMapping.parseArrow(" c ") === SourceCol("c", "c"))
  }

  test("mapping applies rename, literal, and run-stable NOW()") {
    val df = Seq((1, "x"), (2, "y")).toDF("id", "v")
    val specs = Seq(ColumnMapping.parse("out_id", "[id]"),
      ColumnMapping.parse("sys", "legacy"),
      ColumnMapping.parse("ts", "NOW()"))
    val out = ColumnMapping(df, specs, runTs = "2026-01-01 00:00:00")
    assert(out.columns.toSeq === Seq("out_id", "sys", "ts"))
    val rows = out.collect()
    assert(rows.forall(_.getString(1) == "legacy"))
    assert(rows.map(_.getString(2)).distinct.toSeq ===
      Seq("2026-01-01 00:00:00")) // run-stable, not per-row
  }

  test("pipeline spec validation fails fast") {
    intercept[IllegalArgumentException](PipelineSpec.parse("{}"))
    intercept[IllegalArgumentException](
      PipelineSpec.parse("""{"tables":[{"flow":"no arrow"}]}"""))
    intercept[IllegalArgumentException](
      PipelineSpec.parse("""{"tables":[{"flow":" -> x"}]}"""))
  }
}
