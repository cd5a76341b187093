package graft

import org.apache.spark.sql.functions._
import graft.functions.StrFunctions._

/** Edge semantics of str_before/str_after
  * (reference: sdk/lib/str.php:11-31).
  */
class StrFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def eval(s: String, sep: String): (String, String) = {
    val row = Seq(s).toDF("v")
      .select(strBefore(col("v"), sep).as("b"), strAfter(col("v"), sep).as("a"))
      .head()
    (row.getString(0), row.getString(1))
  }

  test("separator in the middle") {
    assert(eval("hello world", " ") === (("hello", "world")))
  }

  test("separator absent returns empty for both") {
    assert(eval("helloworld", " ") === (("", "")))
  }

  test("separator at position 0: before is empty (PHP strpos falsiness)") {
    assert(eval(" leading", " ") === (("", "leading")))
  }

  test("multi-char separator") {
    assert(eval("a -> b", "->") === (("a ", " b")))
  }

  test("separator at end") {
    assert(eval("trail-", "-") === (("trail", "")))
  }
}
