package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's operator-string condition form (reference:
  * sdk/src/SQLTable.php:60-75): each condition is one string
  * `"column operator value"`, tokenized on spaces exactly like the
  * reference (`str_before(" ", …)` / `str_after(" ", …)` — column up
  * to the first space, operator up to the next, value is the rest),
  * multiple conditions AND-joined, and every VALUE bound as a STRING
  * (`PDO::PARAM_STR` in the reference — the server coerced it to the
  * column's type, so here the literal is cast to the column's Spark
  * type before comparing).
  *
  * Parsing is fail-fast at config-parse time, mirroring
  * sdk/etl.php:92-110's validation posture: a malformed condition
  * (missing operator/value, an operator outside the SQL comparison
  * set) throws immediately instead of surfacing as a Catalyst analysis
  * error mid-pipeline.
  */
object ExistsProbe {

  final case class Cond(column: String, op: String, value: String)

  /** SQL comparison operators the probe accepts — the set a
    * `column op :param` MariaDB prepared statement can hold without
    * changing shape (the reference interpolates the operator verbatim;
    * the allowlist is this engine's fail-fast hardening of that).
    */
  private val Operators =
    Set("=", "!=", "<>", ">", ">=", "<", "<=", "like", "not_like")

  /** Tokenize one `"column operator value"` string, reference-style. */
  def parseCond(s: String): Cond = {
    val t = s.trim
    val i = t.indexOf(' ')
    require(i > 0, s"exists condition '$s': expected 'column operator value'")
    val column = t.substring(0, i)
    val rest = t.substring(i + 1).trim
    val j = rest.indexOf(' ')
    require(j > 0,
      s"exists condition '$s': missing value after operator")
    val op = rest.substring(0, j)
    val value = rest.substring(j + 1).trim
    require(Operators.contains(op.toLowerCase),
      s"exists condition '$s': unsupported operator '$op'")
    require(value.nonEmpty,
      s"exists condition '$s': empty value")
    require(column.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"exists condition '$s': bad column name '$column'")
    Cond(column, op.toLowerCase, value)
  }

  /** AND-joined predicate over `df`'s schema: the string-bound value is
    * cast to the column's type (the server-side coercion the reference
    * relied on), so `"o_totalprice >= 400000"` compares numerically,
    * never lexicographically.
    */
  def predicate(df: DataFrame, conds: Seq[Cond]): Column = {
    require(conds.nonEmpty, "exists probe needs at least one condition")
    conds.map { c =>
      require(df.columns.contains(c.column),
        s"exists condition column '${c.column}' not in ${df.columns.toSeq}")
      val lhs = col(c.column)
      val rhs = lit(c.value).cast(df.schema(c.column).dataType)
      c.op match {
        case "=" => lhs === rhs
        case "!=" | "<>" => lhs =!= rhs
        case ">" => lhs > rhs
        case ">=" => lhs >= rhs
        case "<" => lhs < rhs
        case "<=" => lhs <= rhs
        case "like" => lhs.like(c.value)
        case "not_like" => !lhs.like(c.value)
      }
    }.reduce(_ && _)
  }

  /** The probe itself — `SQLTable::exists`' boolean contract: does any
    * row match? One aggregated scan (LIMIT-1-able by Catalyst), never a
    * driver-side row loop.
    */
  def exists(df: DataFrame, conds: Seq[Cond]): Boolean =
    !df.filter(predicate(df, conds)).isEmpty
}
