package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's core projection operator: a destination column is either a
  * source-column reference (`"[src]"`), a literal constant (any other bare
  * string), or the one built-in scalar function `NOW()`
  * (reference: sdk/src/ETLTask.php:39-54, 81-84; sdk/etl.php:10-30).
  *
  * Design difference, documented per SURVEY.md §7.3: the reference evaluates
  * `NOW()` per row at transform time (timestamps can drift across rows within
  * one run); we standardize on a per-run-constant timestamp, which is what a
  * set-based engine should do.
  */
sealed trait ColumnSpec {
  def dst: String
  def toColumn(runTimestamp: String): Column
}

/** `"dst": "[src]"` — rename/projection of a source column. */
final case class SourceCol(dst: String, src: String) extends ColumnSpec {
  def toColumn(runTimestamp: String): Column = col(src).alias(dst)
}

/** Unbracketed mapping value — injected verbatim into every row
  * (reference: sdk/src/ETLTask.php:83 else-branch).
  */
final case class LiteralCol(dst: String, value: String) extends ColumnSpec {
  def toColumn(runTimestamp: String): Column = lit(value).alias(dst)
}

/** `NOW()` — run-stable timestamp string, format `yyyy-MM-dd HH:mm:ss`. */
final case class NowCol(dst: String) extends ColumnSpec {
  def toColumn(runTimestamp: String): Column = lit(runTimestamp).alias(dst)
}

object ColumnMapping {
  val NowFormat = "yyyy-MM-dd HH:mm:ss"

  /** Current timestamp in the reference's `NOW()` format (UTC). */
  def runTimestamp(): String =
    java.time.format.DateTimeFormatter
      .ofPattern(NowFormat)
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.now())

  /** Parse one map-form entry `{"dst": spec}`. Exact reference dispatch
    * (sdk/src/ETLTask.php:81-84 `getPropertyValue`): a `[` ANYWHERE makes
    * the spec a column reference with every bracket stripped (so
    * `"a[b]"` references column `ab`); otherwise `NOW()` matches
    * case-insensitively after trimming; anything else is a literal.
    * Names are trimmed (sdk/etl.php:115-125).
    */
  def parse(dst: String, spec: String): ColumnSpec = {
    val d = dst.trim
    if (spec.contains("["))
      SourceCol(d, spec.replace("[", "").replace("]", "").trim)
    else if (spec.trim.toUpperCase == "NOW()") NowCol(d)
    else LiteralCol(d, spec.trim)
  }

  /** Parse one list-form entry `"dst <- spec"` (reference: sdk/etl.php:10-30
    * `prepare_columns` splits on `<-` and the RHS is then dispatched through
    * `getPropertyValue` like any map-form spec — so a column reference needs
    * brackets: `"a <- [b]"`; `"a <- b"` injects the LITERAL `b`).
    *
    * Documented extension: a bare `"col"` (no arrow) maps the column to
    * itself. The reference degenerates here (`str_before`/`str_after` both
    * return "" when the separator is absent, producing a nameless empty
    * literal — sdk/etl.php:22-23); self-mapping is the evident intent and
    * an empty column name would only fail analysis later.
    */
  def parseArrow(entry: String): ColumnSpec = {
    val i = entry.indexOf("<-")
    if (i < 0) { val c = entry.trim; SourceCol(c, c) }
    else parse(entry.substring(0, i), entry.substring(i + 2))
  }

  /** Apply an ordered mapping as a single narrow `select` — Catalyst's
    * ColumnPruning pushes the source-column list into the scan, which is the
    * set-based analogue of the reference baking the column list into its
    * SELECT (sdk/src/SQLTable.php:40-44).
    */
  def apply(df: DataFrame, specs: Seq[ColumnSpec],
            runTs: String = runTimestamp()): DataFrame =
    df.select(specs.map(_.toColumn(runTs)): _*)
}
