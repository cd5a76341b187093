package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** String helpers with the exact edge semantics of the reference's
  * `str_before` / `str_after` (reference: sdk/lib/str.php:11-31):
  *
  *  - `strAfter` returns "" when the separator is absent.
  *  - `strBefore` returns "" when the separator is absent AND when it occurs
  *    at position 0 (the reference preserves PHP `strpos` falsiness at
  *    position 0 as behavior — we replicate it deliberately).
  *
  * Composed from codegen'd built-ins (`instr`, `substring_index`, `substr`)
  * rather than a UDF so the expressions stay inside whole-stage codegen.
  */
object StrFunctions {

  /** Substring of `c` before the first occurrence of `sep`; "" when absent
    * or when `sep` is at position 0.
    */
  def strBefore(c: Column, sep: String): Column =
    when(instr(c, sep) <= 1, lit("")).otherwise(substring_index(c, sep, 1))

  /** Substring of `c` after the first occurrence of `sep`; "" when absent. */
  def strAfter(c: Column, sep: String): Column =
    when(instr(c, sep) === 0, lit(""))
      .otherwise(c.substr(instr(c, sep) + lit(sep.length), length(c)))

  /** Random v4 UUID per row (reference: sdk/lib/str.php:39-51 generated these
    * client-side; Spark's built-in nondeterministic expression replaces it).
    */
  def strUuid(): Column = expr("uuid()")
}
