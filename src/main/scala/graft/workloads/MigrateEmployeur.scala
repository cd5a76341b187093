package graft.workloads

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.StrFunctions

/** The registrant migration — `migrate_employeur.php` — set-based
  * (reference: sdk/migrate_employeur.php).
  *
  * Reference flow, per employeur row: existence probe via
  * `COUNT(DISTINCT sin)` (:27-40, skip if present), then inside a
  * transaction insert `ass_registrants` (id = numero_employeur, :73-80) and
  * `ass_registrant_contacts` (:86-95) — splitting the legacy `address`
  * blob on the literal `'TEL'` marker with `str_before`/`str_after`
  * (:91-94, the reference's own string functions with their empty-string
  * edge semantics).
  *
  * Set form: anti-join on sin + two projections. The per-record
  * transaction's atomicity maps to the job commit protocol (both outputs
  * come from ONE deduped frame, so partial fan-out can't happen).
  */
object MigrateEmployeur {

  final case class Result(registrants: DataFrame, contacts: DataFrame)

  def run(employeurs: DataFrame, existingRegistrants: DataFrame,
          registrantTypeId: Int = 1): Result = {

    // COUNT(DISTINCT sin) > 0 probe as a set op: anti-join on sin.
    val fresh = employeurs.join(
      existingRegistrants.select(col("sin")).distinct()
        .withColumnRenamed("sin", "numero_employeur"),
      Seq("numero_employeur"), "left_anti")

    val registrants = fresh.select(
      col("numero_employeur").as("id"),
      lit(registrantTypeId).as("registrant_type_id"),
      col("raison_sociale").as("name"),
      col("numero_employeur").as("sin"))

    // address blob: "<po_box>TEL<phone>" split on the literal marker.
    val contacts = fresh.select(
      expr("uuid()").as("id"),
      col("numero_employeur").as("registrant_id"),
      StrFunctions.strAfter(col("address"), "TEL").as("phone_number"),
      lit(null).cast("string").as("email"),
      col("adresse").as("address"),
      StrFunctions.strBefore(col("address"), "TEL").as("po_box"))

    Result(registrants, contacts)
  }
}
