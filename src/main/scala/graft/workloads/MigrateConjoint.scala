package graft.workloads

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.etl.FanOut

/** The spouse migration — `migrate_conjoint.php` — set-based (reference:
  * sdk/migrate_conjoint.php; the source read at :76-84 is the codebase's one
  * explicit SQL join).
  *
  * Reference flow, per joined (conjoint ⋈ assure_conjoints) row: probe the
  * policy holder by `numero_assure` (orphans logged and skipped —
  * :124-127), probe for an existing mariage bound by (policy_holder_id,
  * policy_number) (:130-137, skip if present), else insert an `ass_persons`
  * row and an `ass_mariage_bounds` row sharing fresh UUIDs with NOW()
  * audit columns (:139-170).
  *
  * Set form: inner join + semi/anti joins + fan-out. Orphan rows (the
  * reference's per-row log lines) come back as a DataFrame so callers can
  * count/persist them — SURVEY.md §5's "anti-join residue = 0" assertion.
  */
object MigrateConjoint {

  final case class Result(persons: DataFrame, mariageBounds: DataFrame,
                          orphans: DataFrame)

  /** @param conjoints       spouse attributes (numero_conjoint key)
    * @param assureConjoints link table spouse ↔ assure
    * @param policyHolders   destination ass_policy_holders (sin, id)
    * @param existingBounds  destination ass_mariage_bounds
    * @param runTs           NOW() audit timestamp (run-stable)
    */
  def run(conjoints: DataFrame, assureConjoints: DataFrame,
          policyHolders: DataFrame, existingBounds: DataFrame,
          runTs: String): Result = {

    // J1: the reference's sole SQL join, unchanged in shape.
    val joined = conjoints.join(assureConjoints, Seq("numero_conjoint"))

    // Point-lookup join as broadcast/hash join: attach policy_holder_id.
    val ph = policyHolders.select(col("sin"),
      col("id").as("policy_holder_id"))
    val withPh = joined.join(ph,
      joined("numero_assure") === ph("sin"), "left")

    // Orphan detection (reference logs "Policy holder ... does not exists").
    val orphans = withPh.filter(col("policy_holder_id").isNull)
      .select("numero_conjoint", "numero_assure")

    // Skip-if-exists guard on (policy_holder_id, policy_number).
    val candidate = withPh.filter(col("policy_holder_id").isNotNull)
      .withColumn("policy_number", col("numero_conjoint"))
    val fresh = candidate.join(
      existingBounds.select(col("policy_holder_id"), col("policy_number")),
      Seq("policy_holder_id", "policy_number"), "left_anti")

    // Fan-out sharing surrogate ids (uuid generated once, materialized).
    val withIds = FanOut.withIds(fresh, Seq("person_id", "bound_id"))

    val persons = withIds.select(
      col("person_id").as("id"),
      col("prenoms").as("firstname"), col("nom").as("lastname"),
      col("sexe").as("sex"), col("date_naissance").as("birth_date"),
      lit(runTs).as("created_at"), lit(runTs).as("updated_at"))

    val bounds = withIds.select(
      col("bound_id").as("id"),
      col("policy_holder_id"), col("person_id"), col("policy_number"),
      col("date_lien").as("bound_at"), col("type_lien").as("bound_type_id"),
      col("etat_conjoint").as("spouce_state_id"),
      lit(runTs).as("created_at"), lit(runTs).as("updated_at"))

    Result(persons, bounds, orphans)
  }
}
