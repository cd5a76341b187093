package graft.workloads

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.etl.FanOut

/** The children migration — `migrate_enfants.php` — set-based (reference:
  * sdk/migrate_enfants.php). Shape-identical to the spouse migration minus
  * the link-table join: per enfant, probe the policy holder by
  * `numero_assure` (orphans logged — :119-121), skip if a parenting bound
  * already exists for (policy_holder_id, policy_number) (:125-134), else
  * insert person + `ass_parenting_bounds` sharing UUIDs (:137-169).
  */
object MigrateEnfants {

  final case class Result(persons: DataFrame, parentingBounds: DataFrame,
                          orphans: DataFrame)

  def run(enfants: DataFrame, policyHolders: DataFrame,
          existingBounds: DataFrame, runTs: String): Result = {

    val ph = policyHolders.select(col("sin"),
      col("id").as("policy_holder_id"))
    val withPh = enfants.join(ph,
      enfants("numero_assure") === ph("sin"), "left")

    val orphans = withPh.filter(col("policy_holder_id").isNull)
      .select("numero_enfant", "numero_assure")

    val candidate = withPh.filter(col("policy_holder_id").isNotNull)
      .withColumn("policy_number", col("numero_enfant"))
    val fresh = candidate.join(
      existingBounds.select(col("policy_holder_id"), col("policy_number")),
      Seq("policy_holder_id", "policy_number"), "left_anti")

    val withIds = FanOut.withIds(fresh, Seq("person_id", "bound_id"))

    val persons = withIds.select(
      col("person_id").as("id"),
      col("prenoms").as("firstname"), col("nom").as("lastname"),
      col("sexe").as("sex"), col("date_naissance").as("birth_date"),
      lit(runTs).as("created_at"), lit(runTs).as("updated_at"))

    val bounds = withIds.select(
      col("bound_id").as("id"),
      col("policy_holder_id"), col("person_id"),
      col("etat_enfant").as("descendant_state_id"),
      col("policy_number"),
      lit(runTs).as("created_at"), lit(runTs).as("updated_at"))

    Result(persons, bounds, orphans)
  }
}
