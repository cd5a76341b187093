package graft.workloads

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.etl.{FanOut, Upsert}

/** The reference's flagship workload — `migrate_assures.php` — as a set-based
  * Spark program (reference: sdk/migrate_assures.php; shape analysis in
  * SURVEY.md §3.2).
  *
  * The reference iterates the `assures` cursor and, PER ROW: probes the
  * destination policy holder by `sin` (a cross-database network round-trip),
  * then either updates the matched policy holder or inserts a person +
  * policy holder + contact + address + two ancestor rows (all linked by
  * client-side UUIDs), and finally delete-reinserts the career child rows.
  *
  * Here the whole workload is three joins plus projections:
  *
  *   1. `assures ⟕ ass_policy_holders(sin)` — one broadcast/hash join
  *      replaces ~N probe round-trips (the reference's dominant cost);
  *   2. fan-out of the unmatched side into the six destination shapes,
  *      sharing uuid() surrogate ids via one materialization;
  *   3. `assures ⋈ carriere_assures(numero_assure)` + replace-children
  *      overwrite of the career links, then the current-employment upsert
  *      (date_embauche/numero_employeur_actuel) folded in set-form.
  *
  * Update/delete sinks: vanilla Spark cannot update rows in place, so the
  * parity harness returns the NEW STATE of each destination table
  * (recompute-and-overwrite — SURVEY.md §2.1 S9/S10); against a Delta/Iceberg
  * sink the same frames feed MERGE/overwrite commits.
  */
object MigrateAssures {

  /** New destination state after migrating `assures`.
    *
    * @param assures   source driving table
    * @param carriere  source employment-history child table
    * @param dest      current destination state: ass_persons,
    *                  ass_policy_holders, ass_policy_holder_contacts,
    *                  ass_policy_holder_addresses, ass_policy_holder_ancestors,
    *                  ass_registrant_policy_holders
    */
  def run(assures: DataFrame, carriere: DataFrame,
          dest: Map[String, DataFrame]): Map[String, DataFrame] = {

    val policyHolders = dest("ass_policy_holders")

    // ---- 1. the per-row probe as ONE join -----------------------------
    val matchedKeys = policyHolders.select(col("sin")).distinct()
    val existing = assures.join(matchedKeys,
      assures("numero_assure") === matchedKeys("sin"), "left_semi")
    val fresh = assures.join(matchedKeys,
      assures("numero_assure") === matchedKeys("sin"), "left_anti")

    // ---- 2a. update branch (matched → overwrite mapped columns) -------
    val phUpdates = existing.select(
      col("numero_assure").as("sin"),
      col("type_assure").cast("string").as("policy_holder_type_id"),
      col("date_immatriculation").as("enrolled_at"),
      when(upper(col("code_etat_handicap")) === "O", 1).otherwise(0)
        .as("handicaped"),
      col("etat_assure").as("status"))

    // ---- 2b. insert branch: fan-out with shared uuid ids ---------------
    // uuid() is nondeterministic — generate once, materialize, project N
    // ways (FanOut contract).
    val withIds = FanOut.withIds(fresh, Seq("person_id", "policy_holder_id"))

    val persons = withIds.select(
      col("person_id").as("id"),
      col("prenoms").as("firstname"), col("nom").as("lastname"),
      col("sexe").as("sex"), col("date_naissance").as("birth_date"),
      col("lieu_naissance").as("birth_place"),
      col("code_pays_nais").as("birth_country"),
      col("code_pays_nationalite").as("nationality"),
      col("code_site_matri_actuel").as("marital_status_id"),
      col("code_civilite").as("civil_state_id"))

    val phInserts = withIds.select(
      col("policy_holder_id").as("id"),
      col("type_assure").cast("string").as("policy_holder_type_id"),
      col("person_id"),
      col("date_immatriculation").as("enrolled_at"),
      col("numero_assure").as("sin"),
      when(upper(col("code_etat_handicap")) === "O", 1).otherwise(0)
        .as("handicaped"),
      col("etat_assure").as("status"))

    val contacts = withIds.select(
      expr("uuid()").as("id"), col("policy_holder_id"),
      col("tel").as("phone_number"), col("email"),
      col("bp_ville").as("po_box"),
      coalesce(col("adresse"), col("rue")).as("address"))

    val addresses = withIds.select(
      expr("uuid()").as("id"), col("policy_holder_id"),
      col("code_pays_adr").as("country"), col("code_ville").as("city"),
      col("code_region").as("region"), col("code_commune").as("municipality"),
      col("code_prefecture").as("prefecture"),
      col("code_quartier_unique").as("district"),
      coalesce(col("adresse"), col("rue")).as("physical_address"))

    val fathers = withIds.select(
      expr("uuid()").as("id"), col("policy_holder_id"),
      col("prenom_pere").as("firstname"), col("nom_pere").as("lastname"),
      col("date_nais_pere").as("birth_date"),
      col("lieu_nais_pere").as("birth_place"),
      lit("p").as("ancestor_tag"),
      col("etat_pere").as("ancestor_condition"))
    val mothers = withIds.select(
      expr("uuid()").as("id"), col("policy_holder_id"),
      col("prenom_mere").as("firstname"), col("nom_mere").as("lastname"),
      col("date_nais_mere").as("birth_date"),
      col("lieu_nais_mere").as("birth_place"),
      lit("m").as("ancestor_tag"),
      col("etat_mere").as("ancestor_condition"))

    // ---- 2c. merge both branches into the new policy-holder state -----
    // Updates first (matched sins overwrite), then brand-new rows append.
    val phAfterUpdate = {
      val d = policyHolders
      val u = phUpdates.select(col("sin").as("u_sin"),
        col("policy_holder_type_id").as("u_type"),
        col("enrolled_at").as("u_enrolled"),
        col("handicaped").as("u_handicaped"),
        col("status").as("u_status"))
      // overwrite mapped columns for matched sins, keep surrogate ids
      d.join(u, d("sin") === u("u_sin"), "left")
        .select(d("id"), d("sin"), d("person_id"),
          coalesce(u("u_type"), d("policy_holder_type_id"))
            .as("policy_holder_type_id"),
          coalesce(u("u_enrolled"), d("enrolled_at")).as("enrolled_at"),
          coalesce(u("u_handicaped"), d("handicaped")).as("handicaped"),
          coalesce(u("u_status"), d("status")).as("status"))
    }
    val phNew = phAfterUpdate.unionByName(
      phInserts.select(phAfterUpdate.columns.map(col).toIndexedSeq: _*))

    // ---- 3. career children: delete-then-insert as replace-children ----
    val phKeys = phNew.select(col("sin"), col("id").as("policy_holder_id"))
    val recomputedCareers = carriere
      .join(phKeys, carriere("numero_assure") === phKeys("sin"))
      .select(expr("uuid()").as("id"),
        col("date_entree").as("start_date"),
        col("date_sortie").as("end_date"),
        col("numero_employeur").as("registrant_id"),
        col("policy_holder_id"))

    // ---- 3b. current-employment upsert (reference :229-235): after the
    // career reinsert, every assure with BOTH date_embauche and
    // numero_employeur_actuel set upserts on (policy_holder_id,
    // registrant_id) — matching career rows get start_date=date_embauche /
    // end_date=NULL (the reference's UPDATE hits every matching row), and a
    // pair with no career row inserts fresh. Assures frames without the two
    // columns skip the branch, exactly as the reference's isset() guard
    // treats an absent field.
    val careersWithCurrent =
      if (!assures.columns.contains("date_embauche") ||
          !assures.columns.contains("numero_employeur_actuel"))
        recomputedCareers
      else {
        val endType = recomputedCareers.schema("end_date").dataType
        // One row per (policy holder, employer) pair: duplicate assures
        // rows would otherwise fan the left join out and multiply career
        // rows. The reference applied them one UPDATE at a time (last
        // cursor row wins); the deterministic set form keeps the latest
        // hire date.
        val cur = assures
          .filter(col("date_embauche").isNotNull &&
            col("numero_employeur_actuel").isNotNull)
          .join(phKeys, assures("numero_assure") === phKeys("sin"))
          .groupBy(col("policy_holder_id").as("c_ph"),
            col("numero_employeur_actuel").as("c_reg"))
          .agg(max(col("date_embauche")).as("c_start"))
        val updated = recomputedCareers.join(cur,
            recomputedCareers("policy_holder_id") === cur("c_ph") &&
              recomputedCareers("registrant_id") === cur("c_reg"), "left")
          .select(col("id"),
            when(col("c_ph").isNotNull, col("c_start"))
              .otherwise(col("start_date")).as("start_date"),
            when(col("c_ph").isNotNull, lit(null).cast(endType))
              .otherwise(col("end_date")).as("end_date"),
            col("registrant_id"), col("policy_holder_id"))
        val inserted = cur.join(recomputedCareers,
            recomputedCareers("policy_holder_id") === cur("c_ph") &&
              recomputedCareers("registrant_id") === cur("c_reg"),
            "left_anti")
          .select(expr("uuid()").as("id"),
            col("c_start").as("start_date"),
            lit(null).cast(endType).as("end_date"),
            col("c_reg").as("registrant_id"),
            col("c_ph").as("policy_holder_id"))
        updated.unionByName(inserted)
      }
    val careersNew = Upsert.replaceChildren(
      dest("ass_registrant_policy_holders"), careersWithCurrent,
      Seq("policy_holder_id"))

    Map(
      "ass_persons" -> dest("ass_persons").unionByName(persons),
      "ass_policy_holders" -> phNew,
      "ass_policy_holder_contacts" ->
        dest("ass_policy_holder_contacts").unionByName(contacts),
      "ass_policy_holder_addresses" ->
        dest("ass_policy_holder_addresses").unionByName(addresses),
      "ass_policy_holder_ancestors" ->
        dest("ass_policy_holder_ancestors")
          .unionByName(fathers).unionByName(mothers),
      "ass_registrant_policy_holders" -> careersNew)
  }
}
