package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.concurrent.ExecutionContext.Implicits.global

import graft.etl.Orchestrator
import graft.workloads._

/** The whole `import.sh` replay (reference: sdk/shell/import.sh:85-100 —
  * employeur before assures sequentially, enfants ∥ conjoint in parallel;
  * import_users.sh after): all six migration programs over one coherent
  * CNSS-shaped fixture set, with cross-workload referential integrity
  * asserted at the end — registrant links resolve, every bound points at a
  * real person and policy holder, orphan counts match the planted data.
  */
class FullImportSpec extends SparkSpec {
  import spark.implicits._

  test("six-workload orchestrated import with referential integrity") {
    // ---- sources ------------------------------------------------------
    val employeurs = Seq(
      ("E1", "Acme", "Rue 1", "BP1TEL229001"),
      ("E2", "Beta", "Rue 2", "BP2TEL229002")
    ).toDF("numero_employeur", "raison_sociale", "adresse", "address")

    val assures = {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types.{StringType, StructField, StructType}
      val cols = Seq("numero_assure", "prenoms", "nom", "sexe",
        "date_naissance", "lieu_naissance", "code_pays_nais",
        "code_pays_nationalite", "code_site_matri_actuel", "code_civilite",
        "type_assure", "date_immatriculation", "code_etat_handicap",
        "etat_assure", "tel", "email", "bp_ville", "adresse", "rue",
        "code_pays_adr", "code_ville", "code_region", "code_commune",
        "code_prefecture", "code_quartier_unique", "prenom_pere",
        "nom_pere", "date_nais_pere", "lieu_nais_pere", "etat_pere",
        "prenom_mere", "nom_mere", "date_nais_mere", "lieu_nais_mere",
        "etat_mere")
      def row(id: String, h: String) = Row.fromSeq(
        Seq(id, "P", "N", "F", "1990-01-01", "L", "TG", "TG", "M", "C",
          "1", "2020-01-01", h, "ACTIVE", "229", s"$id@x.tg", "BP",
          "Rue", null, "TG", "V", "R", "CM", "P", "Q", "Pp", "Np",
          "1960-01-01", "K", "alive", "Pm", "Nm", "1962-01-01", "K",
          "alive"))
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(row("A1", "O"), row("A2", "N"))),
        StructType(cols.map(StructField(_, StringType, true))))
    }

    val carriere = Seq(
      ("A1", "E1", "2020-01-01", null.asInstanceOf[String]),
      ("A2", "E2", "2019-01-01", null.asInstanceOf[String])
    ).toDF("numero_assure", "numero_employeur", "date_entree", "date_sortie")

    val conjoints = Seq(("C1", "Ama", "S", "F", "1992-01-01", "married"))
      .toDF("numero_conjoint", "prenoms", "nom", "sexe", "date_naissance",
        "etat_conjoint")
    val assureConjoints = Seq(("C1", "A1", "2015-01-01", "civil"))
      .toDF("numero_conjoint", "numero_assure", "date_lien", "type_lien")
    val enfants = Seq(
      ("K1", "A1", "Abla", "N", "F", "2012-01-01", "alive"),
      ("K2", "A9", "Kojo", "N", "M", "2014-01-01", "alive") // orphan
    ).toDF("numero_enfant", "numero_assure", "prenoms", "nom", "sexe",
      "date_naissance", "etat_enfant")
    val users = Seq(
      (1, "awa@x.tg", "pw", "A1", 0, 1, "991", 2),
      (2, "kofi@x.gh", "pw", "A2", 0, 1, "992", 2)
    ).toDF("id", "username", "password", "numero_assurance",
      "double_auth_active", "is_active", "contact", "type_partenaire")

    def empty(cols: (String, String)*): DataFrame =
      cols.foldLeft(spark.emptyDataFrame) { case (df, (n, t)) =>
        df.withColumn(n, lit(null).cast(t))
      }

    // ---- stage 1: employeur (import.sh:85-91 runs it first) ------------
    val emp = MigrateEmployeur.run(employeurs,
      empty("sin" -> "string"))
    val registrants = emp.registrants.cache(); registrants.count()

    // ---- stage 2: assures (depends on registrants) ---------------------
    val assuresOut = MigrateAssures.run(assures, carriere, Map(
      "ass_persons" -> empty("id" -> "string", "firstname" -> "string",
        "lastname" -> "string", "sex" -> "string", "birth_date" -> "string",
        "birth_place" -> "string", "birth_country" -> "string",
        "nationality" -> "string", "marital_status_id" -> "string",
        "civil_state_id" -> "string"),
      "ass_policy_holders" -> empty("id" -> "string", "sin" -> "string",
        "person_id" -> "string", "policy_holder_type_id" -> "string",
        "enrolled_at" -> "string", "handicaped" -> "int",
        "status" -> "string"),
      "ass_policy_holder_contacts" -> empty("id" -> "string",
        "policy_holder_id" -> "string", "phone_number" -> "string",
        "email" -> "string", "po_box" -> "string", "address" -> "string"),
      "ass_policy_holder_addresses" -> empty("id" -> "string",
        "policy_holder_id" -> "string", "country" -> "string",
        "city" -> "string", "region" -> "string",
        "municipality" -> "string", "prefecture" -> "string",
        "district" -> "string", "physical_address" -> "string"),
      "ass_policy_holder_ancestors" -> empty("id" -> "string",
        "policy_holder_id" -> "string", "firstname" -> "string",
        "lastname" -> "string", "birth_date" -> "string",
        "birth_place" -> "string", "ancestor_tag" -> "string",
        "ancestor_condition" -> "string"),
      "ass_registrant_policy_holders" -> empty("id" -> "string",
        "start_date" -> "string", "end_date" -> "string",
        "registrant_id" -> "string", "policy_holder_id" -> "string")))
    val policyHolders = assuresOut("ass_policy_holders").cache()
    policyHolders.count()

    // ---- stage 3: conjoint ∥ enfants (import.sh:93-100) ----------------
    val runTs = "2026-08-12 00:00:00"
    val Seq(Seq(conj, enf)) = Orchestrator.runStages(Seq(Seq(
      () => MigrateConjoint.run(conjoints, assureConjoints, policyHolders,
        empty("policy_holder_id" -> "string", "policy_number" -> "string"),
        runTs),
      () => MigrateEnfants.run(enfants, policyHolders,
        empty("policy_holder_id" -> "string", "policy_number" -> "string"),
        runTs)))): @unchecked
    val conjR = conj.asInstanceOf[MigrateConjoint.Result]
    val enfR = enf.asInstanceOf[MigrateEnfants.Result]

    // ---- stage 4: users ------------------------------------------------
    val usersOut = MigrateUsers.run(users, policyHolders,
      empty("user_id" -> "int"),
      empty("user_id" -> "int", "policy_holder_id" -> "string"))

    // ---- referential integrity across the whole import -----------------
    assert(registrants.count() === 2)
    assert(policyHolders.count() === 2)
    // careers point at real registrants AND real policy holders
    val careers = assuresOut("ass_registrant_policy_holders")
    assert(careers.join(registrants.select(col("id").as("registrant_id")),
      Seq("registrant_id"), "left_anti").count() === 0)
    assert(careers.join(
      policyHolders.select(col("id").as("policy_holder_id")),
      Seq("policy_holder_id"), "left_anti").count() === 0)
    // spouse + child bounds resolve to policy holders
    assert(conjR.mariageBounds.join(
      policyHolders.select(col("id").as("policy_holder_id")),
      Seq("policy_holder_id"), "left_anti").count() === 0)
    assert(enfR.parentingBounds.join(
      policyHolders.select(col("id").as("policy_holder_id")),
      Seq("policy_holder_id"), "left_anti").count() === 0)
    // planted orphan surfaced exactly once
    assert(enfR.orphans.collect().map(_.getString(0)).toSeq === Seq("K2"))
    assert(conjR.orphans.count() === 0)
    // both users resolve and link
    assert(usersOut.orphans.count() === 0)
    assert(usersOut.links.count() === 2)
    assert(usersOut.userDetails.count() === 2) // both usernames are emails
  }
}
