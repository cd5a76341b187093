package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.workloads.MigrateAssures

/** End-to-end replay of the flagship migrate_assures workload on synthetic
  * CNSS-shaped fixtures (FIXTURES.md schemas): counts, linkage integrity
  * (orphans = 0), update-vs-insert branching, and idempotence (second run
  * changes nothing) — the operational checks the reference relied on
  * (SURVEY.md §5).
  */
class MigrateAssuresSpec extends SparkSpec {
  import spark.implicits._

  private def emptyDest: Map[String, DataFrame] = Map(
    "ass_persons" -> Seq.empty[(String, String, String, String, String,
      String, String, String, String, String)].toDF(
      "id", "firstname", "lastname", "sex", "birth_date", "birth_place",
      "birth_country", "nationality", "marital_status_id", "civil_state_id"),
    "ass_policy_holders" -> Seq.empty[(String, String, String, String,
      String, Int, String)].toDF("id", "sin", "person_id",
      "policy_holder_type_id", "enrolled_at", "handicaped", "status"),
    "ass_policy_holder_contacts" -> Seq.empty[(String, String, String,
      String, String, String)].toDF("id", "policy_holder_id",
      "phone_number", "email", "po_box", "address"),
    "ass_policy_holder_addresses" -> Seq.empty[(String, String, String,
      String, String, String, String, String, String)].toDF("id",
      "policy_holder_id", "country", "city", "region", "municipality",
      "prefecture", "district", "physical_address"),
    "ass_policy_holder_ancestors" -> Seq.empty[(String, String, String,
      String, String, String, String, String)].toDF("id",
      "policy_holder_id", "firstname", "lastname", "birth_date",
      "birth_place", "ancestor_tag", "ancestor_condition"),
    "ass_registrant_policy_holders" -> Seq.empty[(String, String, String,
      String, String)].toDF("id", "start_date", "end_date",
      "registrant_id", "policy_holder_id"))

  private val assureCols = Seq("numero_assure", "prenoms", "nom", "sexe",
    "date_naissance", "lieu_naissance", "code_pays_nais",
    "code_pays_nationalite", "code_site_matri_actuel", "code_civilite",
    "type_assure", "date_immatriculation", "code_etat_handicap",
    "etat_assure", "tel", "email", "bp_ville", "adresse", "rue",
    "code_pays_adr", "code_ville", "code_region", "code_commune",
    "code_prefecture", "code_quartier_unique", "prenom_pere", "nom_pere",
    "date_nais_pere", "lieu_nais_pere", "etat_pere", "prenom_mere",
    "nom_mere", "date_nais_mere", "lieu_nais_mere", "etat_mere")

  private def fixtureAssures: DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val rows = Seq(
      Seq("A1", "Awa", "Diallo", "F", "1990-01-01", "Lome", "TG", "TG",
        "M1", "C1", "1", "2020-01-01", "O", "ACTIVE", "22890011",
        "awa@x.tg", "BP12", "Rue 5", null, "TG", "LFW", "R1", "CM1", "P1",
        "Q1", "Pa", "Pb", "1960-01-01", "Kara", "alive", "Ma", "Mb",
        "1962-02-02", "Kara", "alive"),
      Seq("A2", "Kofi", "Mensah", "M", "1985-05-05", "Accra", "GH", "GH",
        "M2", "C2", "2", "2019-06-01", "N", "ACTIVE", "22890022",
        "kofi@x.gh", "BP34", null, "Rue 9", "GH", "ACC", "R2", "CM2", "P2",
        "Q2", "Pc", "Pd", "1955-03-03", "Kumasi", "dead", "Mc", "Md",
        "1958-04-04", "Kumasi", "alive"))
    val schema = StructType(assureCols.map(StructField(_, StringType, true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row.fromSeq)), schema)
  }

  private def fixtureCarriere: DataFrame = Seq(
    ("A1", "E1", "2020-01-01", null.asInstanceOf[String]),
    ("A1", "E2", "2015-01-01", "2019-12-31"),
    ("A2", "E1", "2019-06-01", null.asInstanceOf[String])
  ).toDF("numero_assure", "numero_employeur", "date_entree", "date_sortie")

  test("fresh migration fans out all destination tables with linked ids") {
    val out = MigrateAssures.run(fixtureAssures, fixtureCarriere, emptyDest)
    val ph = out("ass_policy_holders").cache()
    assert(ph.count() === 2)
    assert(out("ass_persons").count() === 2)
    assert(out("ass_policy_holder_contacts").count() === 2)
    assert(out("ass_policy_holder_addresses").count() === 2)
    assert(out("ass_policy_holder_ancestors").count() === 4) // p + m each
    assert(out("ass_registrant_policy_holders").count() === 3)

    // handicap flag derivation ('O' → 1)
    val flags = ph.select("sin", "handicaped").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(flags === Map("A1" -> 1, "A2" -> 0))

    // linkage: every fan-out row points at an existing policy holder
    val phIds = ph.select(col("id").as("policy_holder_id"))
    for (t <- Seq("ass_policy_holder_contacts", "ass_policy_holder_addresses",
      "ass_policy_holder_ancestors", "ass_registrant_policy_holders")) {
      val orphans = out(t).join(phIds, Seq("policy_holder_id"), "left_anti")
      withClue(s"$t orphans:") { assert(orphans.count() === 0) }
    }
    // person linkage
    val personIds = out("ass_persons").select(col("id").as("person_id"))
    assert(ph.join(personIds, Seq("person_id"), "left_anti").count() === 0)
    // address coalesce: A1 adresse, A2 falls back to rue
    val addr = out("ass_policy_holder_addresses")
      .join(ph.select(col("id").as("policy_holder_id"), col("sin")),
        "policy_holder_id")
      .select("sin", "physical_address").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(addr === Map("A1" -> "Rue 5", "A2" -> "Rue 9"))
  }

  test("second run updates in place: no new rows, update branch applied") {
    // materialize first-run state (uuid() is nondeterministic — freeze it)
    val first = MigrateAssures.run(fixtureAssures, fixtureCarriere, emptyDest)
      .map { case (k, v) => k -> v.cache() }
    first.values.foreach(_.count())

    val changed = fixtureAssures
      .withColumn("etat_assure",
        when(col("numero_assure") === "A1", "SUSPENDED")
          .otherwise(col("etat_assure")))
    val second = MigrateAssures.run(changed, fixtureCarriere, first)

    // no inserts: same cardinalities everywhere
    for ((t, df) <- second) {
      withClue(s"$t count:") { assert(df.count() === first(t).count()) }
    }
    // update branch applied
    val status = second("ass_policy_holders").select("sin", "status")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(status === Map("A1" -> "SUSPENDED", "A2" -> "ACTIVE"))
    // surrogate ids stable across the update (no re-keying)
    val ids1 = first("ass_policy_holders").select("sin", "id").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val ids2 = second("ass_policy_holders").select("sin", "id").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(ids1 === ids2)
  }

  test("current-employment upsert: matching career row updated, " +
    "missing pair inserted, unset fields skip the branch") {
    // A1's current employer E1 matches a career row → that row flips to
    // start=date_embauche/end=NULL; A2's current employer E9 has no career
    // row → fresh insert; A1's E2 row is untouched.
    val withCurrent = fixtureAssures
      .withColumn("date_embauche",
        when(col("numero_assure") === "A1", "2021-03-01")
          .otherwise("2020-07-01"))
      .withColumn("numero_employeur_actuel",
        when(col("numero_assure") === "A1", "E1").otherwise("E9"))
    val out = MigrateAssures.run(withCurrent, fixtureCarriere, emptyDest)
    val careers = out("ass_registrant_policy_holders")
      .join(out("ass_policy_holders")
        .select(col("id").as("policy_holder_id"), col("sin")),
        "policy_holder_id")
      .select("sin", "registrant_id", "start_date", "end_date").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getString(2), r.getString(3))).toMap
    assert(careers.size === 4) // 3 career rows + A2's inserted current pair
    assert(careers(("A1", "E1")) === ("2021-03-01", null)) // updated
    assert(careers(("A1", "E2")) === ("2015-01-01", "2019-12-31")) // kept
    assert(careers(("A2", "E1")) === ("2019-06-01", null)) // kept
    assert(careers(("A2", "E9")) === ("2020-07-01", null)) // inserted

    // null-valued fields skip the branch (reference isset() guard)
    val unset = fixtureAssures
      .withColumn("date_embauche", lit(null).cast("string"))
      .withColumn("numero_employeur_actuel", lit(null).cast("string"))
    val outUnset = MigrateAssures.run(unset, fixtureCarriere, emptyDest)
    assert(outUnset("ass_registrant_policy_holders").count() === 3)
  }
}
