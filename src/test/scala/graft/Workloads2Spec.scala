package graft

import graft.workloads.{MigrateEmployeur, MigrateEnfants}

class MigrateEmployeurSpec extends SparkSpec {
  import spark.implicits._

  test("anti-join skip + TEL address split with edge semantics") {
    val employeurs = Seq(
      ("E1", "Acme SARL", "Rue 1", "BP99TEL22901122"),
      ("E2", "Beta SA", "Rue 2", "no-marker-here"),
      ("E3", "Gamma SA", "Rue 3", "TEL22903344") // marker at position 0
    ).toDF("numero_employeur", "raison_sociale", "adresse", "address")
    val existing = Seq("E2").toDF("sin")

    val out = MigrateEmployeur.run(employeurs, existing)
    val regs = out.registrants.orderBy("id").collect()
    assert(regs.map(_.getString(0)).toSeq === Seq("E1", "E3")) // E2 skipped
    assert(regs.head.getString(2) === "Acme SARL")

    val contacts = out.contacts.orderBy("registrant_id").collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(5))).toSeq
    // E1: split around TEL; E3: marker at pos 0 → po_box "" (strpos edge)
    assert(contacts === Seq(
      ("E1", "22901122", "BP99"),
      ("E3", "22903344", "")))
  }
}

class MigrateEnfantsSpec extends SparkSpec {
  import spark.implicits._

  test("orphans, skip-if-exists, person+bound fan-out") {
    val enfants = Seq(
      ("K1", "A1", "Abla", "Doe", "F", "2012-01-01", "alive"),
      ("K2", "A9", "Kojo", "Doe", "M", "2014-02-02", "alive"),
      ("K3", "A1", "Sena", "Doe", "F", "2016-03-03", "alive")
    ).toDF("numero_enfant", "numero_assure", "prenoms", "nom", "sexe",
      "date_naissance", "etat_enfant")
    val ph = Seq(("PH1", "A1")).toDF("id", "sin")
    val existing = Seq(("PH1", "K3")).toDF("policy_holder_id", "policy_number")

    val out = MigrateEnfants.run(enfants, ph, existing,
      runTs = "2026-08-12 00:00:00")
    assert(out.orphans.collect().map(_.getString(0)).toSeq === Seq("K2"))
    val persons = out.persons.collect()
    assert(persons.map(_.getString(1)).toSeq === Seq("Abla")) // K3 exists
    val bounds = out.parentingBounds.collect()
    assert(bounds.length === 1)
    assert(bounds.head.getAs[String]("descendant_state_id") === "alive")
    assert(bounds.head.getAs[String]("person_id") ===
      persons.head.getAs[String]("id"))
  }
}
