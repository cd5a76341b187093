package graft

import org.apache.spark.sql.functions._
import graft.workloads.{MigrateConjoint, MigrateEmployeurUsers, MigrateUsers}

class MigrateConjointSpec extends SparkSpec {
  import spark.implicits._

  test("join + orphan detection + skip-if-exists + NOW() fan-out") {
    val conjoints = Seq(
      ("C1", "Ama", "Sede", "F", "1992-03-03", "married"),
      ("C2", "Efe", "Kond", "F", "1993-04-04", "married"),
      ("C3", "Yao", "Tano", "M", "1991-05-05", "married")
    ).toDF("numero_conjoint", "prenoms", "nom", "sexe", "date_naissance",
      "etat_conjoint")
    val links = Seq(
      ("C1", "A1", "2015-06-06", "civil"),
      ("C2", "A2", "2016-07-07", "civil"), // A2 has no policy holder → orphan
      ("C3", "A1", "2017-08-08", "civil")
    ).toDF("numero_conjoint", "numero_assure", "date_lien", "type_lien")
    val ph = Seq(("PH1", "A1")).toDF("id", "sin")
    val existing = Seq(("PH1", "C3")) // C3's bound already present → skipped
      .toDF("policy_holder_id", "policy_number")

    val out = MigrateConjoint.run(conjoints, links, ph, existing,
      runTs = "2026-08-12 00:00:00")

    assert(out.orphans.collect().map(_.getString(0)).toSeq === Seq("C2"))
    val persons = out.persons.collect()
    assert(persons.length === 1) // only C1: C2 orphan, C3 exists
    assert(persons.head.getAs[String]("created_at") === "2026-08-12 00:00:00")
    val bounds = out.mariageBounds.collect()
    assert(bounds.length === 1)
    assert(bounds.head.getAs[String]("policy_number") === "C1")
    // shared surrogate id links person ↔ bound
    assert(bounds.head.getAs[String]("person_id") ===
      persons.head.getAs[String]("id"))
  }
}

class MigrateEmployeurUsersSpec extends SparkSpec {
  import spark.implicits._

  test("employeur variant: contact gate, link independent of auth insert") {
    val users = Seq(
      (1, "a@x.tg", "pw1", Option("S1"), 0, 1, Option("991"), 1),
      (2, "not-an-email", "pw2", Option("S1"), 0, 1, Option("992"), 1),
      (3, "c@x.gh", "pw3", None: Option[String], 0, 1, Option("993"), 1),
      (4, "d@x.tg", "pw4", Option("S9"), 0, 1, Option("994"), 1), // sin unresolved
      (5, "e@x.tg", "pw5", Option("S1"), 0, 1, None: Option[String], 1),
      (6, "f@x.tg", "pw6", Option("S1"), 0, 1, Option("996"), 2), // wrong type
      (7, "g@x.tg", "pw7", Option("S1"), 0, 1, Option("997"), 1), // auth exists
      (8, "h@x.tg", "pw8", Option("S1"), 0, 1, Option("998"), 1)  // link exists
    ).toDF("id", "username", "password", "numero_assurance",
      "double_auth_active", "is_active", "contact", "type_partenaire")
    val registrants = Seq(("R1", "S1")).toDF("id", "sin")
    val existingAuth = Seq(7).toDF("user_id")
    val existingLinks = Seq(8).toDF("user_id")

    val out = MigrateEmployeurUsers.run(users, registrants, existingAuth,
      existingLinks)

    // auth: 6 filtered by partner type, 7 already present
    assert(out.authUsers.collect().map(_.getInt(0)).sorted.toSeq ===
      Seq(1, 2, 3, 4, 5, 8))
    // unlike the assure variant, login_attempts is NULL (reference :185)
    assert(out.authUsers.collect().forall(_.isNullAt(
      out.authUsers.columns.indexOf("login_attempts"))))
    // details need email shape AND a present contact: drops 2 (not an
    // email) and 5 (null contact)
    assert(out.userDetails.collect().map(_.getInt(0)).sorted.toSeq ===
      Seq(1, 3, 4, 8))
    // links are guarded on user_id alone and run even when the auth row
    // already existed (7 links; 8 skipped; 4's sin never resolves)
    assert(out.links.collect().map(_.getInt(0)).sorted.toSeq ===
      Seq(1, 2, 5, 7))
    assert(out.links.collect().forall(
      _.getAs[String]("registrant_id") === "R1"))
    // only a NULL sin is surfaced; an unresolved sin (4) drops silently
    assert(out.missingSin.collect().map(_.getInt(0)).toSeq === Seq(3))
  }
}

class MigrateUsersSpec extends SparkSpec {
  import spark.implicits._

  test("partner filter, email gate, insert-if-absent, link dedup") {
    val users = Seq(
      (1, "awa@x.tg", "pw1", "A1", 0, 1, "991", 2),
      (2, "not-an-email", "pw2", "A1", 0, 1, "992", 2),
      (3, "kofi@x.gh", "pw3", "A9", 0, 1, "993", 2), // orphan sin
      (4, "emp@x.tg", "pw4", "A1", 0, 1, "994", 1),  // wrong partner type
      (5, "dup@x.tg", "pw5", "A1", 0, 1, "995", 2)   // already in auth_users
    ).toDF("id", "username", "password", "numero_assurance",
      "double_auth_active", "is_active", "contact", "type_partenaire")
    val ph = Seq(("PH1", "A1")).toDF("id", "sin")
    val existingAuth = Seq(5).toDF("user_id")
    val existingLinks = Seq((5, "PH1")).toDF("user_id", "policy_holder_id")

    val out = MigrateUsers.run(users, ph, existingAuth, existingLinks)

    assert(out.orphans.collect().map(_.getInt(0)).toSeq === Seq(3))
    assert(out.authUsers.collect().map(_.getInt(0)).sorted.toSeq ===
      Seq(1, 2)) // 3 orphan, 4 filtered, 5 exists
    // details only for the email-shaped username
    assert(out.userDetails.collect().map(_.getInt(0)).toSeq === Seq(1))
    // links for all resolved, minus the pre-existing pair
    assert(out.links.collect().map(_.getInt(0)).sorted.toSeq === Seq(1, 2))
  }
}
