package graft.workloads

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The employer-user migration — `migrate_employeur_users.php` — set-based
  * (reference: sdk/migrate_employeur_users.php).
  *
  * Reference flow, per user row (filtered `WHERE type_partenaire = 1`,
  * :42-60): probe `auth_users` by id and insert if absent (:179-196 —
  * `login_attempts` is NULL here, unlike the assure variant's 0), insert
  * `auth_user_details` only when the username validates as an email AND a
  * contact is present (:199-208), then — INDEPENDENTLY of the auth-insert
  * outcome — probe `ass_registrant_users` by user_id alone (:212-219,
  * `continue` if present), look up the registrant by
  * `numero_assurance` → sin (:222-224) and insert the link with
  * `validated = 1` (:225-231). Users without a `numero_assurance` are
  * reported and skipped (:233-235).
  *
  * Differences vs [[MigrateUsers]] (the assure variant) that this port
  * preserves: the link guard is on user_id ALONE (not the pair), auth
  * inserts do NOT require the registrant to resolve, and unresolved sins
  * are silently dropped while missing sins are surfaced.
  *
  * Set form: one anti join per insert-if-absent probe, one broadcast-able
  * inner join for the registrant lookup, `rlike` for the email gate. Each
  * per-row `SELECT ... LIMIT 1` probe in the reference is an N+1 round
  * trip; here each becomes a single hash/broadcast join.
  */
object MigrateEmployeurUsers {

  final case class Result(authUsers: DataFrame, userDetails: DataFrame,
                          links: DataFrame, missingSin: DataFrame)

  def run(users: DataFrame, registrants: DataFrame,
          existingAuthUsers: DataFrame, existingRegistrantUsers: DataFrame,
          partnerType: Int = 1): Result = {

    val filtered = users.filter(col("type_partenaire") === partnerType)

    // insert-if-absent guard on user id (reference :180 select_user)
    val freshUsers = filtered.join(
      existingAuthUsers.select(col("user_id").as("id")), Seq("id"),
      "left_anti")

    val authUsers = freshUsers.select(
      col("id").as("user_id"),
      col("username").as("user_name"),
      col("password").as("user_password"),
      lit(0).as("lock_enabled"),
      lit(null).cast("int").as("login_attempts"),
      lit(null).cast("string").as("lock_expired_at"),
      col("double_auth_active"), col("is_active"),
      lit(1).as("is_verified"))

    // details need BOTH an email-shaped username and a present contact
    // (reference :199 — FILTER_VALIDATE_EMAIL && isset(contact))
    val userDetails = freshUsers
      .filter(col("username").rlike(MigrateUsers.EmailPattern) &&
        col("contact").isNotNull)
      .select(col("id").as("user_id"),
        col("contact").as("phone_number"),
        col("username").as("email"))

    // link candidates: guard on user_id alone, independent of the auth
    // insert (reference :212 get_registrant_user → continue)
    val candidates = filtered.join(
      existingRegistrantUsers.select(col("user_id").as("id")), Seq("id"),
      "left_anti")

    val missingSin = candidates.filter(col("numero_assurance").isNull)
      .select("id", "username")

    val reg = registrants.select(col("sin"), col("id").as("registrant_id"))
    val links = candidates.filter(col("numero_assurance").isNotNull)
      .join(reg, candidates("numero_assurance") === reg("sin"))
      .select(col("id").as("user_id"), col("registrant_id"),
        lit(1).as("validated"))

    Result(authUsers, userDetails, links, missingSin)
  }
}
