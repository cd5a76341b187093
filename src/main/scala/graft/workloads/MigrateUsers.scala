package graft.workloads

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The user migration — `migrate_assure_users.php` — set-based (reference:
  * sdk/migrate_assure_users.php).
  *
  * Reference flow, per user row (filtered `WHERE type_partenaire = 2`,
  * :43-60): probe the user by id (:69-88), probe the policy holder by
  * `numero_assurance` → sin (:91-108), insert `auth_users` if absent
  * (:176-193), insert `auth_user_details` ONLY when the username validates
  * as an email (:195-203 — FILTER_VALIDATE_EMAIL), and link via
  * `ass_policy_holder_users` if absent (:222-228).
  *
  * Set form: one semi/anti join per probe, `rlike` for the email gate.
  */
object MigrateUsers {

  /** Close enough to PHP FILTER_VALIDATE_EMAIL for the engine's purposes:
    * local@domain.tld with no whitespace/extra @.
    */
  val EmailPattern = "^[^@\\s]+@[^@\\s]+\\.[A-Za-z]{2,}$"

  final case class Result(authUsers: DataFrame, userDetails: DataFrame,
                          links: DataFrame, orphans: DataFrame)

  def run(users: DataFrame, policyHolders: DataFrame,
          existingAuthUsers: DataFrame, existingLinks: DataFrame,
          partnerType: Int = 2): Result = {

    val filtered = users.filter(col("type_partenaire") === partnerType)

    // policy holder lookup (broadcast/hash join replaces per-row probes)
    val ph = policyHolders.select(col("sin"),
      col("id").as("policy_holder_id"))
    val withPh = filtered.join(ph,
      filtered("numero_assurance") === ph("sin"), "left")

    val orphans = withPh.filter(col("policy_holder_id").isNull)
      .select("id", "username", "numero_assurance")

    val resolved = withPh.filter(col("policy_holder_id").isNotNull)

    // insert-if-absent guard on user id
    val freshUsers = resolved.join(
      existingAuthUsers.select(col("user_id").as("id")), Seq("id"),
      "left_anti")

    val authUsers = freshUsers.select(
      col("id").as("user_id"),
      col("username").as("user_name"),
      col("password").as("user_password"),
      lit(0).as("lock_enabled"), lit(0).as("login_attempts"),
      lit(null).cast("string").as("lock_expired_at"),
      col("double_auth_active"), col("is_active"),
      lit(1).as("is_verified"))

    // details only for email-shaped usernames (the reference's
    // FILTER_VALIDATE_EMAIL gate)
    val userDetails = freshUsers
      .filter(col("username").rlike(EmailPattern))
      .select(col("id").as("user_id"),
        col("contact").as("phone_number"),
        col("username").as("email"))

    // link rows, insert-if-absent on (user_id, policy_holder_id)
    val links = resolved
      .select(col("id").as("user_id"), col("policy_holder_id"),
        lit(1).as("validated"))
      .join(existingLinks.select("user_id", "policy_holder_id"),
        Seq("user_id", "policy_holder_id"), "left_anti")

    Result(authUsers, userDetails, links, orphans)
  }
}
