package graft

import org.apache.spark.sql.functions._
import graft.etl.Quarantine

class QuarantineSpec extends SparkSpec {
  import spark.implicits._

  test("splits by named rules; reasons collected; nulls fail validation") {
    val df = Seq(
      (1, "a@x.tg", 10.0),
      (2, "bad-email", 20.0),
      (3, "c@x.tg", -5.0),
      (4, null.asInstanceOf[String], -1.0)
    ).toDF("id", "email", "amount")

    val (valid, bad) = Quarantine.split(df, Seq(
      "email_format" -> $"email".rlike("^[^@]+@[^@]+$"),
      "amount_positive" -> ($"amount" > 0)))

    assert(valid.collect().map(_.getInt(0)).toSeq === Seq(1))
    val reasons = bad.collect()
      .map(r => r.getInt(0) -> r.getSeq[String](3).sorted).toMap
    assert(reasons === Map(
      2 -> Seq("email_format"),
      3 -> Seq("amount_positive"),
      4 -> Seq("amount_positive", "email_format")))
    // partition property: valid ∪ bad = input
    assert(valid.count() + bad.count() === df.count())
  }
}
