package graft

import graft.etl.Upsert

/** MERGE semantics: matched rows replaced, unmatched dest kept, new source
  * rows inserted (reference: sdk/migrate_assures.php:185-203, 239-352).
  */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  test("upsert updates matched, keeps unmatched, inserts new") {
    val dst = Seq((1, "old1"), (2, "old2")).toDF("k", "v")
    val src = Seq((2, "new2"), (3, "new3")).toDF("k", "v")
    val out = Upsert(src, dst, Seq("k")).orderBy("k")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(out.toSeq === Seq((1, "old1"), (2, "new2"), (3, "new3")))
  }

  test("duplicate source keys: first by order column wins") {
    val dst = Seq((1, "old")).toDF("k", "v")
    val src = Seq((1, "b", 2), (1, "a", 1)).toDF("k", "v", "ord")
    val out = Upsert(src.select("k", "v"), dst, Seq("k")).collect()
    assert(out.length === 1)
    // dropDuplicates is arbitrary; with explicit order column it's exact
    val out2 = Upsert(src, dst.selectExpr("k", "v", "0 as ord"),
      Seq("k"), orderCol = Some("ord")).collect()
    assert(out2.length === 1)
    assert(out2.head.getString(1) === "a")
  }

  test("replaceChildren: recomputed parents overwrite, others kept") {
    val dst = Seq((1, "a"), (1, "b"), (2, "c")).toDF("parent", "child")
    val recomputed = Seq((1, "x")).toDF("parent", "child")
    val out = Upsert.replaceChildren(dst, recomputed, Seq("parent"))
      .orderBy("parent", "child")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(out.toSeq === Seq((1, "x"), (2, "c")))
  }
}
