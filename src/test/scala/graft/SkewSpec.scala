package graft

import graft.ops.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join on a skewed key") {
    // 90% of rows share one hot key
    val big = (1 to 1000).map(i => (if (i <= 900) "hot" else s"k$i", i))
      .toDF("k", "v")
    val small = Seq(("hot", "H"), ("k901", "A"), ("k999", "B"))
      .toDF("k", "tag")
    val plain = big.join(small, Seq("k")).select("k", "v", "tag")
    val salted = Skew.saltedJoin(big, small, "k", salt = 8)
      .select("k", "v", "tag")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salted distinct count equals plain countDistinct") {
    val df = (1 to 500).map(i => ("hot", s"v${i % 37}")) ++
      (1 to 10).map(i => (s"k$i", s"v$i"))
    val data = df.toDF("k", "v")
    val plain = data.groupBy("k")
      .agg(org.apache.spark.sql.functions.countDistinct("v").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCountDistinct(data, "k", "v", salt = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
    assert(salted("hot") === 37L)
  }
}
