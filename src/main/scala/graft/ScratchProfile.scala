package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiling harness — NOT part of the driver contract; deleted
  * before round end. Times sub-stages of hot queries.
  */
object ScratchProfile {
  def time[T](label: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    println(f"[prof] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val what = if (args.nonEmpty) args(0) else "g17"
    what match {
      case "g17" => profG17(spark, dir)
      case "g17plan" => planG17(spark, dir)
      case "g17inc" => profG17Inc(spark, dir)
      case "c16" => profC16(spark, dir)
      case _ => sys.error(s"unknown: $what")
    }
    spark.stop()
  }

  /** c16 stage decomposition: near-dup pairs, CC, scoring, final aggs. */
  def profC16(spark: SparkSession, dir: String): Unit = {
    import graft.ops.{MinHashDedup, TextAnalysis}
    for (pass <- 1 to 2) {
      println(s"--- pass $pass ---")
      spark.catalog.clearCache(); System.gc()
      val docs = Tables.load(spark, dir, "documents")
        .filter(col("text").isNotNull)
      val pairs = MinHashDedup.nearDuplicates(docs, "doc_id", "text",
        k = 3, m = 16, nBands = 4, threshold = 0.5)
      time("pairs noop") {
        pairs.write.format("noop").mode("overwrite").save()
      }
      val cc = time("cc run (eager rounds)") {
        graft.ops.ConnectedComponents.run(pairs, "id_a", "id_b")
      }
      time("cc noop") { cc.write.format("noop").mode("overwrite").save() }
      val scored = docs.select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("q"))
      val members = scored.join(
        cc.select(col("id").as("doc_id"), col("cluster_id")), "doc_id")
      val best = members.groupBy("cluster_id")
        .agg(count(lit(1)).as("n_members"), max(col("q")).as("best_q"))
      val out = members.join(best, "cluster_id")
        .filter(col("q") === col("best_q"))
        .groupBy("cluster_id", "n_members", "best_q")
        .agg(min(col("doc_id")).as("canonical_id"))
        .orderBy("cluster_id")
      time("final (scored+joins+aggs) count") { out.count() }
    }
  }

  /** Decompose the incidence build: oriented sever, wedge join, closing
    * join, explode, final sever — each via noop (guide §1.4).
    */
  def profG17Inc(spark: SparkSession, dir: String): Unit = {
    val op = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val a = op.select(col("ok"), col("pk").as("part_a"))
    val b = op.select(col("ok").as("ok_b"), col("pk").as("part_b"))
    val edges = a.join(b,
        col("ok") === col("ok_b") && col("part_a") < col("part_b"))
      .select("part_a", "part_b").distinct()
    for (pass <- 1 to 2) {
      println(s"--- pass $pass ---")
      spark.catalog.clearCache(); System.gc()
      val und = time("und sever") {
        graft.Checkpoints.sever(edges
          .select(least(col("part_a"), col("part_b")).as("a"),
            greatest(col("part_a"), col("part_b")).as("b"))
          .filter(col("a") =!= col("b")).distinct())
      }
      // mirror orientEdges(preNormalized = true) inline so each stage
      // can be timed separately
      val deg = und.select(col("a").as("v"))
        .union(und.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("d"))
      val inRange = (c: Column) => when(c >= 0L && c < 2147483648L, c)
        .otherwise(raise_error(lit("bad id")))
      val ranked = und
        .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
        .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
        .select(col("a"), col("b"),
          (col("da") * 2147483648L + inRange(col("a"))).as("ra"),
          (col("db") * 2147483648L + inRange(col("b"))).as("rb"))
      val oriented = time("oriented sever") {
        graft.Checkpoints.sever(ranked.select(
          when(col("ra") < col("rb"), col("a")).otherwise(col("b")).as("u"),
          when(col("ra") < col("rb"), col("b")).otherwise(col("a")).as("w"),
          greatest(col("ra"), col("rb")).as("rw")))
      }
      val w1 = oriented.select(col("u"), col("w").as("v1"), col("rw").as("r1"))
      val w2 = oriented.select(col("u"), col("w").as("v2"), col("rw").as("r2"))
      val wedges = w1.join(w2, Seq("u")).filter(col("r1") < col("r2"))
        .select(col("u"), col("v1"), col("v2"))
      time("wedges noop") {
        wedges.write.format("noop").mode("overwrite").save()
      }
      println(s"  |wedges| = ${wedges.count()}")
      val tri = wedges
        .join(oriented.select(col("u").as("v1"), col("w").as("v2")),
          Seq("v1", "v2"))
        .select(col("u"), col("v1"), col("v2"))
      time("tri (closing join) noop") {
        tri.write.format("noop").mode("overwrite").save()
      }
      val triSh = wedges
        .join(oriented.select(col("u").as("v1"), col("w").as("v2"))
          .hint("shuffle_hash"), Seq("v1", "v2"))
        .select(col("u"), col("v1"), col("v2"))
      time("tri SHUFFLE_HASH noop") {
        triSh.write.format("noop").mode("overwrite").save()
      }
      val edgeS = (x: Column, y: Column) =>
        struct(least(x, y).as("a"), greatest(x, y).as("b"))
      val inc0 = tri.select(col("u").as("tu"), col("v1").as("tv1"),
          col("v2").as("tv2"),
          explode(array(
            edgeS(col("u"), col("v1")),
            edgeS(col("u"), col("v2")),
            edgeS(col("v1"), col("v2")))).as("e"))
        .select(col("tu"), col("tv1"), col("tv2"),
          col("e.a").as("a"), col("e.b").as("b"))
      time("inc explode noop") {
        inc0.write.format("noop").mode("overwrite").save()
      }
      val inc = time("inc sever") { graft.Checkpoints.sever(inc0) }
      println(s"  |inc| = ${inc.count()}")
    }
  }

  /** Executed (post-AQE) plans of g17's two dominant stages. */
  def planG17(spark: SparkSession, dir: String): Unit = {
    val op = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val a = op.select(col("ok"), col("pk").as("part_a"))
    val b = op.select(col("ok").as("ok_b"), col("pk").as("part_b"))
    val edges = a.join(b,
        col("ok") === col("ok_b") && col("part_a") < col("part_b"))
      .select("part_a", "part_b").distinct()
    val undPlan = edges
      .select(least(col("part_a"), col("part_b")).as("a"),
        greatest(col("part_a"), col("part_b")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    undPlan.write.format("noop").mode("overwrite").save()
    println("=== und executed plan ===")
    println(undPlan.queryExecution.executedPlan.toString.take(8000))
    val und = graft.Checkpoints.sever(undPlan)
    // mirrors kTruss's r14 round state: severed TRIANGLE set (not the
    // exploded incidence), per-round explode for support, 3 semi joins
    // for maintenance
    val inc0 = graft.ops.Graph.triangleIncidence(und)
    inc0.write.format("noop").mode("overwrite").save()
    println("=== incidence (support input) executed plan ===")
    println(inc0.queryExecution.executedPlan.toString.take(12000))
    val tri = graft.Checkpoints.sever(inc0.select("tu", "tv1", "tv2").distinct())
    val edgeS = (x: Column, y: Column) =>
      struct(least(x, y).as("a"), greatest(x, y).as("b"))
    val keep = graft.Checkpoints.sever(
      tri.select(explode(array(
          edgeS(col("tu"), col("tv1")),
          edgeS(col("tu"), col("tv2")),
          edgeS(col("tv1"), col("tv2")))).as("edge"))
        .groupBy(col("edge.a").as("a"), col("edge.b").as("b"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= 4).select("a", "b"))
    def alive(df: DataFrame, x: String, y: String): DataFrame = {
      val kk = keep.select(col("a").as("__ka"), col("b").as("__kb"))
      df.join(kk,
        least(col(x), col(y)) === col("__ka") &&
          greatest(col(x), col(y)) === col("__kb"), "left_semi")
    }
    val maint = alive(alive(alive(tri, "tu", "tv1"), "tu", "tv2"),
      "tv1", "tv2")
    maint.write.format("noop").mode("overwrite").save()
    println("=== maintenance executed plan (3 semi joins on triangles) ===")
    println(maint.queryExecution.executedPlan.toString.take(12000))
  }

  /** g17 stage decomposition, mirroring Graph.kTruss's internals. */
  def profG17(spark: SparkSession, dir: String): Unit = {
    def edgesDf = {
      val op = Tables.load(spark, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val a = op.select(col("ok"), col("pk").as("part_a"))
      val b = op.select(col("ok").as("ok_b"), col("pk").as("part_b"))
      a.join(b, col("ok") === col("ok_b") && col("part_a") < col("part_b"))
        .select("part_a", "part_b").distinct()
    }
    for (pass <- 1 to 2) {
      println(s"--- pass $pass ---")
      spark.catalog.clearCache(); System.gc()
      val und = time("und: edges->normalized distinct sever") {
        graft.Checkpoints.sever(edgesDf
          .select(least(col("part_a"), col("part_b")).as("a"),
            greatest(col("part_a"), col("part_b")).as("b"))
          .filter(col("a") =!= col("b")).distinct())
      }
      println(s"  |und| = ${und.count()}")
      val inc = time("inc: triangleIncidence sever") {
        graft.Checkpoints.sever(graft.ops.Graph.triangleIncidence(und))
      }
      println(s"  |inc| = ${inc.count()}")
      val k = 6
      var curUnd = und
      var curInc = inc
      for (r <- 1 to 2) {
        val keep = time(s"round $r keep (support agg)") {
          graft.Checkpoints.sever(
            curInc.groupBy("a", "b").agg(count(lit(1)).as("support"))
              .filter(col("support") >= k - 2).select("a", "b"))
        }
        if (r < 2) {
          val newInc = time(s"round $r incidence maintenance") {
            val removed = curUnd.join(keep, Seq("a", "b"), "left_anti")
            val destroyed = curInc
              .join(removed, Seq("a", "b"), "left_semi")
              .select("tu", "tv1", "tv2").distinct()
            graft.Checkpoints.sever(
              curInc.join(destroyed, Seq("tu", "tv1", "tv2"), "left_anti"))
          }
          curInc = newInc
        }
        curUnd = keep
      }
      time("final count") { println(s"  result = ${curUnd.count()}") }
    }
  }
}
