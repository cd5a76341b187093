import org.apache.spark.sql.SparkSession

/** Dev utility: time queries against a data dir (first arg). */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.head
    for (name <- args.tail) {
      // warm-up then steady-state, mirroring Bench
      try {
        graft.SparkEntry.queries(name)(spark, dir).count()
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(name)(spark, dir).count()
        println(f"TIMING $name ${(System.nanoTime()-t0)/1e9}%.2f s  rows=$n")
      } catch { case e: Throwable =>
        println(s"TIMING $name FAILED ${e.getMessage.take(100)}") }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
