package graft

import java.nio.file.Files

/** Progress/rate surface — the reference's sliding-window estimator formula
  * (sdk/lib/progress.php:437-446) and the task-level write reporter.
  */
class ProgressSpec extends SparkSpec {
  import spark.implicits._

  test("estimate window reproduces the reference's ETA formula") {
    val w = new Progress.EstimateWindow(target = 200, numDatapoints = 5)
    assert(w.etaSeconds === 0.0) // < 2 points
    w.add(0, 0.0)
    w.add(100, 2.0)
    // (target - last)/(last - first) * (t_last - t_first) = 100/100*2
    assert(w.etaSeconds === 2.0)
    assert(w.ratePerSec === 50.0)
    // window slides: only the last 5 points participate
    for (i <- 1 to 10) w.add(100 + i * 10, 2.0 + i)
    // window now [(8.0,160) .. (12.0,200)]: eta (200-200)/(200-160)*4 = 0
    assert(w.etaSeconds === 0.0)
    assert(w.ratePerSec === 10.0)
  }

  test("reporter observes rows written by a real parquet write") {
    val out = Files.createTempDirectory("graft_progress").toString + "/t"
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val rep = Progress.attach(spark, "spec", target = 1000,
      minDrawIntervalMs = 0, out = s => lines.add(s))
    try {
      spark.range(1000).select($"id").write.parquet(out)
      // listener delivery is async; poll briefly
      val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
      while (rep.total < 1000 && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(rep.total === 1000L)
      assert(!lines.isEmpty)
      assert(lines.peek().startsWith("[graft] spec:"))
    } finally rep.close()
  }
}
