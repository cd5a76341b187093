package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Console progress/rate reporting — the engine's analogue of the
  * reference's progress bar (reference: sdk/lib/progress.php:296-318
  * display/update throttled by `min_draw_interval`, :424-446 sliding
  * datapoint window + ETA; the migrate programs printed per-table counts
  * before each run, e.g. sdk/migrate_assures.php:404-406).
  *
  * Spark's unit of observable progress is the TASK, not the row: a
  * [[Progress.Reporter]] listens for finished write tasks and folds their
  * `outputMetrics.recordsWritten` into the same sliding-window estimator
  * the reference used, printing throttled `rows/target (rate, eta)` lines.
  * Attach one per sequential stage — listeners observe the whole session,
  * so concurrent flows within a stage report as one aggregate.
  */
object Progress {

  /** Sliding-window rate estimator with the reference's exact ETA formula
    * (progress.php:437-446): keep the last `numDatapoints` (time, value)
    * points; ETA = (target − v_last) / (v_last − v_first) × (t_last −
    * t_first); fewer than two points → 0.
    */
  final class EstimateWindow(target: Long, numDatapoints: Int = 5) {
    private var points = Vector.empty[(Double, Long)]

    def add(value: Long, timeSec: Double): Unit = synchronized {
      points = (points :+ (timeSec -> value)).takeRight(numDatapoints)
    }

    def etaSeconds: Double = synchronized {
      if (points.size < 2) 0.0
      else {
        val (t0, v0) = points.head
        val (t1, v1) = points.last
        if (v1 == v0) 0.0
        else (target - v1).toDouble / (v1 - v0).toDouble * (t1 - t0)
      }
    }

    def ratePerSec: Double = synchronized {
      if (points.size < 2) 0.0
      else {
        val (t0, v0) = points.head
        val (t1, v1) = points.last
        if (t1 == t0) 0.0 else (v1 - v0).toDouble / (t1 - t0)
      }
    }
  }

  /** Task-level write-progress listener. `target` 0 means unknown (rows
    * print without a denominator or ETA). Throttles output to
    * `minDrawIntervalMs` like the reference's `min_draw_interval`.
    */
  final class Reporter(spark: SparkSession, label: String, target: Long,
                       minDrawIntervalMs: Long = 500,
                       out: String => Unit = s => Console.println(s))
      extends SparkListener {
    private val rows = new AtomicLong()
    private val window = new EstimateWindow(target)
    private val t0 = System.nanoTime()
    @volatile private var lastDraw = 0L

    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val written = Option(e.taskMetrics)
        .map(_.outputMetrics.recordsWritten).getOrElse(0L)
      if (written > 0) {
        val cur = rows.addAndGet(written)
        val now = System.nanoTime()
        window.add(cur, (now - t0) / 1e9)
        if (now - lastDraw >= minDrawIntervalMs * 1000000L ||
            (target > 0 && cur >= target)) {
          lastDraw = now
          val frac = if (target > 0) s"/$target" else ""
          val eta =
            if (target > 0) f", eta ${math.max(0.0, window.etaSeconds)}%.1f s"
            else ""
          out(f"[graft] $label: $cur$frac rows " +
            f"(${window.ratePerSec}%.0f rows/s$eta)")
        }
      }
    }

    /** Rows written so far, as observed from finished tasks. */
    def total: Long = rows.get

    def close(): Unit = spark.sparkContext.removeSparkListener(this)
  }

  def attach(spark: SparkSession, label: String, target: Long = 0L,
             minDrawIntervalMs: Long = 500,
             out: String => Unit = s => Console.println(s)): Reporter = {
    val r = new Reporter(spark, label, target, minDrawIntervalMs, out)
    spark.sparkContext.addSparkListener(r)
    r
  }
}
