package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Execution metrics collection — the engine analogue of the reference's
  * progress/rate instrumentation (reference: sdk/lib/progress.php:296-318,
  * 424-446 — a console progress bar with a sliding rate window).
  *
  * A `QueryExecutionListener` observes every completed action on the
  * session: wall time, output rows (when the sink reports them), and
  * failure. Rates over a sliding window replace the reference's 5-point
  * window estimate; here the window is simply the retained record list.
  */
object Metrics {

  final case class QueryRecord(name: String, durationNs: Long,
                               outputRows: Option[Long],
                               failed: Boolean)

  /** Attach a collecting listener; returns a handle to read/clear records. */
  def attach(spark: SparkSession): Collector = {
    val c = new Collector
    spark.listenerManager.register(c.listener)
    c
  }

  final class Collector {
    private val records = new ConcurrentLinkedQueue[QueryRecord]()

    private[Metrics] val listener: QueryExecutionListener =
      new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
                               durationNs: Long): Unit = {
          val rows = Option(qe.executedPlan.metrics.get("numOutputRows"))
            .flatten.map(_.value)
          records.add(QueryRecord(funcName, durationNs, rows, failed = false))
        }
        override def onFailure(funcName: String, qe: QueryExecution,
                               exception: Exception): Unit =
          records.add(QueryRecord(funcName, 0L, None, failed = true))
      }

    def snapshot(): Seq[QueryRecord] = {
      import scala.jdk.CollectionConverters._
      records.iterator().asScala.toSeq
    }

    def totalSeconds: Double = snapshot().map(_.durationNs).sum / 1e9

    /** Rows/sec over the retained window, when row counts were reported. */
    def throughput: Option[Double] = {
      val withRows = snapshot().filter(r => !r.failed && r.outputRows.isDefined)
      val secs = withRows.map(_.durationNs).sum / 1e9
      val rows = withRows.flatMap(_.outputRows).sum
      if (secs > 0 && rows > 0) Some(rows / secs) else None
    }

    def clear(): Unit = records.clear()

    def detach(spark: SparkSession): Unit =
      spark.listenerManager.unregister(listener)
  }
}
