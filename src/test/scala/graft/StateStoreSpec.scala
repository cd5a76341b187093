package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.streaming.StreamingQueryListener

/** The battery-wide state-store knob (`spark.graft.stateStore=rocksdb`):
  * the backend is a storage/recovery decision, never a semantics one —
  * every streaming gate must produce bit-identical rows under RocksDB and
  * under the default HDFS-backed heap maps, and the knob must actually
  * reach the state store (asserted via the query-progress custom metrics,
  * which are provider-specific).
  */
class StateStoreSpec extends SparkSpec {

  private def rows(name: String): Seq[String] = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect().map(_.toString).toSeq
  }

  private def withRocksDb[A](body: => A): A = {
    spark.conf.set(graft.streaming.StreamOps.GraftStateStoreConf, "rocksdb")
    try body
    finally spark.conf.unset(graft.streaming.StreamOps.GraftStateStoreConf)
  }

  test("st13/st15/st17 are bit-identical under RocksDB and default stores") {
    for (q <- Seq("st13_timer_sessions", "st15_stream_outer_join",
        "st17_rate_cap")) {
      val default = rows(q)
      val rocks = withRocksDb(rows(q))
      assert(rocks === default, s"$q diverged across state-store providers")
    }
  }

  test("the knob reaches the store: RocksDB custom metrics observed") {
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit =
        e.progress.stateOperators.foreach(
          _.customMetrics.keySet().asScala.foreach(seen.add))
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    try {
      // st15 uses the DEFAULT provider unless the knob flips it — so
      // rocksdb-prefixed metrics here prove the conf switched the backend
      // of a query that never asks for RocksDB itself.
      withRocksDb(rows("st15_stream_outer_join"))
      // listener events are delivered asynchronously
      val deadline = System.currentTimeMillis() + 30000
      while (!seen.asScala.exists(_.toLowerCase.startsWith("rocksdb")) &&
          System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(seen.asScala.exists(_.toLowerCase.startsWith("rocksdb")),
        s"no RocksDB state-store metrics observed; saw: ${seen.asScala.toSet}")
    } finally spark.streams.removeListener(listener)
  }
}
