package graft.etl

import java.sql.{Connection, DriverManager, PreparedStatement}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Real-database mutation sinks: batched UPDATE-else-INSERT (upsert), batched
  * DELETE, and delete-then-insert — the destination-mutating half of the
  * reference that plain bulk-append writers can't express (reference:
  * sdk/lib/db.php:285-319 `db_update`/`db_execute`,
  * sdk/migrate_assures.php:185-236 update-vs-insert branch and
  * delete-then-reinsert of child rows).
  *
  * Where the reference probed and mutated ONE ROW PER ROUND-TRIP, these
  * sinks run per-partition over the DataFrame with JDBC statement batching:
  * each executor partition opens one connection (with the reference's
  * retry/backoff), binds `batchSize` rows into a prepared statement, and
  * commits per batch. The update-vs-insert branch is decided from
  * `executeBatch`'s per-row update counts — rows whose UPDATE matched
  * nothing are re-batched as INSERTs — so the semantics are exactly the
  * reference's "update if present else insert" without needing a
  * dialect-specific MERGE.
  *
  * Identifiers are quoted with `quote` (default `"` — matches how Spark's
  * JDBC writer creates tables on Derby/Postgres; pass "`" for MySQL).
  *
  * Counts come from an accumulator, so they are reporting-grade (a retried
  * task adds twice); the STATEMENTS are idempotent — re-running an upsert
  * leaves the table unchanged — which is the property that matters for
  * at-least-once execution.
  *
  * Duplicate keys within `df` are applied in partition order, which is not
  * deterministic across runs — dedup first (`Dedup`/`Upsert` handle this)
  * exactly as the reference relied on cursor order.
  */
object JdbcSink {

  /** Open a connection with retry/backoff (reference sdk/lib/db.php:327-346:
    * up to 7 attempts, 3 s apart).
    */
  def connect(url: String, driver: Option[String] = None, attempts: Int = 7,
              delayMs: Long = 3000): Connection = {
    driver.foreach(Class.forName)
    withRetry(attempts, delayMs)(DriverManager.getConnection(url))
  }

  /** Retry policy shared by every plan-time/executor-side connection path:
    * up to `attempts`, `delayMs` apart (the reference retried everything;
    * here PERMANENT failures fail fast — SQLState class 42 (syntax /
    * missing object) and 28 (bad credentials) can never succeed on retry,
    * and interruption propagates instead of being slept through).
    */
  private[graft] def withRetry[T](attempts: Int, delayMs: Long)(f: => T): T = {
    var last: Throwable = null
    var i = 0
    while (i < attempts) {
      try return f
      catch {
        case t: InterruptedException => throw t
        case t: Throwable if !isRetryable(t) => throw t
        case t: Throwable =>
          last = t
          i += 1
          if (i < attempts) Thread.sleep(delayMs)
      }
    }
    throw new RuntimeException(
      "Too many attempt to create database connection", last)
  }

  private def isRetryable(t: Throwable): Boolean = {
    var cur = t
    while (cur != null) {
      cur match {
        case _: InterruptedException => return false
        case s: java.sql.SQLException =>
          val state = Option(s.getSQLState).getOrElse("")
          return !(state.startsWith("42") || state.startsWith("28"))
        case _ => ()
      }
      cur = if (cur.getCause ne cur) cur.getCause else null
    }
    true // unknown failure → retry, like the reference did
  }

  /** True when the failure (anywhere in the cause chain) is the database
    * saying the relation doesn't exist / can't be parsed — SQLState class
    * 42 — as opposed to the database being unreachable.
    */
  def isMissingRelation(t: Throwable): Boolean =
    sqlStateClasses(t).contains("42")

  /** True when the failure is a ROW-LEVEL data error — SQLState class 21
    * (cardinality), 22 (data exception), or 23 (integrity constraint) —
    * the only failures the poison-row path may swallow. Anything else
    * (deadlock 40, connection 08, syntax 42, unknown) must PROPAGATE so
    * Spark's task retry re-applies the partition instead of rows being
    * silently dropped.
    */
  private def isDataError(t: Throwable): Boolean = {
    val classes = sqlStateClasses(t)
    classes.contains("21") || classes.contains("22") ||
      classes.contains("23")
  }

  /** Every SQLState class reachable through BOTH the cause chain and the
    * SQLException `getNextException` chain — drivers wrap batch failures
    * in a generic-state exception (Derby: class XJ) with the real
    * constraint violation chained behind it.
    */
  private def sqlStateClasses(t: Throwable): Set[String] = {
    val seen = scala.collection.mutable.Set[String]()
    var frontier: List[Throwable] = List(t)
    var budget = 32
    while (frontier.nonEmpty && budget > 0) {
      budget -= 1
      val cur = frontier.head
      frontier = frontier.tail
      cur match {
        case s: java.sql.SQLException =>
          Option(s.getSQLState).filter(_.length >= 2)
            .foreach(st => seen += st.substring(0, 2))
          if (s.getNextException != null && (s.getNextException ne s))
            frontier ::= s.getNextException
        case _ => ()
      }
      if (cur != null && cur.getCause != null && (cur.getCause ne cur))
        frontier ::= cur.getCause
    }
    seen.toSet
  }

  /** Outcome of a resilient upsert: rows applied, rows that failed even
    * the row-at-a-time retry, and a bounded sample of their errors.
    */
  final case class UpsertReport(applied: Long, failed: Long,
                                errors: Seq[String])

  /** Update-else-insert each row of `df` into `table` on `keys`. Returns the
    * number of rows applied (updates + inserts). Poison rows are skipped
    * and counted — use [[upsertReport]] to see them.
    */
  def upsert(df: DataFrame, url: String, table: String, keys: Seq[String],
             options: Map[String, String] = Map.empty,
             batchSize: Int = 1000, quote: String = "\""): Long =
    upsertReport(df, url, table, keys, options, batchSize, quote).applied

  /** [[upsert]] with poison-row isolation, the reference's failed-row
    * semantics (sdk/migrate_assures.php:419-456: collect failures, retry
    * them individually, log what still fails and move on): when a BATCH
    * fails, the transaction rolls back and the batch replays row by row —
    * rows that fail alone are skipped, counted, and sampled into
    * `errors` (≤20 per partition) instead of sinking the whole write.
    */
  def upsertReport(df: DataFrame, url: String, table: String,
                   keys: Seq[String],
                   options: Map[String, String] = Map.empty,
                   batchSize: Int = 1000,
                   quote: String = "\""): UpsertReport = {
    val cols = df.columns.toSeq
    val nonKeys = cols.filterNot(keys.contains)
    require(keys.nonEmpty && nonKeys.nonEmpty,
      s"upsert needs key and non-key columns, got keys=$keys of $cols")
    // Column identifiers are quoted (Spark's JDBC writer creates them
    // quoted); the TABLE name passes through raw, exactly as Spark's own
    // writer emits it in CREATE/INSERT — quoting it here would miss tables
    // the writer created unquoted (e.g. Derby folds those to upper case).
    def q(n: String) = quote + n + quote
    val updateSql = s"UPDATE $table SET " +
      nonKeys.map(c => s"${q(c)} = ?").mkString(", ") +
      " WHERE " + keys.map(c => s"${q(c)} = ?").mkString(" AND ")
    val insertSql = s"INSERT INTO $table (${cols.map(q).mkString(", ")})" +
      s" VALUES (${cols.map(_ => "?").mkString(", ")})"
    val schema = df.schema
    val updateOrder = nonKeys ++ keys
    val driver = options.get("driver")
    val sc = df.sparkSession.sparkContext
    val acc = sc.longAccumulator("graft_upsert")
    val failAcc = sc.longAccumulator("graft_upsert_failed")
    val errAcc = sc.collectionAccumulator[String]("graft_upsert_errors")
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) withConnection(url, driver) { conn =>
        val up = conn.prepareStatement(updateSql)
        val upOne = conn.prepareStatement(updateSql)
        val ins = conn.prepareStatement(insertSql)
        val insOne = conn.prepareStatement(insertSql)
        var errSampled = 0
        try {
          val buffer = new ArrayBuffer[Row](batchSize)
          // one row, its own transaction — the poison-isolation path.
          // Only DATA errors are swallowed; transient failures propagate
          // to Spark's task retry.
          def applyOne(r: Row): Boolean =
            try {
              bind(upOne, r, updateOrder, schema)
              if (upOne.executeUpdate() == 0) {
                bind(insOne, r, cols, schema)
                insOne.executeUpdate()
              }
              conn.commit()
              true
            } catch {
              case e: java.sql.SQLException if isDataError(e) =>
                conn.rollback()
                failAcc.add(1)
                if (errSampled < 20) { errAcc.add(e.getMessage); errSampled += 1 }
                false
            }
          def flush(): Unit = if (buffer.nonEmpty) {
            try {
              buffer.foreach { r => bind(up, r, updateOrder, schema); up.addBatch() }
              val counts = up.executeBatch()
              val misses = new ArrayBuffer[Row]()
              var applied = 0L
              var j = 0
              while (j < counts.length) {
                counts(j) match {
                  case 0 => misses += buffer(j) // UPDATE matched nothing
                  case java.sql.Statement.SUCCESS_NO_INFO =>
                    // driver doesn't report per-row counts (Oracle, MySQL
                    // rewriteBatchedStatements): re-run this row's UPDATE
                    // individually to learn whether it matched — the
                    // correctness of update-vs-insert can't ride on -2.
                    bind(upOne, buffer(j), updateOrder, schema)
                    if (upOne.executeUpdate() == 0) misses += buffer(j)
                    else applied += 1
                  case n if n < 0 =>
                    throw new java.sql.BatchUpdateException(
                      s"batched UPDATE failed with status $n", counts)
                  case _ => applied += 1
                }
                j += 1
              }
              misses.foreach { r => bind(ins, r, cols, schema); ins.addBatch() }
              if (misses.nonEmpty) { ins.executeBatch(); applied += misses.length }
              conn.commit()
              acc.add(applied)
            } catch {
              case e: java.sql.SQLException if isDataError(e) =>
                // batch poisoned by a data error: clear any pending batch
                // entries (a mid-bind failure leaves them staged), roll
                // back, replay row by row so one bad row can't sink its
                // batch-mates. Transient errors (deadlock, connection) are
                // NOT caught — Spark's task retry re-applies the partition.
                up.clearBatch()
                ins.clearBatch()
                conn.rollback()
                acc.add(buffer.count(applyOne))
            }
            buffer.clear()
          }
          it.foreach { r =>
            buffer += r
            if (buffer.length >= batchSize) flush()
          }
          flush()
        } finally { up.close(); upOne.close(); ins.close(); insOne.close() }
      }
    }
    import scala.jdk.CollectionConverters._
    UpsertReport(acc.value, failAcc.value, errAcc.value.asScala.toSeq)
  }

  /** MySQL-dialect single-statement upsert: `INSERT … ON DUPLICATE KEY
    * UPDATE nk = VALUES(nk), …` — the shape a production MySQL sink
    * emits instead of [[upsert]]'s UPDATE-probe-then-INSERT pair (ONE
    * round trip per row instead of up to two, and Connector/J's
    * `rewriteBatchedStatements=true` collapses a whole batch into one
    * multi-value statement because the update clause holds no `?`).
    * Semantics match [[upsert]] when the table's PRIMARY KEY equals
    * `keys`: the source row wholly replaces the matched row's non-key
    * columns. Poison isolation follows the same contract — a failed
    * batch rolls back and replays row by row, data-error rows are
    * skipped and counted. Requires the target dialect to support ODKU
    * (MySQL/MariaDB; gated against [[MiniMySql]], which also pins the
    * 1-inserted/2-changed/1-unchanged affected counts this method
    * deliberately does NOT ride on).
    */
  def upsertOnDuplicateKey(df: DataFrame, url: String, table: String,
                           keys: Seq[String],
                           options: Map[String, String] = Map.empty,
                           batchSize: Int = 1000,
                           quote: String = "`"): UpsertReport = {
    val cols = df.columns.toSeq
    val nonKeys = cols.filterNot(keys.contains)
    require(keys.nonEmpty && nonKeys.nonEmpty,
      s"upsert needs key and non-key columns, got keys=$keys of $cols")
    def q(n: String) = quote + n + quote
    val sql = s"INSERT INTO $table (${cols.map(q).mkString(", ")})" +
      s" VALUES (${cols.map(_ => "?").mkString(", ")})" +
      " ON DUPLICATE KEY UPDATE " +
      nonKeys.map(c => s"${q(c)} = VALUES(${q(c)})").mkString(", ")
    val schema = df.schema
    val driver = options.get("driver")
    val sc = df.sparkSession.sparkContext
    val acc = sc.longAccumulator("graft_odku_upsert")
    val failAcc = sc.longAccumulator("graft_odku_failed")
    val errAcc = sc.collectionAccumulator[String]("graft_odku_errors")
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) withConnection(url, driver) { conn =>
        val ins = conn.prepareStatement(sql)
        val insOne = conn.prepareStatement(sql)
        var errSampled = 0
        try {
          val buffer = new ArrayBuffer[Row](batchSize)
          def applyOne(r: Row): Boolean =
            try {
              bind(insOne, r, cols, schema)
              insOne.executeUpdate()
              conn.commit()
              true
            } catch {
              case e: java.sql.SQLException if isDataError(e) =>
                conn.rollback()
                failAcc.add(1)
                if (errSampled < 20) { errAcc.add(e.getMessage); errSampled += 1 }
                false
            }
          def flush(): Unit = if (buffer.nonEmpty) {
            try {
              buffer.foreach { r => bind(ins, r, cols, schema); ins.addBatch() }
              ins.executeBatch()
              conn.commit()
              // ODKU counts conflate insert/update/no-change (1/2/1) and
              // SUCCESS_NO_INFO hides them entirely under the rewrite —
              // applied = rows PROCESSED, same meaning as upsert()'s
              acc.add(buffer.length)
            } catch {
              case e: java.sql.SQLException if isDataError(e) =>
                ins.clearBatch()
                conn.rollback()
                acc.add(buffer.count(applyOne))
            }
            buffer.clear()
          }
          it.foreach { r =>
            buffer += r
            if (buffer.length >= batchSize) flush()
          }
          flush()
        } finally { ins.close(); insOne.close() }
      }
    }
    import scala.jdk.CollectionConverters._
    UpsertReport(acc.value, failAcc.value, errAcc.value.asScala.toSeq)
  }

  /** Delete every `table` row whose key tuple appears in `df` (distinct on
    * `keys` first — one DELETE per distinct tuple, batched). Returns rows
    * deleted as reported by the database.
    */
  def delete(df: DataFrame, url: String, table: String, keys: Seq[String],
             options: Map[String, String] = Map.empty,
             batchSize: Int = 1000, quote: String = "\""): Long = {
    require(keys.nonEmpty, "delete needs at least one key column")
    def q(n: String) = quote + n + quote
    val sql = s"DELETE FROM $table WHERE " +
      keys.map(c => s"${q(c)} = ?").mkString(" AND ")
    val tuples = df.select(keys.map(col): _*).distinct()
    val schema = tuples.schema
    val driver = options.get("driver")
    val acc = df.sparkSession.sparkContext.longAccumulator("graft_delete")
    tuples.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) withConnection(url, driver) { conn =>
        val st = conn.prepareStatement(sql)
        try {
          var inBatch = 0
          def flush(): Unit = if (inBatch > 0) {
            acc.add(st.executeBatch().collect { case n if n > 0 => n.toLong }.sum)
            conn.commit()
            inBatch = 0
          }
          it.foreach { r =>
            bind(st, r, keys, schema)
            st.addBatch()
            inBatch += 1
            if (inBatch >= batchSize) flush()
          }
          flush()
        } finally st.close()
      }
    }
    acc.value
  }

  /** Delete-then-insert children against a live table (reference:
    * sdk/migrate_assures.php:205-227): remove every row whose PARENT key
    * appears in the recomputed set, then append the recomputed rows.
    * Idempotent by construction — a second run deletes what the first
    * inserted and re-inserts the same rows.
    */
  def replaceChildren(df: DataFrame, url: String, table: String,
                      parentKeys: Seq[String],
                      options: Map[String, String] = Map.empty): Long = {
    delete(df, url, table, parentKeys, options)
    Sinks.jdbc(df, url, table, options)
  }

  private def withConnection(url: String, driver: Option[String])
                            (body: Connection => Unit): Unit = {
    val conn = connect(url, driver)
    try { conn.setAutoCommit(false); body(conn) }
    finally conn.close()
  }

  private def bind(st: PreparedStatement, row: Row, order: Seq[String],
                   schema: StructType): Unit = {
    var i = 0
    while (i < order.length) {
      val idx = schema.fieldIndex(order(i))
      val v = row.get(idx)
      if (v == null) st.setNull(i + 1, jdbcType(schema(idx).dataType))
      else v match {
        case s: String => st.setString(i + 1, s) // CLOB-safe (Derby)
        case d: scala.math.BigDecimal => st.setBigDecimal(i + 1, d.bigDecimal)
        case t: java.sql.Timestamp => st.setTimestamp(i + 1, t)
        case d: java.sql.Date => st.setDate(i + 1, d)
        case other => st.setObject(i + 1, other.asInstanceOf[AnyRef])
      }
      i += 1
    }
  }

  private def jdbcType(dt: DataType): Int = dt match {
    case IntegerType => java.sql.Types.INTEGER
    case LongType => java.sql.Types.BIGINT
    case DoubleType => java.sql.Types.DOUBLE
    case FloatType => java.sql.Types.REAL
    case ShortType => java.sql.Types.SMALLINT
    case ByteType => java.sql.Types.TINYINT
    case BooleanType => java.sql.Types.BOOLEAN
    case BinaryType => java.sql.Types.BINARY
    case TimestampType => java.sql.Types.TIMESTAMP
    case DateType => java.sql.Types.DATE
    case _: DecimalType => java.sql.Types.DECIMAL
    case _ => java.sql.Types.VARCHAR
  }
}
