package graft.sources

import java.sql.{Connection, DriverManager, PreparedStatement, Types}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Transactional keyed upsert into a JDBC table through a real
  * `MERGE INTO` — the mode that closes the semantic gap between the
  * reference's PostgreSQL `INSERT ... ON CONFLICT (k) DO UPDATE SET
  * col = EXCLUDED.col` inside one transaction with rollback
  * (daily_weather_etl_kenya.py:422-468) and the parquet write-then-swap
  * stand-in in [[WeatherSink]] / [[graft.operators.Dedup.upsert]].
  *
  * Execution shape: `df.foreachPartition` — each partition opens its own
  * connection, prepares ONE parameterized MERGE statement, streams its
  * rows through JDBC batches, and commits (or rolls back) as a single
  * transaction. No rows ever pass through the driver, so this scales to
  * any batch a JDBC sink can absorb; parallelism is the DataFrame's
  * partition count (callers writing to a small single-node database pass
  * `numPartitions = 1` for the reference's strictly-serial semantics,
  * py:63 `max_active_runs=1`).
  *
  * Dialects: Derby/SQL:2003 `MERGE INTO ... USING SYSIBM.SYSDUMMY1`
  * (testable in-JVM against the Derby that ships with Spark) and
  * Postgres `INSERT ... ON CONFLICT DO UPDATE` (the reference's exact
  * statement, py:426-452). Both are single-statement atomic per row and
  * batched per partition.
  *
  * Intra-batch duplicate keys: the reference's executemany applies rows
  * sequentially, so the LAST occurrence of a key in the batch wins.
  * JDBC batch order gives the same within one partition; ACROSS
  * partitions order is nondeterministic, so callers with possibly
  * duplicated keys should pre-dedupe (e.g. `Dedup.keepFirst` on the
  * version order) or use `numPartitions = 1` — exactly the contract a
  * Postgres `ON CONFLICT` sink fed from a parallel loader has.
  */
object JdbcUpsert {

  sealed trait Dialect {
    /** One parameterized upsert statement for `table`; parameter order
      * is defined by each dialect's `parameterColumns`.
      */
    def mergeSql(table: String, cols: Seq[StructField], keys: Seq[String]): String
    /** Column name per `?` placeholder, in placeholder order. */
    def parameterColumns(cols: Seq[StructField], keys: Seq[String]): Seq[String]
  }

  /** SQL:2003 MERGE as Derby accepts it: the one-row system table as the
    * source, key parameters CAST in the ON clause (Derby rejects untyped
    * `?` there). Parameter order: keys (ON), then non-key updates (SET),
    * then every column (INSERT VALUES).
    */
  case object DerbyMerge extends Dialect {
    def mergeSql(table: String, cols: Seq[StructField], keys: Seq[String]): String = {
      val nonKeys = cols.filterNot(f => keys.contains(f.name))
      val on = keys.map { k =>
        val f = cols.find(_.name == k).getOrElse(
          throw new IllegalArgumentException(s"key column $k not in schema"))
        s"t.$k = CAST(? AS ${sqlType(f.dataType)})"
      }.mkString(" AND ")
      val set = nonKeys.map(f => s"${f.name} = ?").mkString(", ")
      val insertCols = cols.map(_.name).mkString(", ")
      val insertVals = cols.map(_ => "?").mkString(", ")
      val matched =
        if (nonKeys.isEmpty) "" else s" WHEN MATCHED THEN UPDATE SET $set"
      s"MERGE INTO $table t USING SYSIBM.SYSDUMMY1 ON ($on)$matched" +
        s" WHEN NOT MATCHED THEN INSERT ($insertCols) VALUES ($insertVals)"
    }
    def parameterColumns(cols: Seq[StructField], keys: Seq[String]): Seq[String] =
      keys ++ cols.collect { case f if !keys.contains(f.name) => f.name } ++
        cols.map(_.name)
  }

  /** The reference's literal statement shape (py:426-452). Parameter
    * order: every column once (VALUES); the DO UPDATE side references
    * EXCLUDED, so no further parameters.
    *
    * @param staticCols non-key columns EXCLUDED from the DO UPDATE SET
    *        (still inserted): the reference never updates
    *        latitude/longitude — region coordinates are static — so
    *        `PostgresOnConflict(Set("latitude", "longitude"))`
    *        reproduces py:426-452 exactly (golden-tested in
    *        JdbcUpsertSpec; no live Postgres exists in this sandbox, so
    *        the statement text IS the testable surface).
    */
  final case class PostgresOnConflict(staticCols: Set[String] = Set.empty)
      extends Dialect {
    def mergeSql(table: String, cols: Seq[StructField], keys: Seq[String]): String = {
      val updated = cols.filterNot(f =>
        keys.contains(f.name) || staticCols.contains(f.name))
      val insertCols = cols.map(_.name).mkString(", ")
      val insertVals = cols.map(_ => "?").mkString(", ")
      val action =
        if (updated.isEmpty) "DO NOTHING"
        else "DO UPDATE SET " +
          updated.map(f => s"${f.name} = EXCLUDED.${f.name}").mkString(", ")
      s"INSERT INTO $table ($insertCols) VALUES ($insertVals) " +
        s"ON CONFLICT (${keys.mkString(", ")}) $action"
    }
    def parameterColumns(cols: Seq[StructField], keys: Seq[String]): Seq[String] =
      cols.map(_.name)
  }

  /** Upsert `df` into `table` at `url`. The table must exist (see
    * [[ensureTable]]). Each output partition is one transaction: all of
    * its rows commit together or none do — a partition-scoped version of
    * the reference's whole-batch transaction (py:454-468; use
    * `numPartitions = 1` to make it exactly whole-batch). Deadlock
    * victims / serialization failures (SQLSTATE 40001, Derby 40XL1) are
    * rolled back and the whole partition transaction retried up to 3
    * times with backoff — concurrent MERGEs into one table deadlock by
    * design, and retrying the victim is the JDBC writer contract.
    */
  def upsert(df: DataFrame, url: String, table: String, keys: Seq[String],
      dialect: Dialect = DerbyMerge, batchSize: Int = 500,
      numPartitions: Option[Int] = None): Unit = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    val schema = df.schema
    require(keys.forall(schema.fieldNames.contains),
      s"keys ${keys.mkString(",")} must all be df columns")
    val sql = dialect.mergeSql(table, schema.fields.toSeq, keys)
    val paramCols = dialect.parameterColumns(schema.fields.toSeq, keys)
    val paramIdx = paramCols.map(schema.fieldIndex)
    val paramTypes = paramCols.map(c => schema(c).dataType)
    val repart = numPartitions.fold(df)(df.coalesce)
    repart.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      // Buffered so the partition's transaction can REPLAY: concurrent
      // MERGEs into one table can deadlock, and the database resolves
      // it by aborting a victim (SQLSTATE 40001) — the standard JDBC
      // writer contract is to retry serialization failures, not fail
      // the job. Memory note: one partition's rows are held at once;
      // size partitions for the sink accordingly.
      val buffered = rows.toArray
      val gate = writeGate(url, table)
      if (buffered.nonEmpty) gate.synchronized {
        var attempt = 0
        var done = false
        while (!done) {
          attempt += 1
          val conn = DriverManager.getConnection(url)
          try {
            conn.setAutoCommit(false)
            val ps = conn.prepareStatement(sql)
            try {
              var pending = 0
              buffered.foreach { row =>
                var i = 0
                while (i < paramIdx.length) {
                  bind(ps, i + 1, row, paramIdx(i), paramTypes(i))
                  i += 1
                }
                ps.addBatch()
                pending += 1
                if (pending >= batchSize) { ps.executeBatch(); pending = 0 }
              }
              if (pending > 0) ps.executeBatch()
              conn.commit()
              done = true
            } catch {
              case e: Throwable =>
                // rollback failures must not MASK the real error
                try conn.rollback()
                catch { case r: Throwable => e.addSuppressed(r) }
                val retriable = serializationFailure(e) && attempt < 4
                if (!retriable) throw e
                Thread.sleep(50L * attempt)
            } finally ps.close()
          } finally conn.close()
        }
      }
    }
  }

  /** Same-JVM write serialization for EMBEDDED databases only.
    * Embedded Derby can latch-deadlock UNDETECTABLY when one writer's
    * rollback-undo needs a page another same-JVM writer latched
    * (observed once under `sbt test`: two executor threads parked
    * forever in `BasePage.setExclusive` / `generateUndo`). Lock-manager
    * deadlocks throw 40001 and hit the retry loop below; page-LATCH
    * waits are invisible to deadlock detection, so the only safe
    * concurrency for a same-JVM embedded store is none. Client/server
    * URLs (`jdbc:derby://…`, postgres, …) share one JVM-wide gate map
    * but each gets a PER-TABLE gate only when embedded — remote
    * databases keep full cross-connection concurrency, and cross-JVM
    * executors are unaffected either way (the real cluster case is
    * governed by the server's lock manager + the 40001 retry).
    */
  private val writeGates =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def writeGate(url: String, table: String): AnyRef =
    if (url.startsWith("jdbc:derby:") && !url.startsWith("jdbc:derby://"))
      writeGates.computeIfAbsent(s"$url#$table", _ => new Object)
    else new Object // fresh monitor: synchronized is a no-op, no contention

  /** Deadlock-victim / serialization-failure detection: SQLSTATE 40001
    * (and Derby's 40XL1 lock timeout) anywhere in the chain — a
    * BatchUpdateException wraps the real cause.
    */
  private def serializationFailure(e: Throwable): Boolean = {
    def stateMatches(s: java.sql.SQLException): Boolean = {
      // walk BOTH chains: getNextException (batch) and getCause
      val it = s.iterator()
      while (it.hasNext) {
        it.next() match {
          case q: java.sql.SQLException
              if q.getSQLState != null &&
                (q.getSQLState == "40001" || q.getSQLState == "40XL1") =>
            return true
          case _ => ()
        }
      }
      false
    }
    var cur: Throwable = e
    while (cur != null) {
      cur match {
        case s: java.sql.SQLException if stateMatches(s) => return true
        case _ => ()
      }
      cur = if (cur.getCause != cur) cur.getCause else null
    }
    false
  }

  /** Create `table` with a primary key on `keys` if it does not exist —
    * the reference's CREATE TABLE IF NOT EXISTS DDL task (py:76-134).
    * Index note: the reference's four b-trees (py:116-119) are the PK
    * plus per-column secondaries; secondary indexes are left to the
    * target database's DDL since only the PK participates in upsert
    * correctness.
    */
  def ensureTable(url: String, table: String, schema: StructType,
      keys: Seq[String]): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      // Dialects fold unquoted identifiers differently — Derby (and the
      // standard) to UPPER, Postgres to lower — so probe the metadata
      // under the name as given plus both foldings; a single-folding
      // probe never matches on the other dialect and the unconditional
      // CREATE then fails on every re-run.
      def exists(): Boolean = {
        val meta = conn.getMetaData
        Seq(table, table.toUpperCase, table.toLowerCase).distinct.exists {
          t =>
            val rs = meta.getTables(null, null, t, null)
            try rs.next() finally rs.close()
        }
      }
      if (!exists()) {
        val cols = schema.fields.map { f =>
          val nn = if (keys.contains(f.name)) " NOT NULL" else ""
          s"${f.name} ${sqlType(f.dataType)}$nn"
        }.mkString(", ")
        val ddl =
          s"CREATE TABLE $table ($cols, PRIMARY KEY (${keys.mkString(", ")}))"
        val st = conn.createStatement()
        // TOCTOU: a concurrent caller can CREATE between the probe and
        // ours. Duplicate-table failures (Derby X0Y32, Postgres 42P07)
        // are success iff the table is now visible — re-probe rather
        // than pattern-match dialect-specific SQLSTATEs.
        try st.executeUpdate(ddl)
        catch { case e: java.sql.SQLException => if (!exists()) throw e }
        finally st.close()
      }
    } finally conn.close()
  }

  /** Read the table back as a DataFrame (verification / downstream). */
  def read(spark: org.apache.spark.sql.SparkSession, url: String,
      table: String): DataFrame =
    spark.read.format("jdbc").option("url", url).option("dbtable", table).load()

  private def sqlType(dt: DataType): String = dt match {
    case LongType => "BIGINT"
    case IntegerType => "INTEGER"
    case ShortType => "SMALLINT"
    case DoubleType => "DOUBLE"
    case FloatType => "REAL"
    case BooleanType => "BOOLEAN"
    case DateType => "DATE"
    case TimestampType => "TIMESTAMP"
    case StringType => "VARCHAR(32672)"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case other =>
      throw new IllegalArgumentException(s"no JDBC DDL mapping for $other")
  }

  private def bind(ps: PreparedStatement, pos: Int,
      row: org.apache.spark.sql.Row, idx: Int, dt: DataType): Unit =
    if (row.isNullAt(idx)) ps.setNull(pos, jdbcType(dt))
    else dt match {
      case LongType => ps.setLong(pos, row.getLong(idx))
      case IntegerType => ps.setInt(pos, row.getInt(idx))
      case ShortType => ps.setShort(pos, row.getShort(idx))
      case DoubleType => ps.setDouble(pos, row.getDouble(idx))
      case FloatType => ps.setFloat(pos, row.getFloat(idx))
      case BooleanType => ps.setBoolean(pos, row.getBoolean(idx))
      case StringType => ps.setString(pos, row.getString(idx))
      case DateType => ps.setDate(pos, row.getDate(idx))
      case TimestampType => ps.setTimestamp(pos, row.getTimestamp(idx))
      case d: DecimalType => ps.setBigDecimal(pos, row.getDecimal(idx))
      case other =>
        throw new IllegalArgumentException(s"no JDBC bind for $other")
    }

  private def jdbcType(dt: DataType): Int = dt match {
    case LongType => Types.BIGINT
    case IntegerType => Types.INTEGER
    case ShortType => Types.SMALLINT
    case DoubleType => Types.DOUBLE
    case FloatType => Types.REAL
    case BooleanType => Types.BOOLEAN
    case StringType => Types.VARCHAR
    case DateType => Types.DATE
    case TimestampType => Types.TIMESTAMP
    case _: DecimalType => Types.DECIMAL
    case _ => Types.OTHER
  }
}
