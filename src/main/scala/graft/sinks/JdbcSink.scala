package graft.sinks

import java.sql.{Connection, DriverManager, PreparedStatement, SQLException, Types}
import java.util.Properties

import graft.operators.CdcOps
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JDBC warehouse sink — the write-back half of the reference pipeline.
  * PeerDB's whole purpose is landing the mirrored table in an external
  * warehouse (reference: quickstart_prepare_peers.sh:84-91 creates the
  * ClickHouse `target` database; peerdb_config.yaml
  * `clickhouse_target_database`); graft reads JDBC sources
  * ([[graft.sources.Mirror.jdbcSnapshot]],
  * [[graft.sources.Incremental.jdbcIncrement]]) and this object writes the
  * mirror back out: a version-guarded ANSI MERGE upsert, delivered
  * exactly-once per batch through a sink-side ledger table.
  *
  * == Idempotency (two independent layers) ==
  *  - **Ledger**: each delivered batch id is recorded in
  *    `<table>_sink_state`; re-sinking a recorded batch is a no-op before
  *    any row is touched. This is the replay guard a restarted
  *    `foreachBatch` stream needs (Structured Streaming re-runs the last
  *    uncommitted batch id on recovery).
  *  - **Version guard**: every MERGE matches on the key columns and applies
  *    only when the target's `versionCol` is ≤ the incoming row's, so a
  *    partially-retried delivery, and out-of-order delivery of UPSERTS,
  *    converge to the newest version per key. Tombstones (`deletedCol` = 1)
  *    become guarded `WHEN MATCHED … THEN DELETE` — and a physical delete
  *    ERASES the version fence, so a stale upsert for that key arriving in
  *    a LATER batch would re-insert it: deletes require delivery in
  *    batch-id order, which [[sinkMirror]] (monotone high-water mark) and
  *    Structured Streaming's in-order `foreachBatch` both provide. A
  *    producer that cannot guarantee order should land with
  *    [[appendBatch]], which retains tombstone rows and is order-tolerant
  *    by construction (the ClickHouse ReplacingMergeTree trade).
  *
  * == Scale (100 TB) ==
  * Rows are collapsed to newest-per-key ([[CdcOps.latestSnapshot]] — the
  * map-side-combined aggregate, so the shuffle carries one row per key) and
  * then repartitioned BY KEY, so no two PLANNED partitions share a target
  * key: statement order is irrelevant between partitions. (Duplicate
  * ATTEMPTS of one partition — speculative execution, zombie tasks — can
  * still race each other on its keys; the MERGE is idempotent so the
  * retried attempt converges, but leave `spark.speculation` off (the
  * default) for sink stages to avoid transient duplicate-key aborts.)
  * Each partition holds ONE
  * connection and sends batched statements (`stmtBatch` rows per round
  * trip); total concurrency = shuffle partitions. Per-sync IO tracks the
  * DELTA (see [[sinkMirror]] — only batches above the ledger high-water
  * mark are read), never the mirror size. Give the target a primary key /
  * unique index on `keys`: each MERGE probes it once.
  *
  * == Dialect ==
  * The only non-portable fragment is the MERGE source (a one-row dual
  * relation; the incoming row travels as parameters, cast to the column's
  * SQL type): [[AnsiDual]] is the standard table-value-constructor form
  * (PostgreSQL 15+, SQL Server, Oracle), [[DerbyDual]] the DB2/Derby
  * catalog dual — Derby rejects VALUES as a MERGE source, and Derby is the
  * live database the spec exercises (JdbcCaptureSpec). COLUMN identifiers
  * are double-quoted, so `keys` and the mirror's column names must match
  * the target's stored case exactly; TABLE names (`table` and the derived
  * `<table>_sink_state` ledger) are emitted verbatim and unquoted — that
  * is what lets callers pass schema-qualified names (`wh.orders`), and it
  * means a quoted/case-sensitive or reserved-word table name cannot be
  * addressed: pick case-folding-safe table names (the
  * `MultiTableMirror.sinkAll` duplicate guard folds case for exactly this
  * reason). For the reference's actual warehouse, [[ClickHouseDialect]]
  * supplies backtick identifier quoting to [[appendBatch]]'s bulk-INSERT
  * path (registered automatically for `jdbc:clickhouse:` URLs).
  */
object JdbcSink {

  /** Standard one-row MERGE source (PostgreSQL 15+, SQL Server, Oracle …). */
  val AnsiDual = "(VALUES (1)) AS gdual(gx)"

  /** Derby / DB2 catalog dual — Derby's MERGE source must be a base table. */
  val DerbyDual = "SYSIBM.SYSDUMMY1"

  /** @param applied false = the ledger already held `batchId` (or the
    *                mirror delta was empty) and nothing was executed
    * @param rowsChanged MERGE-reported rows actually inserted/updated/
    *                    deleted — a version-guard no-op row counts 0.
    *                    AT-LEAST-ONCE under task retry: a task that dies
    *                    AFTER its JDBC commit (connection drop post-commit)
    *                    re-runs its idempotent MERGEs on retry, and those
    *                    equal-version re-applications count again — treat
    *                    the figure as a delivery-volume indicator, not an
    *                    exact changed-row count
    */
  case class SinkReport(batchId: Long, applied: Boolean, rowsChanged: Long)

  /** ClickHouse JDBC dialect for [[appendBatch]]'s bulk-INSERT path — the
    * reference's actual warehouse (its PeerDB mirrors land in
    * ReplacingMergeTree tables; [[appendBatch]] is that landing pattern).
    * Spark ships no ClickHouse dialect, and the fallback dialect
    * double-quotes identifiers; ClickHouse's canonical identifier quote is
    * the backtick (double quotes are accepted only in ANSI mode), and its
    * identifiers are always case-sensitive — so the generated INSERT must
    * carry each DataFrame column name backtick-quoted, case preserved, in
    * schema order (pinned by JdbcSinkDialectSpec, no live ClickHouse
    * needed). Registered automatically when [[appendBatch]] sees a
    * `jdbc:clickhouse:` URL; register manually via
    * `JdbcDialects.registerDialect` to cover other write paths.
    */
  object ClickHouseDialect extends org.apache.spark.sql.jdbc.JdbcDialect {
    override def canHandle(url: String): Boolean =
      url.toLowerCase(java.util.Locale.ROOT).startsWith("jdbc:clickhouse")
    override def quoteIdentifier(colName: String): String =
      "`" + colName.replace("`", "``") + "`"
  }

  private val chRegistered = new java.util.concurrent.atomic.AtomicBoolean(false)
  private def ensureClickHouseDialect(url: String): Unit =
    if (ClickHouseDialect.canHandle(url) && chRegistered.compareAndSet(false, true))
      org.apache.spark.sql.jdbc.JdbcDialects.registerDialect(ClickHouseDialect)

  /** Upsert one batch of mirror-shaped rows (data columns + `versionCol`,
    * optionally `deletedCol`/other `_peerdb_*` meta) into the JDBC table.
    * Collapses to newest-per-key first, so the input may carry any number
    * of change rows per key. The target table must exist, with the data
    * columns plus `versionCol`; `_peerdb_batch_id`, `_peerdb_synced_at`
    * and the mirror's `bucket` column are not written.
    */
  def sinkBatch(rows: DataFrame, url: String, table: String, keys: Seq[String],
                batchId: Long, props: Properties = new Properties(),
                versionCol: String = "_peerdb_version",
                deletedCol: String = "_peerdb_is_deleted",
                dual: String = AnsiDual, stmtBatch: Int = 500,
                evolve: Boolean = false): SinkReport = {
    require(keys.nonEmpty, "sink needs at least one key column")
    require(keys.forall(rows.columns.contains) && rows.columns.contains(versionCol),
      s"rows must carry ${keys.mkString(",")} and $versionCol; " +
        s"got ${rows.columns.mkString(",")}")
    if (evolve) {
      val skipEv = Set(deletedCol, "_peerdb_batch_id", "_peerdb_synced_at",
        "bucket")
      evolveTarget(url, table,
        org.apache.spark.sql.types.StructType(
          rows.schema.filterNot(f => skipEv.contains(f.name))), props)
    }
    val spark = rows.sparkSession
    val ledger = ledgerTable(table)
    val already = withConnection(url, props) { conn =>
      ensureLedger(conn, ledger)
      delivered(conn, ledger, batchId)
    }
    if (already) return SinkReport(batchId, applied = false, 0L)

    // one row per key, tombstone-tie-broken like the mirror's FINAL read
    val latest = CdcOps.latestSnapshot(rows, keys, versionCol)
    val skip = Set(deletedCol, "_peerdb_batch_id", "_peerdb_synced_at", "bucket")
    val written = rows.columns.filterNot(skip.contains).toSeq
    val delFlag =
      if (rows.columns.contains(deletedCol)) coalesce(col(deletedCol).cast("int"), lit(0))
      else lit(0)
    // key-partitioned: no two connections share a key, so the separately
    // batched upsert/delete statements can never interleave on one key
    val proj = latest
      .select(written.map(col) :+ delFlag.as("_graft_deleted"): _*)
      .repartition(keys.map(col): _*)

    val schema = proj.schema
    val casts = written.map(c => sqlCastType(schema(c).dataType))
    val jdbcTypes = written.map(c => jdbcNullType(schema(c).dataType)).toArray
    val keyIdx = keys.map(written.indexOf).toArray
    val verIdx = written.indexOf(versionCol)
    val nonKeyIdx = written.indices.filterNot(keyIdx.contains).toArray
    val flagIdx = written.length

    def castParam(i: Int) = s"CAST(? AS ${casts(i)})"
    val on = keyIdx.map(i => s"t.${q(written(i))} = ${castParam(i)}").mkString(" AND ")
    val guard = s"t.${q(written(verIdx))} <= ${castParam(verIdx)}"
    val set = nonKeyIdx.map(i => s"${q(written(i))} = ${castParam(i)}").mkString(", ")
    val upsertSql =
      s"""MERGE INTO $table t USING $dual ON $on
         |WHEN MATCHED AND $guard THEN UPDATE SET $set
         |WHEN NOT MATCHED THEN INSERT (${written.map(q).mkString(", ")})
         |VALUES (${written.indices.map(castParam).mkString(", ")})""".stripMargin
    val deleteSql = s"MERGE INTO $table t USING $dual ON $on WHEN MATCHED AND $guard THEN DELETE"
    val upsertOrder = keyIdx ++ Array(verIdx) ++ nonKeyIdx ++ written.indices.toArray
    val deleteOrder = keyIdx ++ Array(verIdx)

    val acc = spark.sparkContext.longAccumulator("graft_jdbc_sink_changed")
    proj.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val conn = connect(url, props)
        try {
          conn.setAutoCommit(false)
          val up = conn.prepareStatement(upsertSql)
          val del = conn.prepareStatement(deleteSql)
          try {
            var upN = 0; var delN = 0; var changed = 0L
            def flush(ps: PreparedStatement, n: Int): Unit = if (n > 0)
              changed += ps.executeBatch().iterator.map(c => math.max(c, 0).toLong).sum
            it.foreach { row =>
              if (row.getInt(flagIdx) != 0) {
                bind(del, row, deleteOrder, jdbcTypes); del.addBatch(); delN += 1
                if (delN >= stmtBatch) { flush(del, delN); delN = 0 }
              } else {
                bind(up, row, upsertOrder, jdbcTypes); up.addBatch(); upN += 1
                if (upN >= stmtBatch) { flush(up, upN); upN = 0 }
              }
            }
            flush(up, upN); flush(del, delN)
            conn.commit()
            acc.add(changed)
          } finally { up.close(); del.close() }
        } catch {
          case e: Throwable => try conn.rollback() catch { case _: SQLException => () }; throw e
        } finally conn.close()
      }
    }
    withConnection(url, props)(record(_, ledger, batchId, acc.value))
    SinkReport(batchId, applied = true, acc.value)
  }

  /** ReplacingMergeTree-style landing: APPEND the batch's raw change rows
    * (metadata columns included) and let the warehouse deduplicate at
    * merge/read time on (keys, `_peerdb_version`) — exactly how the
    * reference lands a PeerDB mirror in ClickHouse (the
    * `clickhouse_target_database` tables are
    * ReplacingMergeTree(_peerdb_version); reads use FINAL). Idempotency
    * per batch id comes from the ledger; WITHIN a retried batch the
    * append is at-least-once, which is precisely what a replacing-merge
    * target tolerates (identical (keys, version) rows collapse on merge).
    * Far cheaper than [[sinkBatch]] at scale — no per-row probe, plain
    * bulk INSERTs through Spark's JDBC writer — at the cost of read-time
    * dedup in the target. Only the mirror's `bucket` layout column is
    * dropped.
    */
  def appendBatch(rows: DataFrame, url: String, table: String, batchId: Long,
                  props: Properties = new Properties()): SinkReport = {
    ensureClickHouseDialect(url)
    val ledger = ledgerTable(table)
    val already = withConnection(url, props) { conn =>
      ensureLedger(conn, ledger)
      delivered(conn, ledger, batchId)
    }
    if (already) return SinkReport(batchId, applied = false, 0L)
    // one evaluation feeds both the count and the append — a live-tail
    // source must not write rows the report never counted
    val payload = rows.drop("bucket")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = payload.count()
      payload.write.mode("append").jdbc(url, table, props)
      withConnection(url, props)(record(_, ledger, batchId, n))
      SinkReport(batchId, applied = true, n)
    } finally payload.unpersist(false)
  }

  /** Deliver everything the mirror has committed since the last sink run —
    * the per-sync warehouse step of a continuous pipeline. Reads ONLY the
    * mirror batches above the ledger's high-water mark (delta-sized IO, a
    * partition-pruned predicate once the mirror is batch-partitioned), so
    * calling it after every [[graft.sources.Incremental.poll]] costs
    * O(changes), and calling it twice is a no-op.
    */
  def sinkMirror(spark: SparkSession, mirrorDir: String, url: String,
                 table: String, keys: Seq[String],
                 props: Properties = new Properties(),
                 versionCol: String = "_peerdb_version",
                 deletedCol: String = "_peerdb_is_deleted",
                 dual: String = AnsiDual, stmtBatch: Int = 500,
                 evolve: Boolean = false): SinkReport = {
    val ledger = ledgerTable(table)
    val last = withConnection(url, props) { conn =>
      ensureLedger(conn, ledger)
      highWater(conn, ledger)
    }
    val delta = graft.sources.Mirror.readCommitted(spark, mirrorDir)
      .where(col("_peerdb_batch_id") > last)
    // bounded collect: a 1-row aggregate
    val hi = delta.agg(max(col("_peerdb_batch_id"))).head().get(0)
    if (hi == null) SinkReport(last, applied = false, 0L)
    else sinkBatch(delta, url, table, keys, hi.asInstanceOf[Number].longValue(),
      props, versionCol, deletedCol, dual, stmtBatch, evolve)
  }

  /** Warehouse delivery lag — the sink-side row of the monitor's per-table
    * sync status (the reference's monitor compares source and ClickHouse
    * state per table; this compares the MIRROR and its warehouse target).
    * One row: the mirror's highest committed batch id, the ledger's
    * high-water mark, how many committed batches await delivery, and a
    * status. Both sides are 1-row lookups (a bounded aggregate over the
    * manifest-pinned mirror; one MAX on the ledger), so the report costs
    * O(1) beyond the mirror scan it shares with `mirror_lag`.
    */
  def deliveryLag(spark: SparkSession, mirrorDir: String, url: String,
                  table: String,
                  props: Properties = new Properties()): DataFrame = {
    val delivered = withConnection(url, props) { conn =>
      ensureLedger(conn, ledgerTable(table))
      highWater(conn, ledgerTable(table))
    }
    graft.sources.Mirror.readCommitted(spark, mirrorDir)
      // an EMPTY mirror (committed sync of an empty source) has no batch
      // ids: report -1 on both sides — DELIVERED, never a NULL that a
      // typed consumer trips over or a permanent phantom PENDING
      .agg(coalesce(max(col("_peerdb_batch_id")), lit(-1L)).as("mirror_batch"))
      .select(
        lit(table).as("target_table"),
        col("mirror_batch"),
        lit(delivered).as("delivered_batch"),
        greatest(col("mirror_batch") - delivered, lit(0L)).as("pending_batches"),
        when(col("mirror_batch") <= delivered, "DELIVERED")
          .otherwise("PENDING").as("delivery_status"))
  }

  /** The Structured Streaming form: hand this to
    * `writeStream.foreachBatch(...)` to land a CDC stream in the warehouse.
    * The streaming engine replays the last batch id on recovery; the ledger
    * makes that replay a no-op, so delivery is effectively exactly-once.
    */
  def foreachBatch(url: String, table: String, keys: Seq[String],
                   props: Properties = new Properties(),
                   versionCol: String = "_peerdb_version",
                   deletedCol: String = "_peerdb_is_deleted",
                   dual: String = AnsiDual,
                   stmtBatch: Int = 500): (DataFrame, Long) => Unit =
    (batch, id) => {
      sinkBatch(batch, url, table, keys, id, props, versionCol, deletedCol,
        dual, stmtBatch)
      ()
    }

  // ---- ledger --------------------------------------------------------------

  private def ledgerTable(table: String): String = table + "_sink_state"

  private def ensureLedger(conn: Connection, ledger: String): Unit = {
    val st = conn.createStatement()
    try {
      try st.executeUpdate(s"CREATE TABLE $ledger (batch_id BIGINT NOT NULL " +
        "PRIMARY KEY, rows_changed BIGINT, delivered_at TIMESTAMP)")
      catch { case _: SQLException => () } // exists (or racing creator won)
      // the swallow above must not hide a genuinely unusable ledger
      st.executeQuery(s"SELECT batch_id FROM $ledger WHERE 1 = 0").close()
    } finally st.close()
  }

  private def delivered(conn: Connection, ledger: String, batchId: Long): Boolean = {
    val ps = conn.prepareStatement(s"SELECT 1 FROM $ledger WHERE batch_id = ?")
    try { ps.setLong(1, batchId); val rs = ps.executeQuery(); try rs.next() finally rs.close() }
    finally ps.close()
  }

  private def highWater(conn: Connection, ledger: String): Long = {
    val st = conn.createStatement()
    try {
      val rs = st.executeQuery(s"SELECT MAX(batch_id) FROM $ledger")
      try { rs.next(); val v = rs.getLong(1); if (rs.wasNull()) -1L else v }
      finally rs.close()
    } finally st.close()
  }

  private def record(conn: Connection, ledger: String, batchId: Long,
                     rowsChanged: Long): Unit = {
    val ps = conn.prepareStatement(
      s"INSERT INTO $ledger VALUES (?, ?, CURRENT_TIMESTAMP)")
    try {
      ps.setLong(1, batchId); ps.setLong(2, rowsChanged)
      ps.executeUpdate()
    } catch {
      // duplicate key: a concurrent deliverer of the SAME batch recorded it
      // first — both executed identical idempotent MERGEs, so adopt theirs
      case e: SQLException if Option(e.getSQLState).exists(_.startsWith("23")) => ()
    } finally ps.close()
  }

  // ---- JDBC plumbing --------------------------------------------------------

  private def connect(url: String, props: Properties): Connection = {
    Option(props.getProperty("driver")).foreach(Class.forName)
    DriverManager.getConnection(url, props)
  }

  private def withConnection[A](url: String, props: Properties)(body: Connection => A): A = {
    val conn = connect(url, props)
    try body(conn) finally conn.close()
  }

  private def q(id: String): String = "\"" + id.replace("\"", "\"\"") + "\""

  /** SQL type each parameter is CAST to — Derby requires typed parameters
    * inside MERGE, and the casts keep the statement portable.
    */
  /** Sink-side schema evolution — the PeerDB schema-drift contract on the
    * TARGET half: columns newly present in the mirror (a source `ALTER
    * TABLE ADD COLUMN` that flowed through capture) are ADDED to the
    * warehouse table before the batch lands, so delivery never stalls on
    * drift. Scope is deliberately ADD-only: drops and renames do NOT
    * propagate (the warehouse keeps history the source discarded), and a
    * column present with a DIFFERENT reported type is left alone here —
    * the batch's own CASTs fail loudly if the types are truly
    * incompatible. Existing rows take the engine's default NULL fill.
    *
    * Column presence is probed via `SELECT * WHERE 1=0` metadata — the
    * same name resolution every generated statement uses — and compared
    * case-insensitively (Derby upper-cases unquoted identifiers; the ADD
    * quotes the DataFrame's exact name, matching the write path). Types
    * come from the shared ANSI mapping; ClickHouse accepts these as its
    * standard aliases (BIGINT→Int64, VARCHAR→String — text-pinned like
    * the dialect, no live ClickHouse in the sandbox).
    *
    * Returns the added column names (empty = schemas already agree).
    */
  def evolveTarget(url: String, table: String,
                   schema: org.apache.spark.sql.types.StructType,
                   props: Properties = new Properties()): Seq[String] =
    withConnection(url, props) { conn =>
      val st = conn.createStatement()
      val existing = try {
        val rs = st.executeQuery(s"SELECT * FROM $table WHERE 1=0")
        val md = rs.getMetaData
        (1 to md.getColumnCount)
          .map(i => md.getColumnName(i).toLowerCase(java.util.Locale.ROOT))
          .toSet
      } finally st.close()
      val missing = schema.fields.filterNot(f =>
        existing.contains(f.name.toLowerCase(java.util.Locale.ROOT)))
      missing.foreach { f =>
        val alter = conn.createStatement()
        try alter.executeUpdate(
          s"ALTER TABLE $table ADD COLUMN ${q(f.name)} ${sqlCastType(f.dataType)}")
        finally alter.close()
      }
      missing.map(_.name).toSeq
    }

  private def sqlCastType(dt: DataType): String = dt match {
    case LongType => "BIGINT"
    case IntegerType => "INTEGER"
    case ShortType | ByteType => "SMALLINT"
    case DoubleType => "DOUBLE"
    case FloatType => "REAL"
    case BooleanType => "BOOLEAN"
    case DateType => "DATE"
    case TimestampType => "TIMESTAMP"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case StringType => "VARCHAR(32672)"
    case other =>
      throw new IllegalArgumentException(s"unsupported sink column type $other")
  }

  private def jdbcNullType(dt: DataType): Int = dt match {
    case LongType => Types.BIGINT
    case IntegerType => Types.INTEGER
    case ShortType | ByteType => Types.SMALLINT
    case DoubleType => Types.DOUBLE
    case FloatType => Types.REAL
    case BooleanType => Types.BOOLEAN
    case DateType => Types.DATE
    case TimestampType => Types.TIMESTAMP
    case _: DecimalType => Types.DECIMAL
    case _ => Types.VARCHAR
  }

  private def bind(ps: PreparedStatement, row: Row, order: Array[Int],
                   types: Array[Int]): Unit = {
    var j = 1
    order.foreach { i =>
      val v = row.get(i)
      if (v == null) ps.setNull(j, types(i)) else ps.setObject(j, toJdbc(v))
      j += 1
    }
  }

  /** Row values arrive as Spark external types; map the java.time ones back
    * to java.sql for drivers (Derby) that reject setObject(Instant).
    */
  private def toJdbc(v: Any): AnyRef = v match {
    case i: java.time.Instant => java.sql.Timestamp.from(i)
    case d: java.time.LocalDate => java.sql.Date.valueOf(d)
    case b: scala.math.BigDecimal => b.underlying()
    case other => other.asInstanceOf[AnyRef]
  }
}
