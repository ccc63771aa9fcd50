package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** S6 — the REAL buffered batch DB sink (stream_insert_db.js:277-353),
  * exercised end-to-end against an embedded Apache Derby database (the
  * one JDBC engine shipped with Spark's own jars, so zero extra deps).
  *
  * The reference drains a per-type buffer into one multi-row INSERT via
  * pg-promise (`stream_insert_db.js:295-327`); on failure it unshifts
  * the batch back onto the queue head (`:339-353`). The Spark-native
  * shape is `foreachBatch { _.write.jdbc(...) }`:
  *
  *   - batching: a micro-batch IS the buffer — the trigger interval
  *     plays the 1000-row/5-s flush policy (`config/apm_config.json:230-231`);
  *   - multi-row insert: the JDBC writer prepares one INSERT per
  *     partition and addBatch()es rows — the same wire shape as
  *     pg-promise's ColumnSet multi-insert, but per-executor in
  *     parallel (at cluster scale each partition streams its own
  *     batch, no single-writer bottleneck; `numPartitions` caps the
  *     connection fan-in so 1000 executors don't open 1000 sessions);
  *   - failure requeue: [[ApmStreaming.RequeueWriter]] parks the failed
  *     micro-batch durably and replays it in order at the next trigger —
  *     the queue-head unshift, made crash-safe.
  *
  * The `stats` table's jsonb column (`entries.js:120-151` nests the 15
  * z-score fields into one object; `stream_insert_db.js:153` declares
  * `stats:json`) maps to a `to_json(struct(...))` string column —
  * Postgres would ingest it as jsonb verbatim; Derby (no JSON type)
  * stores it as the CLOB the dialect picks for StringType. Either way
  * the nested payload round-trips through `from_json`, which
  * `Alerts.dbStatsRoundtrip` (query `s6_db_stats`) verifies against the
  * DuckDB oracle, and [[JdbcSinkSpec]] verifies against the live Derby.
  */
object JdbcSink {

  /** Batch JDBC append, connection fan-in capped. `numPartitions` is the
    * reference's "one DB writer" generalized: at local[32] nothing
    * changes, on a 1000-executor cluster it bounds concurrent inserts.
    * Postgres URLs take the [[PgStats]] dialect path (jsonb DDL +
    * `?::jsonb` insert casts); everything else uses Spark's generic JDBC
    * writer (Derby, the tests' live engine, maps StringType itself).
    */
  def writeBatch(df: DataFrame, url: String, table: String,
      numPartitions: Int = 8): Unit = {
    val capped =
      if (df.rdd.getNumPartitions > numPartitions) df.coalesce(numPartitions)
      else df
    if (PgStats.isPostgres(url)) PgStats.writeBatch(capped, url, table)
    else capped.write.mode("append").jdbc(url, table,
      new java.util.Properties())
  }

  /** Postgres dialect adapter for the stats table. The reference's
    * `stats` table stores the 15-field z payload in a `jsonb` column
    * (`entries.js:120-151` nests it; `stream_insert_db.js:153` declares
    * `stats:json` in the pg-promise ColumnSet). Spark's generic JDBC
    * writer can express NEITHER side of that: `createTableColumnTypes`
    * only parses Catalyst types (no JSONB), and its prepared INSERT
    * sends the payload as a plain VARCHAR parameter, which Postgres
    * rejects against a jsonb column without an explicit cast. So the pg
    * leg owns both: it creates the table with JSONB DDL and inserts
    * partition-parallel through plain JDBC with a `?::jsonb`
    * placeholder cast — the pg-promise `:json` equivalent, and the same
    * executor-side multi-row addBatch wire shape Spark's writer uses.
    * Exercised by JdbcSinkSpec against a recording pgjdbc-shaped driver
    * double (no Postgres server or driver jar exists in this
    * container); the Derby path stays on Spark's writer and is
    * exercised live.
    */
  object PgStats {
    def isPostgres(url: String): Boolean = url.startsWith("jdbc:postgresql:")

    /** (column, pg DDL type, insert placeholder) — the
      * [[statsTableRows]] shape in declaration order.
      */
    val columns: Seq[(String, String, String)] = Seq(
      ("ts_ms", "BIGINT", "?"),
      ("server", "VARCHAR(256)", "?"),
      ("service", "VARCHAR(256)", "?"),
      ("lag", "INT", "?"),
      ("tpm", "DOUBLE PRECISION", "?"),
      ("stats_json", "JSONB", "?::jsonb"))

    def ddl(table: String): String =
      columns.map { case (n, t, _) => s"$n $t" }
        .mkString(s"CREATE TABLE IF NOT EXISTS $table (", ", ", ")")

    /** The cast placeholders a STATS-shaped upsert needs under Postgres
      * (currently just `stats_json -> ?::jsonb`), for
      * [[JdbcSink.upsertBatch]]'s per-call `placeholders` — scoped to
      * callers that actually write this shape instead of inferred from
      * bare column names.
      */
    val placeholderMap: Map[String, String] =
      columns.collect { case (n, _, p) if p != "?" => n -> p }.toMap

    def insertSql(table: String): String =
      s"INSERT INTO $table (${columns.map(_._1).mkString(", ")}) " +
        s"VALUES (${columns.map(_._3).mkString(", ")})"

    /** Ensure-DDL once (driver-side, idempotent), then insert each
      * partition as one batched prepared statement on its own
      * connection + transaction — the reference's multi-row insert
      * (stream_insert_db.js:295-327), executor-parallel. The caller
      * ([[JdbcSink.writeBatch]]) has already capped the partition count,
      * which bounds the connection fan-in.
      *
      * Delivery semantics: AT-LEAST-ONCE under task retry, the same
      * contract as Spark's own `df.write.jdbc` append — each partition
      * commits independently, so a task that fails AFTER its commit
      * re-inserts that partition's rows when Spark retries it. A failed
      * (uncommitted) batch is explicitly rolled back before the
      * connection closes. Exactly-once belongs to the layer above: the
      * streaming requeue wrapper replays whole micro-batches, and the
      * reference accepts the same duplicate window
      * (stream_insert_db.js:295-327 has no dedup key either). Sinks
      * fronting a non-replayable consumer use [[JdbcSink.upsertBatch]]
      * instead — keyed idempotence closes the window.
      */
    def writeBatch(df: DataFrame, url: String, table: String): Unit = {
      require(df.columns.toSeq == columns.map(_._1),
        s"pg stats writer expects columns ${columns.map(_._1)}, " +
          s"got ${df.columns.toSeq}")
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        val st = conn.createStatement()
        try { st.executeUpdate(ddl(table)); () } finally st.close()
      } finally conn.close()
      val sql = insertSql(table)
      val n = columns.size
      df.foreachPartition { (rows: Iterator[Row]) =>
        if (rows.hasNext) {
          val c = java.sql.DriverManager.getConnection(url)
          try {
            c.setAutoCommit(false)
            val ps = c.prepareStatement(sql)
            try {
              rows.foreach { r =>
                var i = 0
                while (i < n) {
                  if (r.isNullAt(i)) ps.setObject(i + 1, null)
                  else ps.setObject(i + 1, r.get(i))
                  i += 1
                }
                ps.addBatch()
              }
              ps.executeBatch()
              c.commit()
            } catch {
              case e: Throwable =>
                // explicit rollback rather than relying on close() to
                // discard the open transaction — drivers differ on
                // close-with-pending-tx behavior; swallow ANY rollback
                // failure (suppressed, not just SQLException) so the
                // original batch error is what the task reports
                try c.rollback() catch {
                  case scala.util.control.NonFatal(r) => e.addSuppressed(r)
                }
                throw e
            } finally ps.close()
          } finally c.close()
        }
      }
    }
  }

  /** Keyed IDEMPOTENT upsert — the exactly-once variant of
    * [[writeBatch]] for sinks fronting non-replayable consumers. Each
    * partition runs delete-then-insert on its key set inside ONE
    * transaction (the portable upsert: no MERGE/ON CONFLICT dialect
    * divergence between Derby, the live test engine, and Postgres), so
    * any replay — a task retried after its commit, or a whole
    * micro-batch replayed by the requeue wrapper after a partial
    * failure — converges to exactly one row per key instead of
    * appending duplicates.
    *
    * Contract: the target table exists (the append path's auto-create
    * belongs to Spark's writer; an upsert's key columns are schema
    * design, not inference), and keys are unique WITHIN a batch (true
    * for every keyed frame here, e.g. stats rows on (ts_ms, server,
    * service, lag)). Because the deletes all run before the inserts, an
    * in-batch duplicate key would silently survive as two inserted rows
    * — the exact corruption this writer exists to prevent — so the
    * contract is ENFORCED batch-wide: rows are hash-partitioned on the
    * key columns (which also co-locates each key's delete+insert in one
    * transaction — two partitions never race on the same key), and each
    * partition tracks its key tuples and throws on a repeat before
    * anything commits.
    *
    * Key columns must be NON-NULL: the keyed delete uses `k = ?`, and
    * SQL three-valued logic makes `k = NULL` match nothing — a null key
    * would silently reopen the duplicate window on replay, so the
    * writer rejects it loudly instead. The target should carry an
    * index (normally the primary key) on the key columns: the keyed
    * delete is then a point lock, whereas on an unindexed heap each
    * partition's delete full-scans and concurrent partition
    * transactions can deadlock on row locks (observed under Derby).
    *
    * `placeholders` maps column name -> insert placeholder for columns
    * that need a typed cast against the target dialect (e.g. the stats
    * table's `?::jsonb` payload under Postgres — see
    * [[PgStats.placeholderMap]]). Scoped PER CALL rather than inferred
    * from the URL + bare column names, so a different table that merely
    * shares a column name never inherits the cast.
    *
    * `onPartitionCommit` is a post-commit hook (partitionId => Unit)
    * used by the fault-injection spec to stage the committed-then-failed
    * replay window; production callers leave the default no-op.
    */
  /** The keyed-delete statement [[upsertBatch]] prepares — factored so
    * the dialect-sensitive statement TEXT is pinnable in a spec even
    * where the dialect's engine isn't installable (the Postgres
    * `?::jsonb` branch has no live engine in this environment).
    */
  private[streaming] def upsertDeleteSql(table: String,
      keyCols: Seq[String]): String =
    s"DELETE FROM $table WHERE " +
      keyCols.map(k => s"$k = ?").mkString(" AND ")

  /** The insert statement [[upsertBatch]] prepares, with per-column
    * placeholder overrides applied (e.g. `?::jsonb`).
    */
  private[streaming] def upsertInsertSql(table: String, cols: Seq[String],
      placeholders: Map[String, String]): String =
    s"INSERT INTO $table (${cols.mkString(", ")}) " +
      s"VALUES (${cols.map(c => placeholders.getOrElse(c, "?")).mkString(", ")})"

  def upsertBatch(df: DataFrame, url: String, table: String,
      keyCols: Seq[String], numPartitions: Int = 8,
      placeholders: Map[String, String] = Map.empty,
      onPartitionCommit: Int => Unit = _ => ()): Unit = {
    val cols = df.columns.toSeq
    require(keyCols.nonEmpty && keyCols.forall(cols.contains),
      s"key columns $keyCols must be a subset of ${cols}")
    // Key-hash repartition (not coalesce): bounds the connection fan-in
    // AND makes the duplicate-key guard batch-complete — a key split
    // across partitions would bypass a partition-local seen-set, and
    // under READ COMMITTED two concurrent delete+insert transactions on
    // the same key can BOTH insert (neither delete sees the other's
    // uncommitted row), so co-locating each key is a correctness move,
    // not a tuning one.
    val capped = df.repartition(numPartitions,
      keyCols.map(org.apache.spark.sql.functions.col): _*)
    val delSql = upsertDeleteSql(table, keyCols)
    val insSql = upsertInsertSql(table, cols, placeholders)
    val keyIdx = keyCols.map(cols.indexOf)
    val n = cols.size
    capped.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val c = java.sql.DriverManager.getConnection(url)
        try {
          c.setAutoCommit(false)
          val del = c.prepareStatement(delSql)
          val ins = c.prepareStatement(insSql)
          // In-batch key uniqueness is enforced, not just documented:
          // all deletes run before all inserts, so a repeated key would
          // silently insert twice. The key-hash repartition above makes
          // this per-partition set batch-complete (every occurrence of
          // a key lands in one partition).
          val seen = new java.util.HashSet[Seq[Any]]()
          try {
            rows.foreach { r =>
              var i = 0
              while (i < keyIdx.size) {
                if (r.isNullAt(keyIdx(i)))
                  throw new IllegalArgumentException(
                    s"upsert key column ${cols(keyIdx(i))} is null — " +
                      "a null key cannot be matched by the keyed delete " +
                      "and would duplicate on replay")
                del.setObject(i + 1, r.get(keyIdx(i))); i += 1
              }
              val keyTuple = keyIdx.map(r.get)
              if (!seen.add(keyTuple))
                throw new IllegalArgumentException(
                  s"duplicate upsert key ${keyCols.zip(keyTuple)} within " +
                    "one batch — deletes run before inserts, so the " +
                    "repeat would silently persist as two rows")
              del.addBatch()
              i = 0
              while (i < n) {
                if (r.isNullAt(i)) ins.setObject(i + 1, null)
                else ins.setObject(i + 1, r.get(i))
                i += 1
              }
              ins.addBatch()
            }
            del.executeBatch()
            ins.executeBatch()
            c.commit()
          } catch {
            case e: Throwable =>
              try c.rollback() catch {
                case scala.util.control.NonFatal(r) => e.addSuppressed(r)
              }
              throw e
          } finally { del.close(); ins.close() }
        } finally c.close()
        onPartitionCommit(org.apache.spark.TaskContext.getPartitionId())
      }
    }
  }

  /** The `stats`-table row shape (stream_insert_db.js:149-160): flat
    * identity/measure columns + the 15 z-score fields as ONE json
    * string column, exactly the reference's jsonb payload.
    */
  def statsTableRows(cand: DataFrame): DataFrame =
    cand.select(
      col("ts_ms"), col("server"), col("service"),
      col("lag").cast("int").as("lag"), col("tpm"),
      graft.operators.Alerts.statsJsonCol.as("stats_json"))

  /** Streaming JDBC sink with the reference's failed-batch requeue:
    * park-and-replay around `writeBatch`. A flaky/downed DB parks the
    * micro-batch; the next trigger replays parked batches in batch-id
    * order before the current one — nothing dropped, order preserved
    * (stream_insert_db.js:339-353 semantics, crash-safe).
    */
  def sinkToJdbc(df: DataFrame, url: String, table: String,
      checkpoint: String, parkDir: String,
      availableNow: Boolean = true, trigger: String = "5 seconds")
      : StreamingQuery =
    ApmStreaming.sinkWithRequeue(df, checkpoint, parkDir,
      (batch, _) => writeBatch(batch, url, table),
      availableNow = availableNow, trigger = trigger)

  /** [[sinkToJdbc]] with the idempotent [[upsertBatch]] writer: the
    * requeue wrapper's whole-batch replays (and Spark's own task
    * retries) converge instead of duplicating — exactly-once by keyed
    * idempotence.
    *
    * Migration note for pre-round-13 callers: in-batch duplicate keys
    * now THROW instead of silently inserting twice (the contract
    * [[upsertBatch]] documents), and dialect-typed insert casts are no
    * longer inferred from the URL — a Postgres stats-shaped sink must
    * pass `placeholders = PgStats.placeholderMap` explicitly to keep
    * its `?::jsonb` payload cast.
    */
  def sinkToJdbcUpsert(df: DataFrame, url: String, table: String,
      keyCols: Seq[String], checkpoint: String, parkDir: String,
      availableNow: Boolean = true, trigger: String = "5 seconds",
      placeholders: Map[String, String] = Map.empty)
      : StreamingQuery =
    ApmStreaming.sinkWithRequeue(df, checkpoint, parkDir,
      (batch, _) => upsertBatch(batch, url, table, keyCols,
        placeholders = placeholders),
      availableNow = availableNow, trigger = trigger)
}
