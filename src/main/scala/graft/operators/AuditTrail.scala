package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable
import graft.Tables

/** P7 — the audit-trail multi-line state machine
  * (stream_parse_transactions.js:567-731), plus the P2-style id->logId
  * lookup map (J3, :579-621): an order-sensitive parse over a stream of
  * log lines, keyed per source file.
  *
  * Reference behavior reproduced:
  *  - `INFO  auditTrailId=<id>` lines map autrId -> logId (the bracket
  *    token), entry deleted after use (:579-591,615-616);
  *  - `Audit Trail id : <id>` opens a block and resolves the logId
  *    (:593-617);
  *  - inside a block, `<svc> :[<n> millis]` elapsed-section entries
  *    append (service, elapsed) — repeated services FIFO (:624-652);
  *  - `]` closes the section and emits one record per entry (:648-652).
  *
  * Spark-first shape: lines are grouped per file and folded in line-number
  * order (`groupByKey(file).flatMapGroups` with an ordered scan) — the
  * batch analogue of the per-file `flatMapGroupsWithState` streaming
  * machine. Files are independent -> the fold distributes per file across
  * executors; state is O(open block) not O(file).
  */
object AuditTrail {

  case class AuditRecord(file: String, log_id: String, service: String,
      elapsed: Long)

  private val idMapRe = """.*INFO  auditTrailId=(\S+).*""".r
  private val bracketRe = """^\[([^\]]*)\].*""".r
  private val openRe = """^Audit Trail id *: *(\S+).*""".r
  private val elapsedRe = """^\s*(\S+) :\[(\d+) millis\].*""".r

  /** The pure per-file machine: lazy ordered scan -> records. Emits
    * incrementally (Iterator.flatMap is ordered and lazy) — state is the
    * open block + pending id map, not the file or its output.
    */
  def runMachine(file: String, lines: Iterator[String]): Iterator[AuditRecord] = {
    val idMap = mutable.Map.empty[String, String]   // autrId -> logId
    var openLogId: Option[String] = None
    lines.flatMap {
      case l @ idMapRe(autrId) =>
        l match {
          case bracketRe(logId) => idMap(autrId) = logId
          case _ =>
        }
        Nil
      case openRe(autrId) =>
        openLogId = idMap.remove(autrId) // delete-after-use (J3)
        Nil
      case elapsedRe(svc, n) if openLogId.isDefined =>
        AuditRecord(file, openLogId.get, svc, n.toLong) :: Nil
      case l if l.startsWith("]") =>
        openLogId = None
        Nil
      case _ => Nil
    }
  }

  /** Synthesize reference-shaped audit-trail line blocks from `events`
    * (deterministic in both engines), run the real state machine, and
    * emit the parsed records. Each event becomes one 4-line block; the
    * expected output is therefore directly computable in SQL — the oracle
    * proves the machine parses order-sensitively and correctly.
    */
  def parseAuditTrails(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.load(spark, sfDir, "events")
    val base = ev.select(
      concat(lit("/net/srv"), pmod(col("user_id"), lit(3)),
        lit("/log/server.log")).as("file"),
      col("event_id"), col("event_type"),
      ceil(col("value")).cast("long").as("elapsed_int"))
    val lines = base.select(col("file"), col("event_id"),
      array(
        concat(lit("[L"), col("event_id"), lit("] 2024-01-07 10:00:00,000 INFO  auditTrailId=AUTR"), col("event_id"), lit(" more")),
        concat(lit("Audit Trail id : AUTR"), col("event_id")),
        concat(lit("  "), col("event_type"), lit(" :["), col("elapsed_int"), lit(" millis] blah")),
        lit("]")).as("ls"))
      .select(col("file"), col("event_id"), posexplode(col("ls")))
      .select(col("file"), (col("event_id") * 10 + col("pos")).as("line_no"),
        col("col").as("line"))
    // Repartition by file + Tungsten sort + one streaming pass per
    // partition (files change mid-iterator; the machine restarts per
    // file) — never buffers a whole file, same scale-safe fold shape as
    // the other sequential recurrences.
    lines.as[(String, Long, String)]
      .repartition(spark.sparkContext.defaultParallelism, col("file"))
      .sortWithinPartitions("file", "line_no")
      .mapPartitions { it =>
        val b = it.buffered
        new Iterator[AuditRecord] {
          private var cur: Iterator[AuditRecord] = Iterator.empty
          private def advance(): Unit =
            while (!cur.hasNext && b.hasNext) {
              val file = b.head._1
              val fileLines = new Iterator[String] {
                def hasNext = b.hasNext && b.head._1 == file
                def next() = b.next()._3
              }
              cur = runMachine(file, fileLines)
            }
          def hasNext = { advance(); cur.hasNext }
          def next() = { advance(); cur.next() }
        }
      }
      .toDF("file", "log_id", "service", "elapsed")
  }

  val parseAuditTrailsSql: String =
    """SELECT '/net/srv' || CAST(user_id % 3 AS VARCHAR) || '/log/server.log' AS file,
         'L' || CAST(event_id AS VARCHAR) AS log_id,
         event_type AS service,
         CAST(ceil(value) AS BIGINT) AS elapsed
       FROM events"""
}
