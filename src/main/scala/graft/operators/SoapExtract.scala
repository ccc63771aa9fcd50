package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** P2 — the SOAP account-number extractor
  * (stream_parse_transactions.js:294-376): a per-file ordered scan where
  * an `IO=I` marker line carries the logId and *subsequent* lines carry
  * the `<accountNumber>` (or the riskid two-line `<key>AccountNumber
  * </key>` + `<value>` variant) — emitting (logId -> acctNum) pairs.
  *
  * Same per-file ordered-fold shape as [[AuditTrail]]: independent files
  * distribute across executors, state is O(1) (the pending logId).
  */
object SoapExtract {

  case class AcctPair(file: String, log_id: String, acct_num: String)

  private val ioRe = """^=== jbossId=(\S+).*IO=I.*""".r
  private val acctRe = """(?i).*<accountnumber>([^<]*)</accountnumber>.*""".r
  private val keyRe = """.*<key>AccountNumber</key>.*""".r
  private val valRe = """.*<value>([^<]*)</value>.*""".r

  /** The pure per-file machine (ordered lines -> pairs). Only numeric
    * account numbers emit (P10 validation, :296-297).
    */
  def runMachine(file: String, lines: Iterator[String]): Iterator[AcctPair] = {
    var pending: Option[String] = None
    var keySeen = false
    lines.flatMap {
      case ioRe(logId) => pending = Some(logId); keySeen = false; Nil
      case acctRe(acct) =>
        if (pending.isDefined && acct.matches("^[0-9]+$")) {
          val p = AcctPair(file, pending.get, acct)
          pending = None
          p :: Nil
        } else Nil
      case keyRe() => keySeen = true; Nil
      case valRe(acct) =>
        val out =
          if (keySeen && pending.isDefined && acct.matches("^[0-9]+$")) {
            val p = AcctPair(file, pending.get, acct)
            pending = None
            p :: Nil
          } else Nil
        keySeen = false
        out
      case _ => Nil
    }
  }

  /** Synthesize soap_io-shaped line sequences from `events` (even ids use
    * the direct tag, odd ids the riskid two-line variant; user_id%5==0
    * events carry a non-numeric acct that must be rejected), run the
    * machine, emit pairs. The expected output is directly computable in
    * SQL -> the oracle checks both extraction variants and the numeric
    * filter.
    */
  def extractPairs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.loadSpread(spark, sfDir, "events")
    val base = ev.select(
      concat(lit("/net/srv"), pmod(col("user_id"), lit(3)),
        lit("/log/soap_io.log")).as("file"),
      col("event_id"), col("user_id"),
      when(pmod(col("user_id"), lit(5)) === 0, lit("ACCT-BAD"))
        .otherwise((col("user_id") * 31 + 7).cast("string")).as("acct"))
    val lines = base.select(col("file"), col("event_id"),
      when(col("event_id") % 2 === 0,
        array(
          concat(lit("=== jbossId=L"), col("event_id"), lit(" ts=x IO=I rest")),
          concat(lit("  <soap><accountNumber>"), col("acct"), lit("</accountNumber></soap>"))))
        .otherwise(array(
          concat(lit("=== jbossId=L"), col("event_id"), lit(" ts=x IO=I rest")),
          lit("  <key>AccountNumber</key>"),
          concat(lit("  <value>"), col("acct"), lit("</value>")))).as("ls"))
      .select(col("file"), col("event_id"), posexplode(col("ls")))
      .select(col("file"), (col("event_id") * 10 + col("pos")).as("line_no"),
        col("col").as("line"))
    // Same streaming per-file fold shape as AuditTrail: repartition by
    // file, Tungsten sort, one lazy pass (state = pending logId only).
    lines.as[(String, Long, String)]
      .repartition(spark.sparkContext.defaultParallelism, col("file"))
      .sortWithinPartitions("file", "line_no")
      .mapPartitions { it =>
        val b = it.buffered
        new Iterator[AcctPair] {
          private var cur: Iterator[AcctPair] = Iterator.empty
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
      .toDF("file", "log_id", "acct_num")
  }

  val extractPairsSql: String =
    """SELECT '/net/srv' || CAST(user_id % 3 AS VARCHAR) || '/log/soap_io.log' AS file,
         'L' || CAST(event_id AS VARCHAR) AS log_id,
         CAST(user_id * 31 + 7 AS VARCHAR) AS acct_num
       FROM events
       WHERE user_id % 5 <> 0"""
}
