package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Correlation operators — the joins hidden inside the reference's parser
  * (SURVEY.md §2.3).
  *
  * - J1 entry<->exit pairing: the parser caches the entry line of a
  *   (logId, service) pair and completes it from the exit line, dropping
  *   entries unmatched after a 120 s TTL and salvaging unmatched exits as
  *   incomplete records (stream_parse_transactions.js:211-218,392-446,
  *   469-565). Batch form: exits LEFT JOIN entries on the key with the
  *   TTL as a time-range predicate — matched rows get the entry start,
  *   exit-only rows emit with null start (the salvage path); entry-only
  *   rows disappear (the TTL-expiry drop).
  * - J2 acctNum enrichment: left-outer join to the account map with
  *   missing keys emitted as '' (stream_parse_transactions.js:226-239).
  * - J3/J4-style small-dimension lookups are broadcast joins.
  *
  * Scale notes: J1 is an equi-join on (log_id, service) with a residual
  * range predicate — Catalyst plans a shuffled hash/sort-merge join on the
  * equi-keys (never a cartesian). J2's dimension side is `customer`-sized
  * -> broadcast, no shuffle of the fact side. At 100 TB the J1 shuffle is
  * the unavoidable pairing shuffle; bucketing both sides on log_id would
  * remove it for repeated runs.
  */
object Correlation {

  val TtlMs = 120000L

  /** Entry/exit streams derived from events per FIXTURES.md: every event
    * is an exit (end_ms, elapsed); events with user_id%7 != 0 also produced
    * an observable entry line (start_ms = end_ms - elapsed) — the %7 drop
    * models entries lost to log truncation, exercising the salvage path.
    */
  def pairing(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val base = ev.select(
      col("event_id").as("log_id"),
      col("event_type").as("service"),
      Tables.tsMillis(ev).as("end_ms"),
      col("value").as("elapsed"),
      col("user_id"))
    val exits = base.select("log_id", "service", "end_ms", "elapsed")
    val entries = base.filter(pmod(col("user_id"), lit(7)) =!= 0)
      .select(col("log_id"), col("service"),
        (col("end_ms") - ceil(col("elapsed")).cast("long")).as("start_ms"))
    exits.join(entries, Seq("log_id", "service"), "left")
      .withColumn("start_ms",
        when(col("end_ms").between(col("start_ms"), col("start_ms") + TtlMs),
          col("start_ms")))
      .select(col("log_id"), col("service"), col("start_ms"), col("end_ms"),
        col("elapsed"),
        when(col("start_ms").isNull, lit("N")).otherwise(lit("Y")).as("complete"))
  }

  val pairingSql: String =
    s"""WITH base AS (
          SELECT event_id AS log_id, event_type AS service,
            epoch_ms(ts) AS end_ms, value AS elapsed, user_id
          FROM events),
        exits AS (SELECT log_id, service, end_ms, elapsed FROM base),
        entries AS (
          SELECT log_id, service,
            end_ms - CAST(ceil(elapsed) AS BIGINT) AS start_ms
          FROM base WHERE user_id % 7 <> 0)
        SELECT x.log_id, x.service,
          CASE WHEN x.end_ms BETWEEN e.start_ms AND e.start_ms + $TtlMs
               THEN e.start_ms END AS start_ms,
          x.end_ms, x.elapsed AS elapsed,
          CASE WHEN (CASE WHEN x.end_ms BETWEEN e.start_ms AND e.start_ms + $TtlMs
                          THEN e.start_ms END) IS NULL
               THEN 'N' ELSE 'Y' END AS complete
        FROM exits x LEFT JOIN entries e
          ON x.log_id = e.log_id AND x.service = e.service"""

  /** J2 — left-outer enrichment with '' for missing keys. The account map
    * is a thinned customer dimension (c_custkey%4=0 dropped) so some
    * orders go unenriched, exercising the TTL-expiry '' emission.
    */
  def enrichment(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.load(spark, sfDir, "orders")
    val acctMap = Tables.load(spark, sfDir, "customer")
      .filter(pmod(col("c_custkey"), lit(4)) =!= 0)
      .select(col("c_custkey"), col("c_name"))
    orders.join(broadcast(acctMap), col("o_custkey") === col("c_custkey"), "left")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        coalesce(col("c_name"), lit("")).as("acct_name"))
  }

  val enrichmentSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice,
         coalesce(c_name, '') AS acct_name
       FROM orders LEFT JOIN
         (SELECT c_custkey, c_name FROM customer WHERE c_custkey % 4 <> 0) c
         ON o_custkey = c_custkey"""

  /** J3-style small-map lookup chain as broadcast joins:
    * customer -> nation -> region with region-level aggregation.
    */
  def dimLookup(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.load(spark, sfDir, "customer")
    val n = broadcast(Tables.load(spark, sfDir, "nation"))
    val r = broadcast(Tables.load(spark, sfDir, "region"))
    c.join(n, col("c_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_customers"),
        round(sum(col("c_acctbal")), 2).as("sum_acctbal"))
  }

  val dimLookupSql: String =
    """SELECT r_name, count(*) AS n_customers,
         round(sum(c_acctbal), 2) AS sum_acctbal
       FROM customer
       JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       GROUP BY r_name"""
}
