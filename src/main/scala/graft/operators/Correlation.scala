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

  /** AS-OF join — enrich each event with the key's most recent order at
    * or before the event time (the canonical point-in-time lookup Spark
    * has no native operator for; DuckDB's native ASOF JOIN is the
    * oracle).
    *
    * Spark-first formulation: tag and UNION both sides, then one window
    * per key ordered by (ms, side) carrying the last non-null right
    * attributes forward — right rows sort before left rows at equal ms,
    * giving ASOF's inclusive `l.ms >= r.ms` semantics. ONE shuffle on
    * the key, linear in |L|+|R|; the naive alternative (range theta-join
    * + per-left max) re-meets every left row with every earlier right
    * row of its key — quadratic per hot key. Right side is deduplicated
    * to one row per (key, ms) first (greatest orderkey wins) so the
    * match is deterministic on both engines.
    */
  def asofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.load(spark, sfDir, "events")
    val left = ev.select(col("user_id").as("k"),
      Tables.tsMillis(ev).as("ms"), col("event_id"),
      lit(1).as("is_l"),
      lit(null).cast("long").as("o_orderkey"),
      lit(null).cast("double").as("o_totalprice"))
    val ord0 = Tables.load(spark, sfDir, "orders")
    val dedupW = Window.partitionBy("k", "ms").orderBy(col("o_orderkey").desc)
    val right = ord0.select((col("o_custkey") % 150).as("k"),
        Tables.colMillis(ord0, "o_orderdate").as("ms"),
        col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(dedupW))
      .filter(col("rn") === 1)
      .select(col("k"), col("ms"),
        lit(null).cast("long").as("event_id"), lit(0).as("is_l"),
        col("o_orderkey"), col("o_totalprice"))
    val w = Window.partitionBy("k").orderBy(col("ms"), col("is_l"))
      .rowsBetween(Window.unboundedPreceding, 0)
    left.unionByName(right)
      .withColumn("asof_orderkey",
        last(col("o_orderkey"), ignoreNulls = true).over(w))
      .withColumn("asof_totalprice",
        last(col("o_totalprice"), ignoreNulls = true).over(w))
      .filter(col("is_l") === 1)
      .select(col("event_id"), col("k").as("user_id"), col("ms"),
        col("asof_orderkey"), col("asof_totalprice"))
  }

  val asofJoinSql: String =
    """WITH l AS (SELECT user_id AS k, epoch_ms(ts) AS ms, event_id
          FROM events),
        r AS (SELECT k, ms, o_orderkey, o_totalprice FROM (
            SELECT o_custkey % 150 AS k, epoch_ms(o_orderdate) AS ms,
              o_orderkey, o_totalprice,
              row_number() OVER (PARTITION BY o_custkey % 150,
                epoch_ms(o_orderdate) ORDER BY o_orderkey DESC) AS rn
            FROM orders) WHERE rn = 1)
        SELECT l.event_id, l.k AS user_id, l.ms,
          r.o_orderkey AS asof_orderkey, r.o_totalprice AS asof_totalprice
        FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.ms >= r.ms"""
}
