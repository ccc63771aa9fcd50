package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Skew mitigation by key salting — the standard two-phase treatment for
  * hot keys that would otherwise pin one reducer (the APM workload's
  * version: one chatty service dominating the (server, service) key
  * space; AQE's skew-join handles joins at runtime, but *aggregation*
  * skew with non-algebraic payloads still wants explicit salting).
  *
  * Phase 1 groups on (key, salt) — the hot key's rows spread over
  * `saltBuckets` reducers, each producing a partial (count, sum, sorted
  * values). Phase 2 merges the partials per key. For the exact-percentile
  * payload the merge is a flatten+sort of per-salt sorted lists — the
  * same (order-insensitive) multiset the unsalted path produces, so the
  * result is identical and DuckDB-verifiable against the *unsalted*
  * formulation.
  */
object Salting {

  val SaltBuckets = 16

  /** Per-service elapsed stats (count, mean, p75, p95) computed with a
    * salted two-phase aggregation. Results equal the direct groupBy —
    * the oracle states the unsalted form.
    */
  def saltedServiceStats(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.RefStats
    val base = Tables.txBase(spark, sfDir)
      // deterministic salt (not rand()): spreads rows, reproducible
      .withColumn("salt", pmod(col("log_id"), lit(SaltBuckets)))
    val partial = base.groupBy("service", "salt")
      .agg(count(lit(1)).as("cnt"),
        sort_array(collect_list(col("elapsed"))).as("vals"))
    partial.groupBy("service")
      .agg(sum(col("cnt")).as("n"),
        sort_array(flatten(collect_list(col("vals")))).as("sorted"))
      .select(col("service"), col("n"),
        RefStats.arrayMean(col("sorted")).as("average"),
        RefStats.refPercentile(col("sorted"), 0.75).as("per75"),
        RefStats.refPercentile(col("sorted"), 0.95).as("per95"))
  }

  /** Oracle: the plain unsalted aggregation — identical results prove
    * the salted plan's correctness.
    */
  val saltedServiceStatsSql: String = {
    import graft.functions.RefStats
    val mean = RefStats.arrayMeanSql("sorted")
    val p75 = RefStats.refPercentileSql("sorted", "0.75")
    val p95 = RefStats.refPercentileSql("sorted", "0.95")
    s"""SELECT service, n, $mean AS average, $p75 AS per75, $p95 AS per95
        FROM (SELECT service, count(*) AS n,
                list_sort(list(elapsed)) AS sorted
              FROM (${Tables.txBaseSql})
              GROUP BY service)"""
  }
}
