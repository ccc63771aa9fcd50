package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._

/** Driver contract — every implemented operator from SURVEY.md §2 is
  * registered here as `(SparkSession, sfDir) => DataFrame` with (where
  * SQL-expressible) an equivalent DuckDB oracle query in [[oracleSql]].
  * Column names are aligned between both sides (the driver sorts columns
  * by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full APM chain: bucketize -> sliding stats (exact percentiles).
    */
  def entry(spark: SparkSession): DataFrame =
    ApmStats.slidingStats(spark, "/root/testdata/sf0.001")
      .filter(col("n") > 0)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a1_bucketize"     -> ((s, dir) => ApmStats.bucketize(s, dir)),
    "a5_sliding_stats" -> ((s, dir) => ApmStats.slidingStats(s, dir)),
    "q1_agg"           -> ((s, dir) => tpchQ1(s, dir)),
  )

  /** DuckDB-dialect oracle for each query (same parquet tables). */
  def oracleSql: Map[String, String] = Map(
    "a1_bucketize"     -> ApmStats.bucketizeSql,
    "a5_sliding_stats" -> ApmStats.slidingStatsSql(),
    // Rounding note: whole-table float sums accumulate order-dependent
    // error ~1e-5 at sf0.01, so compare at 2 decimals (inputs are 2-dp
    // money values -> true sum is a 2-dp value, 0.005 from any boundary).
    "q1_agg"           -> """SELECT l_returnflag, l_linestatus,
        round(sum(l_quantity), 2) AS sum_qty,
        round(sum(l_extendedprice), 2) AS sum_base_price,
        count(*) AS count_order
        FROM lineitem GROUP BY l_returnflag, l_linestatus""",
  ).map { case (k, v) => k -> v.replaceAll("\\s+", " ").trim }

  /** TPC-H Q1-style pricing summary — the relational-aggregation smoke
    * query (predicate/column pruning reach the parquet scan).
    */
  private def tpchQ1(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        count(lit(1)).as("count_order"))
}
