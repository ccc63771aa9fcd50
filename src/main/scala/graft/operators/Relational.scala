package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** TPC-H-style relational queries exercising the join shapes the APM
  * suite doesn't: left-semi (existential), left-anti (absence + scalar
  * subquery), left-outer with residual predicate, correlated per-group
  * average (as a window), and group-HAVING semi join. The star schema
  * lacks partsupp and comment/date columns, so each query is the
  * nearest expressible variant of its TPC-H namesake.
  *
  * Float-parity policy (ARCHITECTURE.md): money arithmetic is lifted to
  * exact integer grains — `floor(x*100 + 0.5)` — summed order-free as
  * integers and divided back to a double exactly once at the end, so
  * results are bit-identical across engines at any scale and need no
  * rounding tolerance. `l_quantity`/`c_acctbal` sums stay exact because
  * the values are integral / 2-dp grains.
  */
object Relational {

  /** revenue grain: 2-dp price x 2-dp (1-discount) as exact 1e-4 units */
  private def revGrain: Column =
    (floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long") *
      floor((lit(1) - col("l_discount")) * 100 + lit(0.5)).cast("long"))

  private val revGrainSql =
    "CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) * CAST(floor((1-l_discount)*100 + 0.5) AS BIGINT)"

  private val day90Ms = 90L * 86400000L

  /** Q4-style order-priority check: orders with at least one line shipped
    * more than 90 days after the order date (the schema has no
    * commit/receipt dates), counted per priority. The EXISTS is a
    * LEFT-SEMI join — equi on the order key with the lateness predicate
    * as a residual, so each order is emitted at most once without a
    * post-join distinct.
    */
  def q4Semi(spark: SparkSession, sfDir: String): DataFrame = {
    val ord0 = Tables.load(spark, sfDir, "orders")
    val ord = ord0.select(col("o_orderkey"), col("o_orderpriority"),
      Tables.colMillis(ord0, "o_orderdate").as("o_date_ms"))
    val li0 = Tables.load(spark, sfDir, "lineitem")
    val li = li0.select(col("l_orderkey"),
      Tables.colMillis(li0, "l_shipdate").as("l_ship_ms"))
    ord.join(li,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_ship_ms") > col("o_date_ms") + day90Ms,
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
  }

  val q4SemiSql: String =
    s"""SELECT o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND epoch_ms(l.l_shipdate) > epoch_ms(o.o_orderdate) + $day90Ms)
        GROUP BY o_orderpriority"""

  /** Q5-style local-supplier revenue: one region's nations, revenue from
    * lineitems where the supplier sits in the customer's own nation.
    * Dimension chain (region -> nation -> broadcast) prunes the customer
    * scan; the only shuffles are the two fact joins; supplier broadcasts
    * with the co-nation equality as part of the join condition.
    */
  def q5RegionRev(spark: SparkSession, sfDir: String,
      region: String = "ASIA"): DataFrame = {
    val nat = Tables.load(spark, sfDir, "nation")
      .join(broadcast(Tables.load(spark, sfDir, "region")
        .filter(col("r_name") === region)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val cust = Tables.load(spark, sfDir, "customer")
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
    val ord = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val sup = Tables.load(spark, sfDir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))
    Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), revGrain.as("grain"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup),
        col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
      .groupBy("n_name")
      .agg((sum(col("grain")) / lit(10000.0)).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  def q5RegionRevSql(region: String = "ASIA"): String =
    s"""SELECT n_name,
        sum($revGrainSql) / 10000.0 AS revenue,
        count(*) AS n_lines
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = '$region'
        GROUP BY n_name"""

  /** Q7-style volume shipping: revenue flowing between two nations by
    * ship year, with the nation dimension playing TWO roles (supplier's
    * nation and customer's nation) — the dual-role dimension join. Both
    * dimension chains broadcast; the only shuffles are the two fact
    * joins; the year comes from calendar extraction under the UTC
    * session (identical integers cross-engine).
    */
  def q7Volume(spark: SparkSession, sfDir: String,
      n1: String = "NATION_1", n2: String = "NATION_2"): DataFrame = {
    val li0 = Tables.load(spark, sfDir, "lineitem")
    val li = li0.select(col("l_orderkey"), col("l_suppkey"),
      revGrain.as("grain"),
      year(timestamp_millis(Tables.colMillis(li0, "l_shipdate")))
        .cast("long").as("l_year"))
    val nat = Tables.load(spark, sfDir, "nation")
      .filter(col("n_name").isin(n1, n2))
      .select(col("n_nationkey"), col("n_name"))
    val sup = Tables.load(spark, sfDir, "supplier")
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Tables.load(spark, sfDir, "customer")
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val ord = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .filter((col("supp_nation") === n1 && col("cust_nation") === n2) ||
        (col("supp_nation") === n2 && col("cust_nation") === n1))
      .groupBy("supp_nation", "cust_nation", "l_year")
      .agg((sum(col("grain")) / lit(10000.0)).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  def q7VolumeSql(n1: String = "NATION_1", n2: String = "NATION_2"): String =
    s"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
          CAST(year(l_shipdate) AS BIGINT) AS l_year,
          sum($revGrainSql) / 10000.0 AS revenue, count(*) AS n_lines
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        WHERE (sn.n_name = '$n1' AND cn.n_name = '$n2')
           OR (sn.n_name = '$n2' AND cn.n_name = '$n1')
        GROUP BY sn.n_name, cn.n_name, year(l_shipdate)"""

  /** Q8-style market share: one nation's fraction of a region's
    * revenue in one part type, by order year — the conditional-sum
    * ratio over a pruned star. Part-type filter, region membership
    * (left-semi on customers), and the supplier→nation name lookup all
    * broadcast; the only shuffles are the two fact joins. The share is
    * one double division of two exact long grain sums, so the ratio is
    * bit-identical cross-engine.
    */
  def q8MktShare(spark: SparkSession, sfDir: String,
      region: String = "ASIA", nation: String = "NATION_9",
      ptype: String = "PROMO"): DataFrame = {
    val part = Tables.load(spark, sfDir, "part")
      .filter(col("p_type") === ptype).select(col("p_partkey"))
    val regionCust = Tables.load(spark, sfDir, "customer")
      .join(broadcast(Tables.load(spark, sfDir, "nation")
        .join(broadcast(Tables.load(spark, sfDir, "region")
          .filter(col("r_name") === region)),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"))),
        col("c_nationkey") === col("n_nationkey"), "left_semi")
      .select(col("c_custkey"))
    val ord0 = Tables.load(spark, sfDir, "orders")
    val ord = ord0
      .join(regionCust, col("o_custkey") === col("c_custkey"), "left_semi")
      .select(col("o_orderkey"),
        year(timestamp_millis(Tables.colMillis(ord0, "o_orderdate")))
          .cast("long").as("o_year"))
    val supNat = Tables.load(spark, sfDir, "supplier")
      .join(broadcast(Tables.load(spark, sfDir, "nation")
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        revGrain.as("grain"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supNat), col("l_suppkey") === col("s_suppkey"))
      .groupBy("o_year")
      .agg(
        sum(when(col("supp_nation") === nation, col("grain")).otherwise(0L))
          .as("nation_grain"),
        sum(col("grain")).as("total_grain"),
        count(lit(1)).as("n_lines"))
      .select(col("o_year"),
        (col("nation_grain") / col("total_grain")).as("mkt_share"),
        (col("total_grain") / lit(10000.0)).as("total_revenue"),
        col("n_lines"))
  }

  def q8MktShareSql(region: String = "ASIA", nation: String = "NATION_9",
      ptype: String = "PROMO"): String =
    s"""SELECT o_year, nation_grain * 1.0 / total_grain AS mkt_share,
          total_grain / 10000.0 AS total_revenue, n_lines
        FROM (
          SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
            CAST(sum(CASE WHEN n_name = '$nation' THEN $revGrainSql
                     ELSE 0 END) AS BIGINT) AS nation_grain,
            CAST(sum($revGrainSql) AS BIGINT) AS total_grain,
            count(*) AS n_lines
          FROM lineitem
          JOIN part ON l_partkey = p_partkey
          JOIN orders ON l_orderkey = o_orderkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          WHERE p_type = '$ptype'
            AND o_custkey IN (
              SELECT c_custkey FROM customer
              JOIN nation cn ON c_nationkey = cn.n_nationkey
              JOIN region ON cn.n_regionkey = r_regionkey
              WHERE r_name = '$region')
          GROUP BY year(o_orderdate))"""

  /** Q12-style late-shipment priority mix: among lines shipped more
    * than 90 days after their order date, how many belong to
    * critical-priority orders vs the rest, per return flag — the
    * conditional-count-after-fact-join shape. Both sides are facts, so
    * the equi-join shuffles on the order key with the lateness
    * predicate as a residual; the priority CASE folds into the partial
    * aggregation (map-side combine before the final 3-row result).
    */
  def q12Priority(spark: SparkSession, sfDir: String): DataFrame = {
    val ord0 = Tables.load(spark, sfDir, "orders")
    val ord = ord0.select(col("o_orderkey"), col("o_orderpriority"),
      Tables.colMillis(ord0, "o_orderdate").as("o_date_ms"))
    val li0 = Tables.load(spark, sfDir, "lineitem")
    val li = li0.select(col("l_orderkey"), col("l_returnflag"),
      Tables.colMillis(li0, "l_shipdate").as("l_ship_ms"))
    val crit = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    li.join(ord,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_ship_ms") > col("o_date_ms") + day90Ms)
      .groupBy("l_returnflag")
      .agg(
        sum(when(crit, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(crit, 0L).otherwise(1L)).as("low_line_count"))
  }

  val q12PrioritySql: String =
    s"""SELECT l_returnflag,
          CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                   THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
          CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                   THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE epoch_ms(l_shipdate) > epoch_ms(o_orderdate) + $day90Ms
        GROUP BY l_returnflag"""

  /** Q14-style promotion revenue share: the fraction of one month's
    * revenue from PROMO-type parts. Part dimension broadcasts; the date
    * range pushes to the lineitem scan; both sums are exact revenue
    * grains, so the percentage is two exact integers through one double
    * multiply/divide — bit-identical cross-engine.
    */
  def q14Promo(spark: SparkSession, sfDir: String): DataFrame = {
    val lo = 820454400000L // 1996-01-01
    val hi = 823132800000L // 1996-02-01
    val li0 = Tables.load(spark, sfDir, "lineitem")
    val part = Tables.load(spark, sfDir, "part")
      .select(col("p_partkey"), col("p_type"))
    li0.filter(Tables.tsRange(li0, "l_shipdate", Some(lo), Some(hi)))
      .select(col("l_partkey"), revGrain.as("grain"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", col("grain")).otherwise(0L))
          .as("promo_grain"),
        sum(col("grain")).as("total_grain"),
        count(lit(1)).as("n_lines"))
      .select(
        (lit(100.0) * col("promo_grain") / col("total_grain"))
          .as("promo_share_pct"),
        (col("total_grain") / lit(10000.0)).as("total_revenue"),
        col("n_lines"))
  }

  val q14PromoSql: String =
    s"""SELECT 100.0 * promo_grain / total_grain AS promo_share_pct,
          total_grain / 10000.0 AS total_revenue, n_lines
        FROM (
          SELECT
            CAST(sum(CASE WHEN p_type = 'PROMO' THEN $revGrainSql
                     ELSE 0 END) AS BIGINT) AS promo_grain,
            CAST(sum($revGrainSql) AS BIGINT) AS total_grain,
            count(*) AS n_lines
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE epoch_ms(l_shipdate) >= 820454400000
            AND epoch_ms(l_shipdate) < 823132800000)"""

  /** Q15-style top supplier(s): per-supplier revenue over a quarter,
    * keep every supplier achieving the maximum (ties kept, like the
    * view+subquery formulation). The max runs as a window over the
    * |suppliers| aggregated rows — never corpus rows — and revenue
    * compares as exact integer grains, so the equality predicate is
    * exact.
    */
  def q15TopSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val lo = 820454400000L // 1996-01-01
    val hi = 828316800000L // 1996-04-01
    val li0 = Tables.load(spark, sfDir, "lineitem")
    val perSup = li0
      .filter(Tables.tsRange(li0, "l_shipdate", Some(lo), Some(hi)))
      .select(col("l_suppkey"), revGrain.as("grain"))
      .groupBy("l_suppkey").agg(sum(col("grain")).as("rev_grain"))
    val withMax = perSup.withColumn("max_grain",
      max(col("rev_grain")).over(Window.partitionBy(lit(1))))
    withMax.filter(col("rev_grain") === col("max_grain"))
      .join(broadcast(Tables.load(spark, sfDir, "supplier")
        .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        (col("rev_grain") / lit(10000.0)).as("total_rev"))
  }

  val q15TopSupplierSql: String =
    s"""WITH per AS (
          SELECT l_suppkey, CAST(sum($revGrainSql) AS BIGINT) AS rev_grain
          FROM lineitem
          WHERE epoch_ms(l_shipdate) >= 820454400000
            AND epoch_ms(l_shipdate) < 828316800000
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, rev_grain / 10000.0 AS total_rev
        FROM per JOIN supplier ON l_suppkey = s_suppkey
        WHERE rev_grain = (SELECT max(rev_grain) FROM per)"""

  /** Q19-style disjunctive predicate revenue: an OR of brand/size/
    * quantity conjunct groups (the classic disjunctive-pushdown shape —
    * the part-side disjuncts reach the part scan via CNF conversion,
    * the mixed quantity conjuncts stay residual on the equi-join).
    */
  def q19Disjunct(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_partkey"), col("l_quantity"), revGrain.as("grain"))
    val part = Tables.load(spark, sfDir, "part")
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    val cond =
      (col("p_brand") === "Brand#13" && col("p_size").between(1, 10) &&
        col("l_quantity").between(1, 15)) ||
      (col("p_brand") === "Brand#20" && col("p_size").between(10, 25) &&
        col("l_quantity").between(10, 30)) ||
      (col("p_brand") === "Brand#9" && col("p_size").between(20, 50) &&
        col("l_quantity").between(20, 40))
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .filter(cond)
      .agg((sum(col("grain")) / lit(10000.0)).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  val q19DisjunctSql: String =
    s"""SELECT sum($revGrainSql) / 10000.0 AS revenue, count(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 1 AND 15)
           OR (p_brand = 'Brand#20' AND p_size BETWEEN 10 AND 25
               AND l_quantity BETWEEN 10 AND 30)
           OR (p_brand = 'Brand#9' AND p_size BETWEEN 20 AND 50
               AND l_quantity BETWEEN 20 AND 40)"""

  /** Q10-style returned-item report: per-customer revenue lost to
    * returns in a half-year window. Date range pushes into the orders
    * scan; customer/nation broadcast.
    */
  def q10Returns(spark: SparkSession, sfDir: String): DataFrame = {
    val lo = 820454400000L // 1996-01-01
    val hi = 836179200000L // 1996-07-01
    val ord0 = Tables.load(spark, sfDir, "orders")
    val ord = ord0
      .filter(Tables.tsRange(ord0, "o_orderdate", Some(lo), Some(hi)))
      .select(col("o_orderkey"), col("o_custkey"))
    val cust = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
    val nat = Tables.load(spark, sfDir, "nation")
      .select(col("n_nationkey"), col("n_name"))
    Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), revGrain.as("grain"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name")
      .agg((sum(col("grain")) / lit(10000.0)).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  val q10ReturnsSql: String =
    s"""SELECT c_custkey, c_name, n_name,
        sum($revGrainSql) / 10000.0 AS revenue,
        count(*) AS n_lines
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND epoch_ms(o_orderdate) >= 820454400000
          AND epoch_ms(o_orderdate) < 836179200000
        GROUP BY c_custkey, c_name, n_name"""

  /** Q13-style customer order-count distribution: LEFT OUTER join with
    * the priority exclusion on the build side (equivalent to the ON-
    * clause residual), count(o_orderkey) skipping the null-extended
    * rows, then the distribution over counts. Two shuffles (custkey,
    * then c_count) — both on aggregated rows.
    */
  def q13OuterDist(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.load(spark, sfDir, "customer").select("c_custkey")
    val ord = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select(col("o_custkey"), col("o_orderkey"))
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
  }

  val q13OuterDistSql: String =
    """SELECT c_count, count(*) AS custdist FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer
        LEFT JOIN (SELECT o_custkey, o_orderkey FROM orders
                   WHERE o_orderpriority <> '1-URGENT') o
          ON c_custkey = o_custkey
        GROUP BY c_custkey) GROUP BY c_count"""

  /** Q17-style small-quantity revenue per brand: the correlated
    * per-part average-quantity subquery is a WINDOW over the part key —
    * one shuffle on l_partkey instead of TPC-H's aggregate-then-
    * self-join (which would scan lineitem twice). Exact parity:
    * quantities are integral, so the windowed avg is sum/count of
    * exact doubles — identical in both engines.
    */
  def q17AvgSub(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("l_partkey")
    val part = Tables.load(spark, sfDir, "part")
      .select(col("p_partkey"), col("p_brand"))
    Tables.load(spark, sfDir, "lineitem")
      .select(col("l_partkey"), col("l_quantity"),
        floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long").as("pgrain"))
      .withColumn("qavg", avg(col("l_quantity")).over(w))
      .filter(col("l_quantity") < lit(0.2) * col("qavg"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      // sum(price)/7.0 in 1e-2 grains: divide once by 700
      .agg((sum(col("pgrain")) / lit(700.0)).as("avg_yearly"),
        count(lit(1)).as("n_lines"))
  }

  val q17AvgSubSql: String =
    """SELECT p_brand,
        sum(pgrain) / 700.0 AS avg_yearly,
        count(*) AS n_lines
        FROM (
          SELECT l_partkey, l_quantity,
            CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) AS pgrain,
            avg(l_quantity) OVER (PARTITION BY l_partkey) AS qavg
          FROM lineitem)
        JOIN part ON l_partkey = p_partkey
        WHERE l_quantity < 0.2 * qavg
        GROUP BY p_brand"""

  /** Q18-style large-volume orders: group-HAVING on the fact table
    * produces a tiny key set that then drives broadcast semi joins back
    * through orders and customer — the aggregate result, not the fact
    * table, crosses the wire.
    */
  def q18Having(spark: SparkSession, sfDir: String,
      minQty: Double = 300.0): DataFrame = {
    val big = Tables.load(spark, sfDir, "lineitem")
      .groupBy("l_orderkey")
      .agg(sum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > minQty)
    val ord0 = Tables.load(spark, sfDir, "orders")
    val ord = ord0.select(col("o_orderkey"), col("o_custkey"),
      Tables.colMillis(ord0, "o_orderdate").as("o_orderdate_ms"),
      col("o_totalprice"))
    val cust = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_name"))
    ord.join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select("c_name", "c_custkey", "o_orderkey", "o_orderdate_ms",
        "o_totalprice", "sum_qty")
  }

  def q18HavingSql(minQty: Double = 300.0): String =
    s"""SELECT c_name, c_custkey, o_orderkey,
        epoch_ms(o_orderdate) AS o_orderdate_ms, o_totalprice, sum_qty
        FROM (SELECT l_orderkey, sum(l_quantity) AS sum_qty FROM lineitem
              GROUP BY l_orderkey HAVING sum(l_quantity) > $minQty) big
        JOIN orders ON o_orderkey = big.l_orderkey
        JOIN customer ON c_custkey = o_custkey"""

  /** Q22-style dormant-value customers: above-average balance and no
    * urgent orders, per nation. The global average is a 1-row broadcast
    * cross join (scalar subquery); absence is a LEFT-ANTI join against
    * the urgent-order keys. Balances compare and sum as exact 1e-2
    * grains.
    */
  def q22Anti(spark: SparkSession, sfDir: String): DataFrame = {
    val grain = floor(col("c_acctbal") * 100 + lit(0.5)).cast("long")
    val cust = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_nationkey"), grain.as("bal_grain"))
    val avgDf = cust.filter(col("bal_grain") > 0)
      .agg((sum(col("bal_grain")) / count(lit(1))).as("avg_grain"))
    // distinct before the anti join: identical semantics (NOT EXISTS),
    // but the build side shrinks from urgent-order rows to distinct
    // custkeys (map-side combinable) before it crosses the wire
    val urgent = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey")).distinct()
    val nat = Tables.load(spark, sfDir, "nation")
      .select(col("n_nationkey"), col("n_name"))
    cust.crossJoin(broadcast(avgDf))
      .filter(col("bal_grain") > col("avg_grain"))
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("numcust"),
        (sum(col("bal_grain")) / lit(100.0)).as("totacctbal"))
  }

  /** Keyless RANGE join via interval block-bucketing — "how many
    * lineitems shipped inside each promotion window" where the windows
    * share no equi key with the fact table. The naive form is a pure
    * interval theta-join (a nested-loop/cartesian at scale); the scale
    * shape blocks time into `blockMs` buckets, explodes each interval to
    * the blocks it covers (bounded: interval/block + 1 rows), and
    * equi-joins on the block with the range as a residual — a hash join
    * whose fan-out is |intervals| x blocks-per-interval, independent of
    * fact-table size. A fact row's single block meets each window at
    * most once, so no post-join dedup is needed. The DuckDB oracle keeps
    * the naive theta form — same result, proving the rewrite.
    */
  def q20RangeJoin(spark: SparkSession, sfDir: String,
      nWins: Int = 20, winMs: Long = 30L * 86400000L,
      blockMs: Long = 86400000L): DataFrame = {
    val ord0 = Tables.load(spark, sfDir, "orders")
    val wins = ord0.filter(col("o_orderkey") < nWins)
      .select(col("o_orderkey").as("win_id"),
        Tables.colMillis(ord0, "o_orderdate").as("lo"))
      .withColumn("hi", col("lo") + winMs)
    val winBlocks = wins.withColumn("block",
      explode(sequence(expr(s"lo div $blockMs"), expr(s"(hi - 1) div $blockMs"))))
    val li0 = Tables.load(spark, sfDir, "lineitem")
    val li = li0.select(Tables.colMillis(li0, "l_shipdate").as("ms"),
        col("l_quantity"))
      .withColumn("block", expr(s"ms div $blockMs"))
    li.join(broadcast(winBlocks), Seq("block"))
      .filter(col("ms") >= col("lo") && col("ms") < col("hi"))
      .groupBy("win_id", "lo", "hi")
      .agg(count(lit(1)).as("n_items"), sum(col("l_quantity")).as("sum_qty"))
  }

  def q20RangeJoinSql(nWins: Int = 20, winMs: Long = 30L * 86400000L): String =
    s"""WITH wins AS (
          SELECT o_orderkey AS win_id, epoch_ms(o_orderdate) AS lo,
            epoch_ms(o_orderdate) + $winMs AS hi
          FROM orders WHERE o_orderkey < $nWins)
        SELECT win_id, lo, hi, count(*) AS n_items,
          sum(l_quantity) AS sum_qty
        FROM lineitem JOIN wins
          ON epoch_ms(l_shipdate) >= lo AND epoch_ms(l_shipdate) < hi
        GROUP BY win_id, lo, hi"""

  /** ROLLUP aggregation — the multi-level grouping-sets shape (per
    * (flag, status), per flag, grand total in ONE pass: Catalyst expands
    * the grouping sets before the exchange, so partial aggregation still
    * applies). Quantities are integral => sums exact on both engines.
    */
  def qRollup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n_lines"), sum(col("l_quantity")).as("sum_qty"),
        grouping_id().cast("long").as("gid"))

  val qRollupSql: String =
    """SELECT l_returnflag, l_linestatus,
        count(*) AS n_lines, sum(l_quantity) AS sum_qty,
        CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)"""

  /** CUBE aggregation — all four grouping sets of (server, service) in
    * ONE pass (per-pair, per-server, per-service, grand total). Like
    * [[qRollup]], Catalyst expands the sets BEFORE the exchange so
    * map-side partial aggregation still applies — at 100 TB the shuffle
    * carries |servers×services| × 4 partial rows per partition, not
    * 4× the corpus. Elapsed is lifted to an exact 1e-2 grain so the
    * per-set sums are order-free.
    */
  def qCube(spark: SparkSession, sfDir: String): DataFrame =
    graft.Tables.txBase(spark, sfDir)
      .select(col("server"), col("service"),
        floor(col("elapsed") * 100 + lit(0.5)).cast("long").as("el_grain"))
      .cube("server", "service")
      .agg(count(lit(1)).as("n"),
        (sum(col("el_grain")) / lit(100.0)).as("sum_elapsed"),
        grouping_id().cast("long").as("gid"))

  val qCubeSql: String =
    s"""SELECT server, service, count(*) AS n,
        sum(CAST(floor(elapsed*100 + 0.5) AS BIGINT))
          / CAST(100.0 AS DOUBLE) AS sum_elapsed,
        CAST(grouping(server) * 2 + grouping(service) AS BIGINT) AS gid
        FROM (${graft.Tables.txBaseSql})
        GROUP BY CUBE (server, service)"""

  /** PIVOT — long-to-wide reshape (per-service event counts by server).
    * Spark's `pivot` with an explicit value list keeps the schema static
    * (no extra distinct-values job) and compiles to a single groupBy
    * with conditional aggregates — which is exactly the oracle's
    * CASE-sum formulation. Absent combinations coalesce to 0.
    */
  def qPivot(spark: SparkSession, sfDir: String): DataFrame = {
    val servers = Seq("srv0", "srv1", "srv2")
    graft.Tables.txBase(spark, sfDir)
      .groupBy("service")
      .pivot("server", servers)
      .agg(count(lit(1)))
      .select(col("service") +: servers.map(s =>
        coalesce(col(s), lit(0L)).as(s)): _*)
  }

  val qPivotSql: String =
    s"""SELECT service,
        CAST(sum(CASE WHEN server = 'srv0' THEN 1 ELSE 0 END) AS BIGINT) AS srv0,
        CAST(sum(CASE WHEN server = 'srv1' THEN 1 ELSE 0 END) AS BIGINT) AS srv1,
        CAST(sum(CASE WHEN server = 'srv2' THEN 1 ELSE 0 END) AS BIGINT) AS srv2
        FROM (${graft.Tables.txBaseSql})
        GROUP BY service"""

  val q22AntiSql: String =
    """SELECT n_name, count(*) AS numcust,
        sum(bal_grain) / 100.0 AS totacctbal
        FROM (SELECT c_custkey, c_nationkey,
                CAST(floor(c_acctbal*100 + 0.5) AS BIGINT) AS bal_grain
              FROM customer) c
        JOIN nation ON c_nationkey = n_nationkey
        WHERE bal_grain > (SELECT sum(bal_grain * 1.0) / count(*)
                           FROM (SELECT CAST(floor(c_acctbal*100 + 0.5) AS BIGINT)
                                 AS bal_grain FROM customer) x
                           WHERE bal_grain > 0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderpriority = '1-URGENT')
        GROUP BY n_name"""

  /** Q2-style correlated-min subquery — per group (p_brand), the minimum
    * revenue grain over its lineitems and the supplier achieving it
    * (deterministic min suppkey on ties), joined back for the supplier
    * name. The classic argmin-with-join-back: ONE pass computes the
    * per-group min as a struct-max trick (min over (grain, suppkey)
    * pairs — no second scan, no self-join), then only the |groups|-row
    * result joins the supplier dim (broadcast). TPC-H Q2 runs the same
    * shape over partsupp; this schema's price source is lineitem.
    */
  def q2MinCost(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"), revGrain.as("grain"))
    val part = Tables.load(spark, sfDir, "part")
      .select(col("p_partkey"), col("p_brand"))
    val best = li.join(part, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(min(struct(col("grain"), col("l_suppkey"))).as("best"))
      .select(col("p_brand"), col("best.grain").as("min_grain"),
        col("best.l_suppkey").as("s_suppkey"))
    best.join(broadcast(Tables.load(spark, sfDir, "supplier")
        .select(col("s_suppkey"), col("s_name"))), Seq("s_suppkey"))
      .select(col("p_brand"), (col("min_grain") / 1e4).as("min_rev"),
        col("s_suppkey"), col("s_name"))
  }

  val q2MinCostSql: String =
    s"""WITH priced AS (
          SELECT p_brand, l_suppkey, $revGrainSql AS grain
          FROM lineitem JOIN part ON l_partkey = p_partkey),
        best AS (
          SELECT p_brand, min(grain) AS min_grain
          FROM priced GROUP BY p_brand),
        argmin AS (
          SELECT b.p_brand, b.min_grain,
            min(p.l_suppkey) AS s_suppkey
          FROM best b JOIN priced p
            ON p.p_brand = b.p_brand AND p.grain = b.min_grain
          GROUP BY b.p_brand, b.min_grain)
        SELECT p_brand, min_grain / 1e4 AS min_rev, s_suppkey, s_name
        FROM argmin JOIN supplier USING (s_suppkey)"""

  /** Q11-style group-vs-global HAVING — per part-type revenue kept only
    * when it exceeds a FRACTION OF THE WHOLE CORPUS total (TPC-H Q11's
    * `having sum(...) > (select sum(...) * fraction)`). The global
    * scalar is the same aggregation reduced once more and broadcast —
    * never a second scan of the fact table: one pass computes per-type
    * grains, the scalar derives from those |types| rows.
    */
  def q11ScalarHaving(spark: SparkSession, sfDir: String,
      fraction: Double = 0.04): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_partkey"), revGrain.as("grain"))
    val part = Tables.load(spark, sfDir, "part")
      .select(col("p_partkey"), col("p_type"))
    val perType = li.join(part, col("l_partkey") === col("p_partkey"))
      .groupBy("p_type").agg(sum("grain").as("type_grain"))
    val total = perType.agg(sum("type_grain").as("total_grain"))
    perType.crossJoin(broadcast(total))
      .filter(col("type_grain") > col("total_grain") * fraction)
      .select(col("p_type"), (col("type_grain") / 1e4).as("type_rev"),
        (col("type_grain").cast("double") / col("total_grain"))
          .as("share"))
  }

  def q11ScalarHavingSql(fraction: Double = 0.04): String =
    s"""WITH per AS (
          SELECT p_type, CAST(sum($revGrainSql) AS BIGINT) AS type_grain
          FROM lineitem JOIN part ON l_partkey = p_partkey
          GROUP BY p_type),
        tot AS (SELECT CAST(sum(type_grain) AS BIGINT) AS total_grain
                FROM per)
        SELECT p_type, type_grain / 1e4 AS type_rev,
          CAST(type_grain AS DOUBLE) / total_grain AS share
        FROM per, tot
        WHERE type_grain > total_grain * $fraction"""

  /** Q9-style product-type profit: per (supplier nation, order year),
    * revenue minus cost for lines whose part name matches a substring.
    * The schema has no partsupp, so `p_retailprice` stands in for
    * `ps_supplycost` — same join/agg shape as TPC-H Q9. Profit stays in
    * the exact 1e-4 integer grain until one final division: the revenue
    * grain is already 1e-4 units and the cost side is
    * cents(retailprice) x qty x 100. Part (name-filtered) and
    * supplier->nation broadcast; the only shuffle joins are the two
    * fact-fact edges (lineitem-orders) and the final 2-col groupBy.
    */
  def q9Profit(spark: SparkSession, sfDir: String,
      namePart: String = "bolt"): DataFrame = {
    val part = Tables.load(spark, sfDir, "part")
      .filter(col("p_name").contains(namePart))
      .select(col("p_partkey"),
        floor(col("p_retailprice") * 100 + lit(0.5)).cast("long")
          .as("cost_cents"))
    val supNat = Tables.load(spark, sfDir, "supplier")
      .join(broadcast(Tables.load(spark, sfDir, "nation")
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    val ord0 = Tables.load(spark, sfDir, "orders")
    val ord = ord0.select(col("o_orderkey"),
      year(timestamp_millis(Tables.colMillis(ord0, "o_orderdate")))
        .cast("long").as("o_year"))
    Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        revGrain.as("rev_grain"), col("l_quantity").cast("long").as("qty"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supNat), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("nation", "o_year")
      .agg((sum(col("rev_grain") - col("cost_cents") * col("qty") * lit(100L))
          / lit(10000.0)).as("profit"),
        count(lit(1)).as("n_lines"))
  }

  def q9ProfitSql(namePart: String = "bolt"): String =
    s"""SELECT n_name AS nation,
          CAST(year(o_orderdate) AS BIGINT) AS o_year,
          sum($revGrainSql
              - CAST(floor(p_retailprice*100 + 0.5) AS BIGINT)
                * CAST(l_quantity AS BIGINT) * 100) / 10000.0 AS profit,
          count(*) AS n_lines
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        WHERE p_name LIKE '%$namePart%'
        GROUP BY n_name, year(o_orderdate)"""

  /** Q16-style supplier-relationship count: distinct suppliers able to
    * supply each (brand, type, size) bucket, excluding a brand, a type
    * prefix, and blacklisted suppliers (negative balance stands in for
    * TPC-H's comment-flagged "customer complaints" — NOT IN becomes a
    * broadcast LEFT ANTI join). The part-supplier catalog derives from
    * lineitem (no partsupp table); no pre-distinct is needed because
    * count(DISTINCT suppkey) dedups inside the aggregation's own
    * partial/final two-phase shuffle.
    */
  def q16SupplierCnt(spark: SparkSession, sfDir: String,
      excludeBrand: String = "Brand#17", excludeTypePrefix: String = "SMALL",
      sizes: Seq[Int] = Seq(2, 5, 11, 28, 29, 37, 42, 50)): DataFrame = {
    val part = Tables.load(spark, sfDir, "part")
      .filter(col("p_brand") =!= excludeBrand &&
        !col("p_type").startsWith(excludeTypePrefix) &&
        col("p_size").isin(sizes: _*))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    val badSup = Tables.load(spark, sfDir, "supplier")
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    Tables.load(spark, sfDir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(badSup), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  def q16SupplierCntSql(excludeBrand: String = "Brand#17",
      excludeTypePrefix: String = "SMALL",
      sizes: Seq[Int] = Seq(2, 5, 11, 28, 29, 37, 42, 50)): String =
    s"""SELECT p_brand, p_type, p_size,
          count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> '$excludeBrand'
          AND p_type NOT LIKE '$excludeTypePrefix%'
          AND p_size IN (${sizes.mkString(",")})
          AND NOT EXISTS (
            SELECT 1 FROM supplier
            WHERE s_suppkey = l_suppkey AND s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size"""

  private val meltCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  /** Wide-to-long melt: the four lineitem measures unpivot into
    * (metric, value) rows — the reshape every metrics pipeline needs
    * before generic per-metric processing (the reference's wide `jx`
    * row vs its long `stats` rows is exactly this tension). Spark's
    * native `unpivot` runs as a per-row Expand (no shuffle, no UDF);
    * the only exchange is the final |metrics|-group aggregate, which
    * map-combines to |metrics| rows per partition at any scale. Values
    * are lifted to exact 1e-2 integer grains BEFORE the melt so the
    * per-metric sums are order-free and bit-identical cross-engine.
    */
  def q24Unpivot(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey") +: meltCols.map(c =>
        floor(col(c) * 100 + lit(0.5)).cast("long").as(c)): _*)
    li.unpivot(Array(col("l_orderkey")),
        meltCols.map(col).toArray, "metric", "grain")
      .groupBy("metric")
      .agg(count(lit(1)).as("n"),
        sum("grain").as("sum_grain"))
      .select(col("metric"), col("n"),
        (col("sum_grain") / lit(100.0)).as("total"),
        (col("sum_grain") / lit(100.0) / col("n")).as("mean"))
  }

  val q24UnpivotSql: String = {
    val arms = meltCols.map(c =>
      s"""SELECT '$c' AS metric,
          CAST(floor($c*100 + 0.5) AS BIGINT) AS grain FROM lineitem""")
      .mkString(" UNION ALL ")
    s"""SELECT metric, count(*) AS n,
          sum(grain) / CAST(100.0 AS DOUBLE) AS total,
          sum(grain) / CAST(100.0 AS DOUBLE) / count(*) AS mean
        FROM ($arms)
        GROUP BY metric"""
  }

  /** Q26 — latest-record-wins compaction (CDC/upsert semantics): collapse
    * the events change stream to one current row per (user_id,
    * event_type), "latest" by (ts, event_id) with the id as the
    * deterministic tie-break. The lakehouse MERGE/compaction primitive.
    *
    * Implemented with `max_by` over a packed ordering struct rather than
    * a row_number window: ONE map-side-combinable aggregation — partial
    * max per input split collapses each split to a row per key BEFORE
    * the exchange, where the window formulation must shuffle every raw
    * change row and sort full key histories. (Struct payloads make the
    * final step a SortAggregate — a grouping-key sort over the already-
    * collapsed rows, not the raw history; the shuffle-volume reduction
    * is the scale property.) `max_by` keys on the struct's
    * lexicographic order, so (ms, event_id) gives exactly the window
    * formulation's ordering.
    */
  def q26Compaction(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    ev.select(col("user_id"), col("event_type"), col("event_id"),
        Tables.tsMillis(ev).as("ms"), col("value"))
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n_versions"),
        max_by(struct(col("event_id"), col("ms"), col("value")),
          struct(col("ms"), col("event_id"))).as("latest"))
      .select(col("user_id"), col("event_type"), col("n_versions"),
        col("latest.event_id").as("event_id"),
        col("latest.ms").as("ms"),
        col("latest.value").as("value"))
  }

  /** Q29 — the TPC-H Q21 "waiting supplier" shape: for each supplier,
    * count the multi-supplier orders where THIS supplier shipped late
    * (ship > orderdate + 90 d, the schema's lateness proxy) and no
    * OTHER supplier in the order did — a correlated EXISTS and a
    * correlated NOT EXISTS against the same table in one query (the
    * oracle keeps that declared form).
    *
    * Shape (r15): the semi + anti self-join pair evaluated the
    * lineitem x orders join THREE times (candidate side + each join's
    * probe side) and shuffled it twice more. Both correlations only ask
    * per-ORDER census questions, so one window pass over the joined
    * frame answers them with a single evaluation and a single shuffle
    * (guide §3 self-join elimination):
    *   EXISTS other supplier          <=> |distinct suppliers| > 1
    *   NOT EXISTS other LATE supplier <=> |distinct late suppliers| = 1
    * (the candidate row is itself late, so "no other late" means the
    * late-supplier set is exactly {this supplier}). Multiplicity is
    * preserved — every candidate ROW either survives both original
    * joins or both window predicates — so numwait is bit-identical.
    */
  def q29WaitingSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val li0 = Tables.load(spark, sfDir, "lineitem")
    val ord0 = Tables.load(spark, sfDir, "orders")
    val li = li0.select(col("l_orderkey"), col("l_suppkey"),
      Tables.colMillis(li0, "l_shipdate").as("ship_ms"))
    val ord = ord0.select(col("o_orderkey"),
      Tables.colMillis(ord0, "o_orderdate").as("odate_ms"))
    val withLate = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .withColumn("late",
        (col("ship_ms") > col("odate_ms") + day90Ms).cast("int"))
      .select("l_orderkey", "l_suppkey", "late")
    val wOrd = Window.partitionBy("l_orderkey")
    withLate
      .withColumn("n_supp",
        size(collect_set(col("l_suppkey")).over(wOrd)))
      .withColumn("n_late_supp",
        size(collect_set(when(col("late") === 1, col("l_suppkey"))).over(wOrd)))
      .filter(col("late") === 1 && col("n_supp") > 1 &&
        col("n_late_supp") === 1)
      .groupBy(col("l_suppkey").as("s_suppkey"))
      .agg(count(lit(1)).as("numwait"))
  }

  val q29WaitingSupplierSql: String =
    s"""WITH l AS (
          SELECT l_orderkey, l_suppkey,
            CAST(epoch_ms(l_shipdate) >
              epoch_ms(o_orderdate) + $day90Ms AS INT) AS late
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        SELECT l_suppkey AS s_suppkey, count(*) AS numwait
        FROM l l1
        WHERE l1.late = 1
          AND EXISTS (SELECT 1 FROM l l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM l l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.late = 1)
        GROUP BY l_suppkey"""

  /** Q28 — relational set operations: the customer populations ordering
    * in consecutive years compared with INTERSECT (retained), EXCEPT
    * (churned / newly acquired, both directions) and UNION (either
    * year), reported as one count row. Spark plans INTERSECT as a
    * left-semi join and EXCEPT as a left-anti join over the distinct
    * key sets — no dedicated operator needed, which is the point:
    * declared set algebra, executed as keyed joins.
    */
  def q28SetOps(spark: SparkSession, sfDir: String): DataFrame = {
    val ord0 = Tables.load(spark, sfDir, "orders")
    val base = ord0.select(col("o_custkey"),
      year(timestamp_millis(Tables.colMillis(ord0, "o_orderdate"))).as("y"))
    def yr(y: Int) = base.filter(col("y") === y).select("o_custkey").distinct()
    val (a, b) = (yr(1996), yr(1997))
    a.intersect(b).agg(count(lit(1)).as("retained"))
      .crossJoin(a.except(b).agg(count(lit(1)).as("churned")))
      .crossJoin(b.except(a).agg(count(lit(1)).as("acquired")))
      .crossJoin(a.union(b).distinct().agg(count(lit(1)).as("either_year")))
  }

  val q28SetOpsSql: String =
    """WITH a AS (SELECT DISTINCT o_custkey FROM orders
                  WHERE year(o_orderdate) = 1996),
        b AS (SELECT DISTINCT o_custkey FROM orders
              WHERE year(o_orderdate) = 1997)
       SELECT
         (SELECT count(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b))
           AS retained,
         (SELECT count(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b))
           AS churned,
         (SELECT count(*) FROM (SELECT * FROM b EXCEPT SELECT * FROM a))
           AS acquired,
         (SELECT count(*) FROM (SELECT * FROM a UNION SELECT * FROM b))
           AS either_year"""

  /** Q27 — the analytic window-function family in one query: per-customer
    * order sequencing with row_number, lag/lead (money on the exact 2-dp
    * integer grain), quartile ntile, percent_rank and cume_dist. Total
    * order inside each customer partition is (o_date_ms, o_orderkey) so
    * every function is deterministic; the rank-derived ratios are single
    * integer-derived divisions (bit-stable cross-engine).
    *
    * Scale: ONE shuffle on o_custkey, one sort per partition; every
    * window function shares the same frame, so Spark evaluates them in
    * a single Window operator pass.
    */
  def q27WindowSuite(spark: SparkSession, sfDir: String): DataFrame = {
    val ord0 = Tables.load(spark, sfDir, "orders")
    val w = Window.partitionBy("o_custkey").orderBy("o_date_ms", "o_orderkey")
    val wAll = Window.partitionBy("o_custkey")
    val base = ord0.select(col("o_orderkey"), col("o_custkey"),
      Tables.colMillis(ord0, "o_orderdate").as("o_date_ms"),
      floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("price_g"))
    base.select(col("o_orderkey"), col("o_custkey"), col("o_date_ms"),
        row_number().over(w).cast("long").as("seq"),
        lag(col("price_g"), 1).over(w).as("prev_price_g"),
        lead(col("price_g"), 1).over(w).as("next_price_g"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"),
        count(lit(1)).over(wAll).as("n_orders"))
  }

  val q27WindowSuiteSql: String =
    """SELECT o_orderkey, o_custkey, o_date_ms,
         CAST(row_number() OVER w AS BIGINT) AS seq,
         lag(price_g, 1) OVER w AS prev_price_g,
         lead(price_g, 1) OVER w AS next_price_g,
         CAST(ntile(4) OVER w AS INT) AS quartile,
         percent_rank() OVER w AS pct_rank,
         cume_dist() OVER w AS cume,
         CAST(count(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS n_orders
       FROM (SELECT o_orderkey, o_custkey, epoch_ms(o_orderdate) AS o_date_ms,
               CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS price_g
             FROM orders)
       WINDOW w AS (PARTITION BY o_custkey ORDER BY o_date_ms, o_orderkey)"""

  /** Oracle: the window formulation (DuckDB's arg_max cannot order by a
    * composite key) — identical results, different plan shape, which is
    * the point of the comparison.
    */
  val q26CompactionSql: String =
    """SELECT user_id, event_type, n_versions, event_id, ms, value
       FROM (
         SELECT user_id, event_type, event_id, ms, value,
           CAST(count(*) OVER (PARTITION BY user_id, event_type) AS BIGINT)
             AS n_versions,
           row_number() OVER (PARTITION BY user_id, event_type
                              ORDER BY ms DESC, event_id DESC) AS rn
         FROM (SELECT user_id, event_type, event_id, epoch_ms(ts) AS ms,
                 value FROM events))
       WHERE rn = 1"""
}
