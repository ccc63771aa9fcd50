package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Alert rules — the reference's `stream_process_alerts.js` (SURVEY.md
  * §2.6) re-expressed Spark-first.
  *
  * - R1 suppression + R2 threshold predicates are pure column expressions
  *   (DuckDB-verified). Cause strings and check order match
  *   stream_process_alerts.js:398-424: hard-max on average, hard-max on
  *   per75, then the signal-based checks (gated on hardMin ms + min tpm),
  *   with `alertOnBothOnly` collapsing the two signal causes into one.
  * - J4 config-override lookup: per-service `hardMaxMs` override applied
  *   via a broadcast join against a small config DataFrame
  *   (stream_process_alerts.js:335-346,398).
  * - R3 rolling vote counter (leaky bucket: +1 per bad interval saturating
  *   at windowSz+1, -1 per good interval floored at 0; causes only real
  *   while counter >= threshold) and R4 per-service cooldown are
  *   order-dependent folds (stream_process_alerts.js:358-392,427-467) —
  *   implemented as per-key ordered folds, property-tested (no SQL oracle
  *   for a recurrence).
  *
  * Scale notes: R1/R2/J4 stay in WholeStageCodegen (no UDFs; the config
  * join is broadcast). The R3 fold shuffles on (server, service, lag) and
  * keeps O(1) state per key; R4's cooldown is keyed on service only —
  * fewer, larger groups, but state is a single timestamp and rows stream
  * through the iterator without buffering (groups arrive sorted via
  * secondary sort within repartitioned partitions).
  */
object Alerts {

  case class AlertCfg(
      hardMaxMs: Double = 400.0,
      hardMinMs: Double = 50.0,
      hardMinTpm: Double = 0.005,
      alertOnBothOnly: Boolean = false,
      suppressedLags: Seq[Int] = Seq.empty,
      suppressedServices: Seq[String] = Seq.empty,
      windowSz: Int = 60,
      voteThreshold: Int = 45,
      cooldownMs: Long = 15 * 60 * 1000L,
      // per-service hardMaxMs overrides (config/apm_config.json:189-198)
      hardMaxOverrides: Map[String, Double] = Map.empty)

  val default: AlertCfg = AlertCfg()

  /** R1 + R2 + J4 over a z-scored frame ([[ZScore.zScoreWindowed]] schema):
    * appends candidate-cause columns and the interval's bad flag.
    */
  def candidates(fs: DataFrame, cfg: AlertCfg = default): DataFrame = {
    val spark = fs.sparkSession
    import spark.implicits._
    val ovr = cfg.hardMaxOverrides.toSeq.toDF("service", "hard_max_override")
    val withCfg = fs.join(broadcast(ovr), Seq("service"), "left")
      .withColumn("hard_max", coalesce(col("hard_max_override"), lit(cfg.hardMaxMs)))
      .drop("hard_max_override")
    val suppressed =
      (if (cfg.suppressedLags.isEmpty) lit(false) else col("lag").isin(cfg.suppressedLags: _*)) ||
      (if (cfg.suppressedServices.isEmpty) lit(false) else col("service").isin(cfg.suppressedServices: _*))
    val cAvgHard = !suppressed && col("average") > col("hard_max")
    val cP75Hard = !suppressed && col("per75") > col("hard_max")
    val sigAvg = !suppressed && col("average_signal") > 0 &&
      col("average") > cfg.hardMinMs && col("tpm") > cfg.hardMinTpm
    val sigP75 = !suppressed && col("per75_signal") > 0 &&
      col("per75") > cfg.hardMinMs && col("tpm") > cfg.hardMinTpm
    val causes =
      if (cfg.alertOnBothOnly)
        concat_ws(",",
          when(cAvgHard, "average exceeded hard ms threshold"),
          when(cP75Hard, "per75 exceeded hard ms threshold"),
          when(sigAvg && sigP75, "average and per75 UB exceeded"))
      else
        concat_ws(",",
          when(cAvgHard, "average exceeded hard ms threshold"),
          when(cP75Hard, "per75 exceeded hard ms threshold"),
          when(sigAvg, "average UB exceeded"),
          when(sigP75, "per75 UB exceeded"))
    withCfg
      .withColumn("causes", causes)
      .withColumn("bad", (col("causes") =!= "").cast("int"))
      .drop("hard_max")
  }

  /** DuckDB oracle for [[candidates]] over `fsSql` (zScoreWindowed oracle). */
  def candidatesSql(fsSql: String, cfg: AlertCfg = default): String = {
    val ovr =
      if (cfg.hardMaxOverrides.isEmpty) "SELECT NULL AS service, NULL::DOUBLE AS hard_max_override WHERE 1=0"
      else cfg.hardMaxOverrides.map { case (s, v) =>
        s"SELECT '$s' AS service, CAST($v AS DOUBLE) AS hard_max_override" }.mkString(" UNION ALL ")
    val supLag = if (cfg.suppressedLags.isEmpty) "FALSE"
      else s"lag IN (${cfg.suppressedLags.mkString(",")})"
    val supSvc = if (cfg.suppressedServices.isEmpty) "FALSE"
      else s"service IN (${cfg.suppressedServices.map("'" + _ + "'").mkString(",")})"
    val sup = s"(($supLag) OR ($supSvc))"
    val cAvgHard = s"(NOT $sup AND average > hard_max)"
    val cP75Hard = s"(NOT $sup AND per75 > hard_max)"
    val sigAvg = s"(NOT $sup AND average_signal > 0 AND average > ${cfg.hardMinMs} AND tpm > ${cfg.hardMinTpm})"
    val sigP75 = s"(NOT $sup AND per75_signal > 0 AND per75 > ${cfg.hardMinMs} AND tpm > ${cfg.hardMinTpm})"
    val causes =
      if (cfg.alertOnBothOnly)
        s"""concat_ws(',',
           CASE WHEN $cAvgHard THEN 'average exceeded hard ms threshold' END,
           CASE WHEN $cP75Hard THEN 'per75 exceeded hard ms threshold' END,
           CASE WHEN $sigAvg AND $sigP75 THEN 'average and per75 UB exceeded' END)"""
      else
        s"""concat_ws(',',
           CASE WHEN $cAvgHard THEN 'average exceeded hard ms threshold' END,
           CASE WHEN $cP75Hard THEN 'per75 exceeded hard ms threshold' END,
           CASE WHEN $sigAvg THEN 'average UB exceeded' END,
           CASE WHEN $sigP75 THEN 'per75 UB exceeded' END)"""
    s"""SELECT * EXCLUDE (hard_max),
          CASE WHEN causes <> '' THEN 1 ELSE 0 END AS bad
        FROM (
          SELECT fs.*, coalesce(o.hard_max_override, ${cfg.hardMaxMs}) AS hard_max,
            $causes AS causes
          FROM ($fsSql) fs LEFT JOIN ($ovr) o ON fs.service = o.service)"""
  }

  /** R3 + R4 + R5 — the stateful tail of the alert pipeline: leaky-bucket
    * vote counter per (server, service, lag), then per-service cooldown
    * dedup, then alert-record assembly. Input: [[candidates]] output.
    * Batch determinism: rows are processed in ts_ms order (ties: server,
    * lag) — the streaming variant processes in arrival order.
    */
  def alerts(cand: DataFrame, cfg: AlertCfg = default): DataFrame = {
    val spark = cand.sparkSession
    import spark.implicits._
    // Phase 1 (R3): per (server,service,lag) ordered fold of the counter.
    // Repartition + Tungsten sort + one streaming pass (O(1) state per
    // key, no per-group buffering — the scale-safe fold shape).
    val voted = cand.select("server", "service", "lag", "ts_ms", "bad", "causes")
      .repartition(col("server"), col("service"), col("lag"))
      .sortWithinPartitions("server", "service", "lag", "ts_ms")
      .as[(String, String, Int, Long, Int, String)]
      .mapPartitions { it =>
        var curKey: (String, String, Int) = null
        var c = 0
        it.flatMap { case (srv, svc, lag, ts, bad, causes) =>
          if (curKey == null || curKey != ((srv, svc, lag))) {
            curKey = (srv, svc, lag); c = 0
          }
          var fire = false
          if (bad == 1) {
            if (c <= cfg.windowSz) c += 1 // saturate at windowSz+1 (:374-378)
            fire = c >= cfg.voteThreshold
          } else if (c > 0) c -= 1
          if (fire) Some((srv, svc, lag, ts, causes)) else None
        }
      }
    // Phase 2 (R4): per-service cooldown on *emitted* alerts — keyed on
    // service alone (stream_process_alerts.js:449-467), rows in
    // (ts, server, lag) order.
    voted
      .repartition(col("_2"))
      .sortWithinPartitions("_2", "_4", "_1", "_3")
      .mapPartitions { it =>
        var curSvc: String = null
        var lastEmit = Long.MinValue
        it.flatMap { case (srv, svc, lag, ts, causes) =>
          if (curSvc == null || curSvc != svc) { curSvc = svc; lastEmit = Long.MinValue }
          val emit = lastEmit == Long.MinValue ||
            (ts - lastEmit) / 1000.0 > cfg.cooldownMs / 1000.0
          if (emit) { lastEmit = ts; Some((ts, srv, svc, lag, causes)) }
          else None
        }
      }
      .toDF("alert_ts_ms", "server", "service", "lag", "causes")
  }

  /** R7 — the alert-digest assembly that feeds the batch emailer
    * (stream_process_alerts.js:153-206,269-333): per flush window, the
    * distinct servers / services / lags of the window's alerting rows
    * (the reference builds its Grafana URL from exactly these lists) plus
    * the bad-interval count. Daily windows over candidate rows keep the
    * digest non-empty regardless of the vote threshold.
    */
  def digest(cand: DataFrame): DataFrame =
    cand.filter(col("bad") === 1)
      .withColumn("day_ms", expr("ts_ms div 86400000") * 86400000L)
      .groupBy("day_ms")
      .agg(
        count(lit(1)).as("n_bad"),
        sort_array(collect_set(col("server"))).as("servers"),
        sort_array(collect_set(col("service"))).as("services"),
        sort_array(collect_set(col("lag"))).as("lags"))

  def digestSql(candSql: String): String =
    s"""SELECT day_ms, count(*) AS n_bad,
          list_sort(list(DISTINCT server)) AS servers,
          list_sort(list(DISTINCT service)) AS services,
          list_sort(list(DISTINCT lag)) AS lags
        FROM (SELECT *, (ts_ms // 86400000) * 86400000 AS day_ms
              FROM ($candSql) WHERE bad = 1)
        GROUP BY day_ms"""

  /** Pure-Scala reference fold for tests (mirrors reference processFSEntry
    * control flow directly — one pass, interleaved counter + cooldown).
    */
  def alertsRef(
      rows: Seq[(String, String, Int, Long, Boolean, String)],
      cfg: AlertCfg = default): Seq[(Long, String, String, Int, String)] = {
    val counts = mutable.Map.empty[(String, String, Int), Int]
    val lastAlert = mutable.Map.empty[String, Long]
    val out = mutable.Buffer.empty[(Long, String, String, Int, String)]
    rows.sortBy(r => (r._4, r._1, r._3)).foreach { case (srv, svc, lag, ts, bad, causes) =>
      val k = (srv, svc, lag)
      var c = counts.getOrElse(k, 0)
      var fire = false
      if (bad) {
        if (c <= cfg.windowSz) c += 1
        fire = c >= cfg.voteThreshold
      } else if (c > 0) c -= 1
      counts(k) = c
      if (fire) {
        val emit = lastAlert.get(svc) match {
          case None => true
          case Some(last) => (ts - last) / 1000.0 > cfg.cooldownMs / 1000.0
        }
        if (emit) { lastAlert(svc) = ts; out += ((ts, srv, svc, lag, causes)) }
      }
    }
    out.toSeq
  }
}
