package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Alerts, Parsing, ZScore}
import graft.sources.LogFileSource
import graft.streaming.{ApmGraph, ApmStreaming}

/** One-off forensics main for the captured run-4 topology failure:
  * rebuilds the spec's batch oracle over a surviving logs directory and
  * prints candidates / firedRef / alertsRef, so the hostB-vs-hostA alert
  * divergence can be adjudicated as tie-vs-bug from the data.
  * Usage: Test/runMain graft.tools.FiredProbe /tmp/graft_mpNNN/logs
  */
object FiredProbe {
  def main(args: Array[String]): Unit = {
    val logs = args(0)
    val sentinelServers = Seq("zz", "zzf", "zz2", "zzl")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cfg = ApmGraph.GraphCfg()
    val glob = s"$logs/net/*/*"
    val parsedB = Parsing.extractStdExit(
        LogFileSource.batch(spark, glob)
          .filter(col("log_type") === "server_log"))
      .select(col("server"), col("service"),
        timestamp_millis(col("end_ms")).as("end_ts"), col("elapsed"))
    val statsB = ApmStreaming.slidingStatsStream(
        parsedB, cfg.windowLen, cfg.slide, cfg.lateness)
      .filter(!col("server").isin(sentinelServers: _*))
    val zBatchDf = ZScore.zScoreFold(
      statsB.select("server", "service", "ts_ms", "tpm",
        "average", "per75", "per95"), Seq(cfg.lag))
    val candB = Alerts.candidates(zBatchDf, cfg.alert)
      .select("server", "service", "lag", "ts_ms", "bad", "causes")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3),
        r.getInt(4) == 1, r.getString(5)))
    println("== bad candidates ==")
    candB.filter(_._5).sortBy(c => (c._4, c._1)).foreach(c =>
      println(s"  ${c._4} ${c._1} ${c._2} lag=${c._3} causes=${c._6}"))
    val fired = Alerts.firedRef(candB.toIndexedSeq, cfg.alert)
    println("== firedRef ==")
    fired.foreach(f => println(s"  $f"))
    val alerts = Alerts.alertsRef(candB.toIndexedSeq, cfg.alert)
    println("== alertsRef ==")
    alerts.foreach(a => println(s"  $a"))
    spark.stop()
  }
}
