package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Alerts, ApmStats, ZScore}

/** Dev main: stage-by-stage decomposition of the r2_candidates chain
  * (bucketize -> sliding stats -> windowed z-score -> candidates) to
  * locate where its honest (noop-materialized) cost concentrates.
  */
object R2Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(df: => DataFrame): Unit = {
      val d = df
      d.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      d.write.format("noop").mode("overwrite").save()
      println(f"PROFILE $name time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val zOvr = Seq(ZScore.ZOverride("purchase", 6, threshold = Some(2.5)))
    val alertCfg = Alerts.AlertCfg(
      hardMaxMs = 150.0, hardMinMs = 50.0, hardMinTpm = 0.005,
      windowSz = 60, voteThreshold = 45,
      suppressedServices = Seq("error"), suppressedLags = Seq(6),
      hardMaxOverrides = Map("purchase" -> 120.0))
    import spark.implicits._
    def stats = ApmStats.slidingStats(spark, sfDir)
    def zwin = ZScore.zScoreWindowed(stats, ZScore.defaultLags, zOvr)
    val ovr = Seq(("purchase", 120.0)).toDF("service", "hard_max_override")
    t("stats")(stats)
    t("zwin")(zwin)
    t("zwin+join")(zwin.join(broadcast(ovr), Seq("service"), "left"))
    t("r2 full")(Alerts.candidates(zwin, alertCfg))
    spark.stop()
  }
}
