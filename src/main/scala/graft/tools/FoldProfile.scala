package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Alerts, ApmStats, ZScore}

/** Dev-only: stage decomposition of the z2_zscore_fold / r3_alerts chain
  * with honest (noop) materialization. Usage:
  *   runMain graft.tools.FoldProfile <sfDir>
  */
object FoldProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(df: DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"PROFILE $name time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    import spark.implicits._
    val stats = ApmStats.slidingStats(spark, sfDir)
    t("slidingStats")(stats)
    t("slidingStats again")(stats)
    // repartition+sort+deserialize+reserialize, no step work
    val deser = stats.select("server", "service", "ts_ms", "tpm",
        "average", "per75", "per95")
      .repartition(col("server"), col("service"))
      .sortWithinPartitions("server", "service", "ts_ms")
      .as[(String, String, Long, Option[Double], Option[Double], Option[Double], Option[Double])]
      .mapPartitions(it => it.map(identity))
    t("repart+sort+serde")(deser.toDF())
    val fold = ZScore.zScoreFold(stats, ZScore.defaultLags, Nil)
    t("zScoreFold")(fold)
    t("zScoreFold again")(fold)
    val cached = stats.cache()
    cached.write.format("noop").mode("overwrite").save()
    t("fold on cached stats")(ZScore.zScoreFold(cached, ZScore.defaultLags, Nil))
    spark.stop()
  }
}
