package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup

/** Dev-only micro-profiler for hot queries (not part of the driver
  * contract). Usage: runMain graft.tools.ProfileMain <sfDir>
  */
object ProfileMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROFILE $name rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val normText = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
    val words = split(normText, " ")
    val d0 = Tables.load(spark, sfDir, "documents")
    t("norm only")(d0.select(normText.as("t")).filter(length(col("t")) > 0).count())
    t("words")(d0.select(words.as("w")).select(size(col("w")).as("n")).agg(sum("n")).count())
    val shing = array_distinct(
      when(size(words) >= 3,
        transform(sequence(lit(0), size(words) - 3), i =>
          concat_ws(" ", element_at(words, i + 1),
            element_at(words, i + 2), element_at(words, i + 3))))
        .otherwise(array(concat_ws(" ", words))))
    t("shingles")(d0.select(explode(shing).as("s")).count())
    t("d2 full")(Dedup.ngramJaccard(spark, sfDir).count())
    t("d4 full")(Dedup.minhashLsh(spark, sfDir).count())
    t("d3 minhash")(Dedup.minhash(spark, sfDir).count())
    t("d4 sigs only")(Dedup.minhashSignatures(spark, sfDir).count())
    // r3 chain decomposition
    import graft.operators.{Alerts, ApmStats, ZScore}
    val alertCfg = Alerts.AlertCfg(hardMaxMs = 150.0, hardMinMs = 50.0,
      hardMinTpm = 0.005, windowSz = 60, voteThreshold = 45,
      hardMaxOverrides = Map("purchase" -> 120.0))
    t("r3: stats")(ApmStats.slidingStats(spark, sfDir).count())
    t("r3: zwin")(ZScore.zScoreWindowed(ApmStats.slidingStats(spark, sfDir)).count())
    t("r3: cand")(Alerts.candidates(
      ZScore.zScoreWindowed(ApmStats.slidingStats(spark, sfDir)), alertCfg).count())
    val cand = Alerts.candidates(
      ZScore.zScoreWindowed(ApmStats.slidingStats(spark, sfDir)), alertCfg)
    t("r3: cand 6col repart")(cand
      .select("server", "service", "lag", "ts_ms", "bad", "causes")
      .repartition(col("server"), col("service"), col("lag"))
      .sortWithinPartitions("server", "service", "lag", "ts_ms").count())
    t("r3: full")(Alerts.alerts(cand, alertCfg).count());
    {
      import spark.implicits._
      val sorted = cand.select("server", "service", "lag", "ts_ms", "bad", "causes")
        .repartition(col("server"), col("service"), col("lag"))
        .sortWithinPartitions("server", "service", "lag", "ts_ms")
      t("r3: phase1 deser only")(
        sorted.as[(String, String, Int, Long, Int, String)]
          .mapPartitions(it => it.map(_ => 1)).count())
      t("r3: phase1 fold")(
        sorted.as[(String, String, Int, Long, Int, String)]
          .mapPartitions { it =>
            var curKey: (String, String, Int) = null
            var c = 0
            it.flatMap { case (srv, svc, lag, ts, bad, causes) =>
              if (curKey == null || curKey != ((srv, svc, lag))) {
                curKey = (srv, svc, lag); c = 0
              }
              var fire = false
              if (bad == 1) {
                if (c <= 60) c += 1
                fire = c >= 45
              } else if (c > 0) c -= 1
              if (fire) Some((srv, svc, lag, ts, causes)) else None
            }
          }.count())
    }
    spark.stop()
  }
}
