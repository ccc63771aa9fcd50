package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup

/** Dev-only: per-round decomposition of c2_dup_clusters' connected
  * components (edge-build time, rounds to converge, per-round wall).
  * Usage: runMain graft.tools.CCProfile <sfDir>
  */
object CCProfile {
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
    def secs(t0: Long): String = f"${(System.nanoTime() - t0) / 1e9}%.2f s"

    var t0 = System.nanoTime()
    val pairs = Dedup.minhashLsh(spark, sfDir, 0.4).select("id_a", "id_b")
      .localCheckpoint()
    println(s"PROFILE pairs n=${pairs.count()} time=${secs(t0)}")

    t0 = System.nanoTime()
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint()
    val nodes = Tables.load(spark, sfDir, "documents").select("doc_id")
    var labels = nodes.select(col("doc_id"), col("doc_id").as("label"))
      .localCheckpoint()
    println(s"PROFILE init time=${secs(t0)}")

    var converged = false
    var round = 0
    while (!converged && round < 32) {
      t0 = System.nanoTime()
      val viaEdges = edges
        .join(labels.select(col("doc_id").as("src"), col("label")), "src")
        .select(col("dst").as("doc_id"), col("label"))
      val stepped = labels.toDF("doc_id", "label")
        .union(viaEdges.toDF("doc_id", "label"))
        .groupBy("doc_id").agg(min("label").as("label"))
      val jumped = stepped.as("s")
        .join(stepped.select(col("doc_id").as("p_id"), col("label").as("p_label")),
          col("s.label") === col("p_id"))
        .select(col("s.doc_id").as("doc_id"), col("p_label").as("label"))
      val marked = jumped
        .join(labels.select(col("doc_id"), col("label").as("old")), "doc_id")
        .select(col("doc_id"), col("label"),
          (col("label") =!= col("old")).cast("long").as("changed"))
        .localCheckpoint()
      val changed = marked.agg(sum("changed")).first().getLong(0)
      labels = marked.select("doc_id", "label")
      round += 1
      println(s"PROFILE round=$round changed=$changed time=${secs(t0)}")
      converged = changed == 0L
    }
    spark.stop()
  }
}
