package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup
import graft.functions.PolyHash.poly_hash

/** Dev-only: stage decomposition of d2_dedup_ngram with honest (noop)
  * materialization. Usage: runMain graft.tools.D2Profile <sfDir>
  */
object D2Profile {
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
    def t(name: String)(df: DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"PROFILE $name time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val normText = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
    val words = split(normText, " ")
    val n = size(words)
    val len = greatest(n - 2, lit(0))
    val tri = zip_with(
      slice(words, lit(1), len),
      zip_with(slice(words, lit(2), len), slice(words, lit(3), len),
        (y, z) => concat(y, lit(" "), z)),
      (x, yz) => concat(x, lit(" "), yz))
    val shing = array_distinct(
      when(n >= 3, tri).otherwise(array(concat_ws(" ", words))))

    val d0 = Tables.load(spark, sfDir, "documents")
    println("input partitions: " + d0.rdd.getNumPartitions)
    t("scan only")(d0.select(col("doc_id")))
    t("words")(d0.select(words.as("w")))
    t("shingles")(d0.select(shing.as("sh")))
    t("shingles exploded")(d0.select(col("doc_id"), explode(shing).as("s")))
    t("shingles exploded hashed")(
      d0.select(col("doc_id"), explode(shing).as("s"))
        .select(col("doc_id"), poly_hash(col("s")).as("h")))
    val rep = d0.repartition(32)
    t("repart+shingles exploded")(rep.select(col("doc_id"), explode(shing).as("s")))
    val dd = d0.select(col("doc_id"), col("source"), shing.as("sh"))
      .withColumn("n", size(col("sh")))
    val tok = dd.select(col("source"), col("doc_id"), col("n"),
      explode(col("sh")).as("s"))
    t("tok")(tok)
    val hot = tok.groupBy("source", "s").agg(count(lit(1)).as("df"))
      .filter(col("df") > 1000).select("source", "s")
    t("hot")(hot)
    val kept = tok.join(broadcast(hot), Seq("source", "s"), "left_anti")
    t("kept")(kept)
    val a = kept.select(col("source"), col("doc_id").as("id_a"),
      col("n").as("n_a"), col("s"))
    val b = kept.select(col("source"), col("doc_id").as("id_b"),
      col("n").as("n_b"), col("s"))
    val joined = a.join(b, Seq("source", "s")).filter(col("id_a") < col("id_b"))
    t("join")(joined)
    t("d2 full")(Dedup.ngramJaccard(spark, sfDir))
    Dedup.ngramJaccard(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
