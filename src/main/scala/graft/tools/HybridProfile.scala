package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev-only decomposition of the hybrid-retrieval queries (s12/s15):
  * times each leg in isolation via the noop sink so the optimization
  * round can attribute their cost. Not part of the driver contract.
  * Usage: runMain graft.tools.HybridProfile <sfDir>
  */
object HybridProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def t(name: String)(f: => DataFrame): Unit = {
      // two timed passes: pass 1 includes codegen/JIT, pass 2 is warm
      (1 to 2).foreach { p =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        println(f"PROFILE $name pass$p ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      System.gc()
    }
    import graft.operators.Similarity
    // inline decomposition of the bm25 chain
    {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      import graft.Tables
      val (nQ, n, tt) = (8, 30, 24)
      val (k1, b) = (1.2, 0.75)
      val docs = Tables.loadSpread(spark, sfDir, "documents")
        .select(col("doc_id"),
          split(trim(lower(col("text"))), "\\s+").as("ws"))
        .select(col("doc_id"), col("ws"),
          size(col("ws")).cast("long").as("dl"))
      t("bm25: docs split")(docs)
      val qTerms = docs.filter(col("doc_id") < nQ)
        .select(col("doc_id").as("q_id"), explode(col("ws")).as("w"))
        .filter(col("w") =!= "").distinct()
      t("bm25: qTerms")(qTerms)
      val termU = qTerms.select("w").distinct()
      val tf = docs.select(col("doc_id"), col("dl"), explode(col("ws")).as("w"))
        .join(broadcast(termU), Seq("w"), "left_semi")
        .groupBy("doc_id", "dl", "w")
        .agg(count(lit(1)).as("tf"))
      t("bm25: tf")(tf)
      val dfT = tf.groupBy("w").agg(count(lit(1)).as("df"))
      val wT = Window.partitionBy("q_id").orderBy(col("df").asc, col("w").asc)
      val qSel = qTerms.join(broadcast(dfT), Seq("w"))
        .filter(col("df") >= 2)
        .withColumn("trank", row_number().over(wT))
        .filter(col("trank") <= tt)
        .select("q_id", "w")
      t("bm25: qSel")(qSel)
      val stats = docs.agg(count(lit(1)).as("nd"), sum("dl").as("toktot"))
        .select(col("nd"),
          (col("toktot").cast("double") / col("nd")).as("avgdl"))
      val perTerm = tf.join(broadcast(qSel), Seq("w"))
        .filter(col("doc_id") =!= col("q_id"))
        .join(broadcast(dfT), Seq("w"))
        .crossJoin(broadcast(stats))
        .select(col("q_id"), col("doc_id"), col("w"),
          (((col("nd") - col("df")) + lit(0.5)) / (col("df") + lit(0.5)) *
            (col("tf") * lit(k1 + 1) /
              (col("tf") + lit(k1) * (lit(1.0) - lit(b) +
                lit(b) * col("dl") / col("avgdl"))))).as("s"))
      t("bm25: perTerm")(perTerm)
      val wLex = Window.partitionBy("q_id")
        .orderBy(col("lex_s").desc, col("doc_id").asc)
      val lex = perTerm.groupBy("q_id", "doc_id")
        .agg(sort_array(collect_list(struct(col("w"), col("s")))).as("ts"))
        .select(col("q_id"), col("doc_id"),
          aggregate(col("ts"), lit(0.0), (a, x) => a + x("s")).as("lex_s"))
        .withColumn("lex_rank", row_number().over(wLex).cast("long"))
        .filter(col("lex_rank") <= n)
        .select("q_id", "doc_id", "lex_rank")
      t("bm25: lex full")(lex)
    }
    t("s12 full")(Similarity.rrfFusion(spark, sfDir))
    t("s15 full")(Similarity.fusedHybrid(spark, sfDir))
    t("bm25LexRanks")(Similarity.bm25LexRanksDev(spark, sfDir))
    t("denseExactRanks")(Similarity.denseExactRanksDev(spark, sfDir))
    t("denseHammingRanks")(Similarity.denseHammingRanksDev(spark, sfDir))
    println("rows: " + spark.read.parquet(s"$sfDir/embeddings.parquet").count() +
      " embeddings, " + spark.read.parquet(s"$sfDir/documents.parquet").count() +
      " documents")
    spark.stop()
  }
}
